package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Engine extension wiring: registers graft's native expressions with
  * a session (so `spark.sql("SELECT cosine_sim(a,b)")` and
  * `call_function` resolve them).
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session
  *    build time (the production wiring, via `injectFunction`);
  *  - `GraftFunctions.register(spark)` at first use (idempotent) —
  *    the in-library path the query registry uses, so the driver's
  *    contract mains need no special session config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.cosineSimDescriptor)
  }
}

object GraftFunctions {
  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = cosineSimDescriptor
    if (!spark.sessionState.functionRegistry.functionExists(id)) {
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }

  /** Column-API form of the native cosine (requires `register`). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}
