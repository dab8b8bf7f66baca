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
    GraftFunctions.descriptors.foreach(ext.injectFunction)
  }
}

object GraftFunctions {
  type Descriptor = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val cosineSimDescriptor: Descriptor =
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))

  val minhashSigDescriptor: Descriptor =
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigAgg].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSigAgg(children.head))

  val simhashDescriptor: Descriptor =
    (FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
      (children: Seq[Expression]) => SimHashAgg(children.head))

  val topkDescriptor: Descriptor =
    (FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "topk_by_score"),
      (children: Seq[Expression]) =>
        TopKByScore(children(0), children(1), children(2)))

  val descriptors: Seq[Descriptor] =
    Seq(cosineSimDescriptor, minhashSigDescriptor, simhashDescriptor,
      topkDescriptor)

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = descriptors.foreach {
    case (id, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id)) {
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
      }
  }

  /** Column-API form of the native cosine (requires `register`). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Column-API form of the native minhash signature aggregate. */
  def minhashSig(h: Column): Column = call_function("minhash_sig", h)

  /** Column-API form of the native simhash aggregate. */
  def simhashAgg(h: Column): Column = call_function("simhash_agg", h)

  /** Column-API form of the bounded top-k aggregate: best k
    * (score DESC, id ASC) pairs as a sorted struct array.
    */
  def topkByScore(score: Column, id: Column, k: Int): Column =
    call_function("topk_by_score", score, id,
      org.apache.spark.sql.functions.lit(k))
}
