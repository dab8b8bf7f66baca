package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit integer mixer: two xor-shift/multiply rounds with public
  * xorshift-family odd constants (Vigna's 0x2545F4914F6CDD1D and
  * 0x106689D45497FDB5). Native expression because the multiplies rely
  * on Java's wraparound (mod 2^64) semantics, which ANSI-mode Spark
  * SQL arithmetic rejects as overflow — and because both constants are
  * < 2^63, a DuckDB oracle can reproduce the wrap exactly in HUGEINT
  * as `(x * C) % 2^64`, keeping every downstream hash value
  * engine-portable and hash-comparable (see q35's oracle SQL).
  * Whole-stage codegen via a shared kernel.
  */
case class Mix64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "mix64"

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT input, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any = Mix64.mix(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.Mix64.mix($v);")

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

object Mix64 {
  /** Shared kernel for interpreted eval and generated code. */
  def mix(p: Long): Long = {
    val z1 = (p ^ (p >>> 30)) * 2685821657736338717L
    val z2 = (z1 ^ (z1 >>> 27)) * 1181783497276652981L
    z2 ^ (z2 >>> 31)
  }
}
