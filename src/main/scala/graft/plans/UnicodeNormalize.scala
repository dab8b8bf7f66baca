package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode normalization
  * (NFC/NFD/NFKC/NFKD via `java.text.Normalizer`) — the text-curation
  * primitive Spark lacks as a built-in (a pipeline that dedups or
  * fingerprints unnormalized text treats "é" and "e"+U+0301 as
  * different documents). The form argument must be a foldable string
  * so the `Normalizer.Form` is resolved once at plan time; codegen
  * emits a direct call to the shared kernel with the resolved
  * ordinal, keeping the surrounding stage in whole-stage codegen.
  *
  * Registered as SQL `unicode_normalize(str, 'NFC')`; DuckDB's
  * `nfc_normalize` is the oracle twin for the NFC form.
  */
case class UnicodeNormalize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "unicode_normalize"

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${left.dataType.sql}")
    else if (right.dataType != StringType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable string form argument")
    else if (UnicodeNormalize.formOrdinal(right) < 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of NFC, NFD, NFKC, NFKD")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val ordinal: Int = UnicodeNormalize.formOrdinal(right)

  override def nullSafeEval(s: Any, f: Any): Any =
    UnicodeNormalize.norm(s.asInstanceOf[UTF8String], ordinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ord = ordinal
    nullSafeCodeGen(ctx, ev, (s, _) =>
      s"${ev.value} = graft.plans.UnicodeNormalize.norm($s, $ord);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnicodeNormalize =
    copy(left = newLeft, right = newRight)
}

object UnicodeNormalize {
  private val Forms: Array[Normalizer.Form] = Array(
    Normalizer.Form.NFC, Normalizer.Form.NFD,
    Normalizer.Form.NFKC, Normalizer.Form.NFKD)

  /** Resolves the foldable form argument to an index into [[Forms]];
    * -1 when unrecognized (surfaced as an analysis error).
    */
  private[plans] def formOrdinal(e: Expression): Int =
    e.eval(null) match {
      case s: UTF8String => Forms.indexWhere(_.name == s.toString.toUpperCase)
      case _ => -1
    }

  /** Shared kernel for interpreted eval and generated code. The
    * `isNormalized` fast path makes already-NFC ASCII corpora (the
    * overwhelming majority of real text at scale) zero-allocation.
    */
  def norm(s: UTF8String, ordinal: Int): UTF8String = {
    val form = Forms(ordinal)
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}
