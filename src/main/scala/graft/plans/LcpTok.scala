package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native token-level longest-common-prefix of two space-joined token
  * strings (round 18) — the codegen'd replacement for the suffix
  * family's interpreted `array_position(zip_with(a, b, _ === _),
  * false)` fold over token ARRAYS, with a payload bonus: callers can
  * ship only the joined string through the suffix range exchange (the
  * single heaviest exchange in the ExactSubstr family) instead of
  * string + token array, roughly halving its bytes.
  *
  * Contract: both inputs are single-space joins of NON-EMPTY,
  * space-free tokens (the suite's `toks` convention), so the map
  * tokens↔string is a bijection and the token LCP is recoverable from
  * the byte-level common prefix: every matched 0x20 inside the common
  * prefix closes one fully-matched token, plus one more when the
  * mismatch point sits on a token boundary of BOTH sides (end of
  * string or a space). In UTF-8 the space byte never occurs inside a
  * multi-byte sequence, so the byte scan is codepoint-safe.
  *
  * Equivalence with the zip_with form (pinned in HygieneSpec):
  *  - first strict token mismatch at k → k (bytes diverge inside or
  *    at the end of token k, which then closes on at most one side);
  *  - one side a whole-token prefix of the other, or equal → the
  *    shorter token count (every byte matches through the shorter
  *    side, whose end is a boundary, and the longer side has a space
  *    there — or both end together).
  * An empty string means zero tokens on that side → 0.
  */
case class LcpTokens(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "lcp_tokens"

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(l: Any, r: Any): Any =
    LcpTokens.lcp(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.LcpTokens.lcp($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcpTokens =
    copy(left = newLeft, right = newRight)
}

object LcpTokens {
  /** Shared by interpreted eval and generated code. */
  def lcp(a: UTF8String, b: UTF8String): Long = {
    val la = a.numBytes()
    val lb = b.numBytes()
    if (la == 0 || lb == 0) return 0L
    val n = if (la < lb) la else lb
    var i = 0
    var cnt = 0L
    var c: Byte = 0
    while (i < n && { c = a.getByte(i); c == b.getByte(i) }) {
      if (c == 0x20) cnt += 1
      i += 1
    }
    // i is the byte-level common prefix length; the partial token at i
    // counts iff it closes (end-of-string or space) on BOTH sides.
    val endA = i == la || a.getByte(i) == 0x20
    val endB = i == lb || b.getByte(i) == 0x20
    if (endA && endB) cnt + 1 else cnt
  }
}
