package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `fuzzy_match(a, b, k)` — the first-class EDIT-DISTANCE join
  * predicate, the string twin of [[SimilarTo]]: a SQL user writes
  * `FROM x JOIN y ON fuzzy_match(x.s, y.s, 4)` without knowing any
  * segment-banding recipe.
  *
  * Semantics: true iff levenshtein(a, b) ≤ k, character-based —
  * identical to Spark's built-in `levenshtein(a, b) <= k` (the kernel
  * IS `UTF8String.levenshteinDistance`, bounded form, so it early-exits
  * once the running distance exceeds k). Evaluated anywhere (filter,
  * projection, nested-loop join) it is exact; when it appears in an
  * inner-join condition and [[FuzzyJoinRewrite]] is registered, the
  * optimizer replaces the quadratic nested-loop plan with PassJoin
  * pigeonhole segment banding + this exact verify. Unlike the LSH
  * rewrite, the banding is COMPLETE (pigeonhole theorem, see
  * `DedupQueries.q82FuzzyJoin` scaladoc), so the rewritten plan is
  * exactly equivalent — not an approximation.
  *
  * Duplicate-row note: as with `similar_to`, the rewritten operator
  * has SET semantics (candidates deduplicated on the full output row).
  */
case class FuzzyMatch(left: Expression, right: Expression, maxDist: Expression)
    extends TernaryExpression with Predicate {

  override def prettyName: String = "fuzzy_match"
  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = maxDist

  override def checkInputDataTypes(): TypeCheckResult =
    if (!(left.dataType.isInstanceOf[StringType] &&
        right.dataType.isInstanceOf[StringType]))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    else if (!(maxDist.foldable && maxDist.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName max distance must be a literal int")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val k = maxDist.eval().asInstanceOf[Int]

  override def nullSafeEval(a: Any, b: Any, kk: Any): Any =
    FuzzyMatch.matches(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, _) => {
      s"${ev.value} = graft.plans.FuzzyMatch.matches($a, $b, $k);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, th: Expression): FuzzyMatch =
    copy(left = f, right = s, maxDist = th)
}

/** The verify-stage twin of [[FuzzyMatch]] (same role as
  * [[SimilarVerify]]): identical kernel, distinct class, so
  * [[FuzzyJoinRewrite]] never re-triggers on its own verify filter
  * once predicate pushdown folds it into the band join's condition.
  */
case class FuzzyVerify(left: Expression, right: Expression, maxDist: Expression)
    extends TernaryExpression with Predicate {

  override def prettyName: String = "fuzzy_verify"
  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = maxDist

  private lazy val k = maxDist.eval().asInstanceOf[Int]

  override def nullSafeEval(a: Any, b: Any, kk: Any): Any =
    FuzzyMatch.matches(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, _) => {
      s"${ev.value} = graft.plans.FuzzyMatch.matches($a, $b, $k);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, th: Expression): FuzzyVerify =
    copy(left = f, right = s, maxDist = th)
}

/** The KEYED form `fuzzy_match(a, b, k, leftKey, rightKey)` — same
  * predicate semantics as [[FuzzyMatch]] (true iff levenshtein(a,b) ≤
  * k; the keys never affect the value), plus a planning declaration:
  * `leftKey`/`rightKey` identify rows of their respective join sides,
  * so [[FuzzyJoinRewrite]] can band (key, segment-hash) pairs ONLY —
  * 16 bytes/exploded row instead of the full string payload riding
  * the ≤(k+1)(2k+1)-way probe fan-out — and re-fetch the payload
  * columns through one equi join per side after candidate dedup. At
  * q82's shape that is the difference between shuffling the 60-char
  * prefix 45× and shuffling it once.
  *
  * Key contract: keys should IDENTIFY rows (primary key). Correctness
  * does not depend on it — candidates are key PAIRS, the re-fetch
  * re-expands every row combination under a pair, and the exact
  * verify re-checks each combination — so with duplicate keys the
  * rewritten join is still exactly the honest nested-loop join, now
  * with BAG semantics (the 3-arg rewrite is set-semantics); duplicate
  * keys only inflate the re-fetch fan-out. NULL keys are banded and
  * re-fetched null-safely (`<=>`), so they also stay exact.
  *
  * Evaluated outside a rewritable inner join it is the exact
  * predicate (keys ignored). CodegenFallback is deliberate: in the
  * rewritten plan this expression never reaches execution (the verify
  * is the codegen'd [[FuzzyVerify]]), and in fallback contexts the
  * levenshtein kernel dominates the virtual call.
  */
case class FuzzyMatchKeyed(left: Expression, right: Expression,
    maxDist: Expression, leftKey: Expression, rightKey: Expression)
    extends Expression with Predicate
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "fuzzy_match"
  override def children: Seq[Expression] =
    Seq(left, right, maxDist, leftKey, rightKey)
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (!(left.dataType.isInstanceOf[StringType] &&
        right.dataType.isInstanceOf[StringType]))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    else if (!(maxDist.foldable && maxDist.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName max distance must be a literal int")
    else if (!(org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(leftKey.dataType) &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(rightKey.dataType)))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName keys must be groupable/orderable types, " +
          s"got ${leftKey.dataType.sql} and ${rightKey.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val k = maxDist.eval().asInstanceOf[Int]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    // key children deliberately NOT evaluated: they are a planning
    // declaration, and a null key must not null out the predicate
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    FuzzyMatch.matches(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FuzzyMatchKeyed =
    copy(left = newChildren(0), right = newChildren(1),
      maxDist = newChildren(2), leftKey = newChildren(3),
      rightKey = newChildren(4))
}

object FuzzyMatch {
  /** Bounded character-level levenshtein: the threshold form returns
    * -1 as soon as the distance provably exceeds k (banded DP), so the
    * verify cost per candidate is O(k·min(|a|,|b|)), not O(|a|·|b|).
    */
  def matches(a: UTF8String, b: UTF8String, k: Int): Boolean =
    a.levenshteinDistance(b, k) >= 0
}
