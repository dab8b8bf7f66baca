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

object FuzzyMatch {
  /** Bounded character-level levenshtein: the threshold form returns
    * -1 as soon as the distance provably exceeds k (banded DP), so the
    * verify cost per candidate is O(k·min(|a|,|b|)), not O(|a|·|b|).
    */
  def matches(a: UTF8String, b: UTF8String, k: Int): Boolean =
    a.levenshteinDistance(b, k) >= 0
}
