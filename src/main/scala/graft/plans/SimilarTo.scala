package graft.plans

import java.math.RoundingMode

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `similar_to(a, b, threshold)` — the first-class similarity-join
  * predicate (SURVEY.md §7's last custom-Catalyst item): a SQL user
  * writes `FROM x JOIN y ON similar_to(x.emb, y.emb, 0.45)` without
  * knowing any banding recipe.
  *
  * Semantics: true iff round(cosine(a, b), 4) ≥ threshold — the same
  * round-before-threshold determinism contract every graft similarity
  * query uses (so both engines of an oracle pair make identical
  * include/exclude calls). Evaluated anywhere (filter, projection,
  * nested-loop join) it is EXACT; when it appears as an inner-join
  * condition and `SimilarityJoinRewrite` is registered, the optimizer
  * replaces the quadratic nested-loop plan with the LSH band-join +
  * exact-verify plan — candidate recall becomes the standard LSH
  * trade-off while precision stays 1 (every survivor re-checked by
  * this very predicate's kernel).
  *
  * Duplicate-row note: the rewritten operator has SET semantics
  * (band-join candidates are deduplicated on the full output row);
  * input relations with duplicate rows see those collapsed, unlike
  * the nested-loop fallback.
  *
  * `banding` is OPTIONAL rewrite-time metadata, not a semantic
  * input: an explicit (nBits, bitsPerBand) carried on the predicate
  * (e.g. `api.AutoTune.lshParams` derived from a corpus count, the
  * q60 path) that `SimilarityJoinRewrite` uses instead of its static
  * default. It never affects `eval` — the predicate stays the exact
  * rounded cosine everywhere — and session confs still take
  * precedence (the manual escape hatch).
  */
case class SimilarTo(left: Expression, right: Expression, threshold: Expression,
    banding: Option[(Int, Int)] = None)
    extends TernaryExpression with Predicate {

  override def prettyName: String = "similar_to"
  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = threshold

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!(elemOk(left.dataType) && elemOk(right.dataType)))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> vectors, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    else if (!(threshold.foldable && threshold.dataType == DoubleType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName threshold must be a literal double")
    else TypeCheckResult.TypeCheckSuccess

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private lazy val t = threshold.eval().asInstanceOf[Double]

  override def nullSafeEval(a: Any, b: Any, th: Any): Any =
    SimilarTo.matches(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right), t)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left)
    val rf = isFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b, _) => {
      s"${ev.value} = graft.plans.SimilarTo.matches($a, $b, $lf, $rf, ${t});"
    })
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, th: Expression): SimilarTo =
    copy(left = f, right = s, threshold = th)
}

/** The verify-stage twin of [[SimilarTo]]: identical kernel and
  * semantics, but a distinct class so `SimilarityJoinRewrite` (which
  * matches `SimilarTo` in join conditions) never re-triggers on its
  * own verify filter after predicate pushdown folds the filter into
  * the band join's condition.
  */
case class SimilarVerify(left: Expression, right: Expression, threshold: Expression)
    extends TernaryExpression with Predicate {

  override def prettyName: String = "similar_verify"
  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = threshold

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private lazy val t = threshold.eval().asInstanceOf[Double]

  override def nullSafeEval(a: Any, b: Any, th: Any): Any =
    SimilarTo.matches(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right), t)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left)
    val rf = isFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b, _) => {
      s"${ev.value} = graft.plans.SimilarTo.matches($a, $b, $lf, $rf, ${t});"
    })
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, th: Expression): SimilarVerify =
    copy(left = f, right = s, threshold = th)
}

object SimilarTo {

  /** Cosine with the same double-accumulation + strict-dimension
    * kernel as `cosine_sim`, rounded half-up to 4 decimals through
    * `BigDecimal.valueOf` — bit-identical to Spark's `round(x, 4)`
    * (shortest-decimal-string rounding), so `similar_to(a,b,t)` ≡
    * `round(cosine_sim(a,b),4) >= t` exactly.
    */
  def matches(a: ArrayData, b: ArrayData, leftFloat: Boolean,
      rightFloat: Boolean, threshold: Double): Boolean = {
    val n = a.numElements()
    CosineSimilarity.requireSameDim(n, b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x: Double = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y: Double = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val c = dot / math.sqrt(na * nb)
    if (java.lang.Double.isNaN(c)) false
    else java.math.BigDecimal.valueOf(c)
      .setScale(4, RoundingMode.HALF_UP).doubleValue() >= threshold
  }
}
