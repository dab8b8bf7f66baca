package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Rewrites an inner join whose condition contains `similar_to(a, b, t)`
  * from the quadratic nested-loop plan Spark would otherwise pick into
  * the LSH band-join + exact-verify plan the hand-written q60 uses:
  *
  * {{{
  *   Join(l, r, Inner, similar_to(lv, rv, t) AND residual...)
  * ──▶
  *   Aggregate(out, out,                      // dedup multi-band hits
  *     Project(out,
  *       Filter(round(cosine(lv,rv),4) >= t AND residual...,
  *         Join(explodeBands(l, lv), explodeBands(r, rv),
  *              Inner, l.bandKey = r.bandKey))))
  * }}}
  *
  * where `explodeBands` computes the dimension-independent
  * `lsh_sig(vec, NBits, Seed)` signature (plans.LshSignature) and
  * explodes it into `NBits / BitsPerBand` packed `(band << bits) | value`
  * long keys. The band join is an EQUI join — at 100 TB candidate
  * generation is a hash shuffle on the band key, never all-pairs — and
  * the verify predicate re-checks every candidate with the exact
  * `similar_to` kernel, so precision is 1 and the only approximation
  * is LSH candidate recall (the operator's documented contract).
  *
  * The verify filter deliberately uses the [[SimilarVerify]] twin, not
  * `SimilarTo` itself: predicate pushdown later moves the filter into
  * the band join's condition, and a surviving `SimilarTo` there would
  * re-trigger this rule forever in the fixed-point batch.
  *
  * Registration: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (injectOptimizerRule) or in-library via `GraftFunctions.register`
  * (experimental.extraOptimizations). Without the rule the predicate
  * still evaluates exactly — the plan is just the honest quadratic
  * BNLJ, which is also the fallback for non-inner joins.
  */
object SimilarityJoinRewrite extends Rule[LogicalPlan] {

  /** 32 projection bits in 8 bands of 4: the q60-tuned default — at
    * fixture thresholds (~0.45) recall ≈ 0.8 on borderline pairs and
    * ≈ 1 on true near-dups; production thresholds (≥ 0.8) push
    * per-band collision probability up and band misses toward 0.
    */
  val NBits = 32
  val BitsPerBand = 4
  val Seed = 7L

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), _) if j.resolved =>
      val conjuncts = splitConjuncts(cond)
      val hit = conjuncts.collectFirst {
        case st @ SimilarTo(a, b, Literal(t: Double, DoubleType))
            if a.references.subsetOf(l.outputSet) &&
              b.references.subsetOf(r.outputSet) =>
          (st, a, b, t)
        case st @ SimilarTo(a, b, Literal(t: Double, DoubleType))
            if b.references.subsetOf(l.outputSet) &&
              a.references.subsetOf(r.outputSet) =>
          (st, b, a, t)
      }
      hit match {
        case Some((st, lv, rv, t)) =>
          val residual = conjuncts.filterNot(_ eq st)
          rewrite(j, l, r, lv, rv, t, residual)
        case None => j
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Project the signature, explode the packed band keys. */
  private def explodeBands(side: LogicalPlan, vec: Expression): (LogicalPlan, Attribute) = {
    val sig = Alias(LshSignature(vec, Literal(NBits), Literal(Seed)), "graft_sig")()
    val proj = Project(side.output :+ sig, side)
    val bandKeys = (0 until NBits / BitsPerBand).map { b =>
      BitwiseOr(
        Literal(b.toLong << BitsPerBand),
        BitwiseAnd(
          ShiftRightUnsigned(sig.toAttribute, Literal(b * BitsPerBand)),
          Literal((1L << BitsPerBand) - 1))): Expression
    }
    val keyAttr = AttributeReference("graft_band_key", LongType, nullable = false)()
    val gen = Generate(Explode(CreateArray(bandKeys)), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(keyAttr), child = proj)
    (gen, keyAttr)
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      lv: Expression, rv: Expression, t: Double,
      residual: Seq[Expression]): LogicalPlan = {
    val (lb, lk) = explodeBands(l, lv)
    val (rb, rk) = explodeBands(r, rv)
    val bandJoin = Join(lb, rb, Inner, Some(EqualTo(lk, rk)), JoinHint.NONE)
    // exact verify via the SimilarVerify twin (see scaladoc re: re-match)
    val verify: Expression = SimilarVerify(lv, rv, Literal(t))
    val filt = Filter((verify +: residual).reduce(And), bandJoin)
    val out: Seq[Attribute] = j.output
    Aggregate(out, out, Project(out, filt))
  }
}
