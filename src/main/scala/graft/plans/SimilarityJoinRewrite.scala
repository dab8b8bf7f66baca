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
    *
    * LSH bands must be SIZED FOR THE CORPUS: with fixed band width r,
    * expected bucket occupancy grows as n/2^r and candidate pairs as
    * n²/2^r — the sf0.1→sf1 ladder measured q60 going 19.6× for 10×
    * data on the 4-bit default, vs ~2.4× after re-tuning to 8-bit
    * bands (BASELINE.md, round 8). Production rule: grow r by log2 of
    * the corpus growth to hold bucket occupancy (and therefore
    * verify cost per row) constant; every real LSH/ANN index re-tunes
    * this way. The session confs below override the defaults without
    * touching query code; the defaults stay fixed so the DuckDB
    * oracle replay (q60) remains bit-identical.
    */
  val NBits = 32
  val BitsPerBand = 4
  val Seed = 7L
  val NBitsConf = "spark.graft.lsh.nbits"
  val BitsPerBandConf = "spark.graft.lsh.bitsPerBand"

  /** Effective (nBits, bitsPerBand) — precedence: explicit session
    * conf (the manual escape hatch) > banding carried on the
    * predicate (`api.AutoTune`'s corpus-derived parameters, the q60
    * path) > the static default. nBits may exceed 64: bands then
    * draw from MULTIPLE independent 64-bit signature words
    * (seed-offset lanes), which is how recall is held constant while
    * bands get finer — e.g. 128/8 keeps the ≥0.9-cosine collision
    * recall of the 32/4 default (≈0.996 vs ≈0.998) while cutting
    * per-band collision probability 2^4×. */
  private def params(carried: Option[(Int, Int)]): (Int, Int) = {
    val confSet = conf.contains(NBitsConf) || conf.contains(BitsPerBandConf)
    val (nb, bpb) =
      if (confSet)
        (conf.getConfString(NBitsConf, NBits.toString).toInt,
          conf.getConfString(BitsPerBandConf, BitsPerBand.toString).toInt)
      else carried.getOrElse((NBits, BitsPerBand))
    // 1024-bit ceiling (round 16, was 256): the signature kernel is
    // per-64-bit-WORD and r-agnostic, so wider signatures are purely a
    // config. Round 17 extended AutoTune's DEFAULT derivation to
    // r ∈ [4,22] (2·22² = 968 ≤ 1024) against this ceiling, so the
    // n > 128·2¹¹ ≈ 262k-rows-per-group occupancy trap of the old
    // r ≤ 11 cap is gone at default conf; the DuckDB oracle replay
    // re-derives the identical r from count(*). Session confs remain
    // the escape hatch for non-(2r², r) shapes (e.g. 512/8 recall
    // boosts).
    require(nb >= 1 && nb <= 1024 && bpb >= 1 && bpb <= math.min(nb, 64) && nb % bpb == 0,
      s"invalid LSH banding: nbits=$nb bitsPerBand=$bpb (need 1 <= bpb <= min(nbits,64) <= 1024, bpb | nbits)")
    (nb, bpb)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), _) if j.resolved =>
      val conjuncts = splitConjuncts(cond)
      val hit = conjuncts.collectFirst {
        case st @ SimilarTo(a, b, Literal(t: Double, DoubleType), _)
            if a.references.subsetOf(l.outputSet) &&
              b.references.subsetOf(r.outputSet) =>
          (st, a, b, t)
        case st @ SimilarTo(a, b, Literal(t: Double, DoubleType), _)
            if b.references.subsetOf(l.outputSet) &&
              a.references.subsetOf(r.outputSet) =>
          (st, b, a, t)
      }
      hit match {
        case Some((st, lv, rv, t)) =>
          val residual = conjuncts.filterNot(_ eq st)
          rewrite(j, l, r, lv, rv, t, residual, params(st.banding))
        case None => j
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Project the signature word(s), explode the packed band keys.
    * Word w's lanes are offset by a seed stride coprime to the
    * component stride (Mix64's multiplier — NOT the LCG increment,
    * whose reuse would alias word w's lanes onto word 0's shifted
    * components); word 0 at the default config reproduces the
    * original single-word signature bit-for-bit, so the q60 oracle
    * replay is untouched. */
  private def explodeBands(side: LogicalPlan, vec: Expression,
      banding: (Int, Int)): (LogicalPlan, Attribute) = {
    val (nBits, bitsPerBand) = banding
    val totalBands = nBits / bitsPerBand
    val bandsPerWord = 64 / bitsPerBand
    val nWords = (totalBands + bandsPerWord - 1) / bandsPerWord
    val sigs = (0 until nWords).map { w =>
      val bandsInWord = math.min(bandsPerWord, totalBands - w * bandsPerWord)
      Alias(LshSignature(vec, Literal(bandsInWord * bitsPerBand),
        Literal(Seed + w.toLong * 2685821657736338717L)), s"graft_sig$w")()
    }
    val proj = Project(side.output ++ sigs, side)
    // Band index packed into the HIGH bits, disjoint from the value
    // bits: totalBands <= 1024 fits in 10 bits, so `b << 54` never
    // overlaps a value of <= 54 bits and never wraps (the old
    // `b << bitsPerBand` packing wrapped at bpb = 64 — JVM shifts are
    // mod 64 — and aliased distinct bands onto one keyspace whenever
    // totalBands * 2^bpb > 2^63, exploding candidate volume in
    // exactly the wide-signature configs the 1024-bit ceiling
    // serves). A single band needs no index bits at all.
    require(totalBands == 1 || bitsPerBand <= 54,
      s"bitsPerBand=$bitsPerBand needs totalBands == 1 (band index can't share a 64-bit key with a > 54-bit band value)")
    val bandKeys = (0 until totalBands).map { b =>
      val w = b / bandsPerWord
      val off = (b % bandsPerWord) * bitsPerBand
      val value: Expression =
        if (bitsPerBand == 64) sigs(w).toAttribute
        else BitwiseAnd(
          ShiftRightUnsigned(sigs(w).toAttribute, Literal(off)),
          Literal((1L << bitsPerBand) - 1))
      if (totalBands == 1) value
      else BitwiseOr(Literal(b.toLong << 54), value): Expression
    }
    val keyAttr = AttributeReference("graft_band_key", LongType, nullable = false)()
    val gen = Generate(Explode(CreateArray(bandKeys)), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(keyAttr), child = proj)
    (gen, keyAttr)
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      lv: Expression, rv: Expression, t: Double,
      residual: Seq[Expression], banding: (Int, Int)): LogicalPlan = {
    val (lb, lk) = explodeBands(l, lv, banding)
    val (rb, rk) = explodeBands(r, rv, banding)
    val bandJoin = Join(lb, rb, Inner, Some(EqualTo(lk, rk)), JoinHint.NONE)
    // exact verify via the SimilarVerify twin (see scaladoc re: re-match)
    val verify: Expression = SimilarVerify(lv, rv, Literal(t))
    val filt = Filter((verify +: residual).reduce(And), bandJoin)
    val out: Seq[Attribute] = j.output
    Aggregate(out, out, Project(out, filt))
  }
}
