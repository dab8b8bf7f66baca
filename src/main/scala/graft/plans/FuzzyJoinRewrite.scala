package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Rewrites an inner join whose condition contains `fuzzy_match(a, b, k)`
  * from the quadratic nested-loop plan Spark would otherwise pick into
  * the PassJoin segment-band join + bounded-levenshtein verify that
  * `DedupQueries.editDistancePairs` hand-writes:
  *
  * {{{
  *   Join(l, r, Inner, fuzzy_match(ls, rs, k) AND residual...)
  * ──▶   (slim band → key-pair dedup → payload re-fetch → verify;
  *        unkeyed forms synthesize key = xxhash64(string))
  *   Filter(fuzzy_verify(ls, rs, k) AND residual...,
  *     Join(Join(Aggregate((lkey, rkey),    // dedup candidate key pairs
  *                 Join(explodeSegments(slim_l, ls),
  *                      explodeProbes(slim_r, rs),
  *                      Inner, l.segKey = r.segKey)),
  *               l, lkey <=> lkey'),        // re-fetch left payload
  *          r, rkey <=> rkey'))             // re-fetch right payload
  * }}}
  *
  * The dedup runs BEFORE the verify (the hand-written
  * `editDistancePairs` shape): a pair sharing several segments
  * otherwise pays the bounded-levenshtein kernel once per matching
  * segment; deduping first verifies each candidate pair exactly once,
  * and the post-filter rows are already distinct so no second
  * aggregate is needed. Order swap is sound because the verify and
  * residual predicates are deterministic row-local functions —
  * filter∘dedup = dedup∘filter on set semantics.
  *
  * Banding (PassJoin pigeonhole — Li/Deng/Feng/Wang, PVLDB 5(3), 2011):
  * the left string's first (k+1)·SegLen chars are cut into k+1 fixed
  * segments; if ed(A,B) ≤ k, some segment is untouched by every edit
  * and appears verbatim in B within ±k of its home position, so the
  * right side probes all those shifted substrings. Candidate
  * generation is an EQUI join on `"<i>|<12 chars>"` keys — a hash
  * shuffle at 100 TB, never all-pairs — and the verify predicate is
  * the exact bounded kernel. Unlike [[SimilarityJoinRewrite]] (LSH
  * recall trade-off), this banding is COMPLETE: the rewritten plan is
  * exactly equivalent to the nested-loop plan on every input — exact
  * BAG semantics even with duplicate rows, because candidates are key
  * PAIRS and the re-fetch re-expands every row combination — which
  * `PlanSpec` pins against brute force including alignment-shift
  * fixtures.
  *
  * Registration: `GraftExtensions` (injectOptimizerRule) or
  * `GraftFunctions.register` (experimental.extraOptimizations).
  * Without the rule the predicate still evaluates exactly via the
  * honest quadratic BNLJ — also the fallback for non-inner joins.
  */
object FuzzyJoinRewrite extends Rule[LogicalPlan] {

  /** 12-char segments: selective enough that a shared segment is a
    * strong signal, short enough that k+1 segments cover only the
    * document prefix a fuzzy key comparison wants (the q82-tuned
    * value).
    */
  val SegLen = 12

  /** Probe fan-out is (k+1)(2k+1) keys per row — quadratic in k — and
    * segment selectivity decays as k+1 segments spread over a longer
    * prefix. Past this distance the banding would inflate the shuffle
    * more than it prunes, so the rule leaves the join alone and the
    * predicate evaluates via the honest nested-loop fallback.
    */
  val MaxRewriteDistance = 8

  /** The rewrite embeds each input subtree TWICE (band branch +
    * payload re-fetch). With a nondeterministic expression anywhere
    * in an input (rand-based sample/filter, uuid, ...), the two scans
    * could disagree and silently add or drop pairs relative to the
    * unrewritten join — so such joins keep the honest BNLJ plan.
    */
  private def allDeterministic(p: LogicalPlan): Boolean =
    p.find(n => !n.expressions.forall(_.deterministic)).isEmpty

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), _)
        if j.resolved && allDeterministic(l) && allDeterministic(r) =>
      val conjuncts = splitConjuncts(cond)
      // keyed form first: when the caller declares per-side keys the
      // slimmed band join is strictly better (see rewriteKeyed)
      val keyedHit = conjuncts.collectFirst {
        case fm @ FuzzyMatchKeyed(a, b, Literal(k: Int, IntegerType), ak, bk)
            if (a.references ++ ak.references).subsetOf(l.outputSet) &&
              (b.references ++ bk.references).subsetOf(r.outputSet) =>
          (fm, a, b, k, ak, bk)
        case fm @ FuzzyMatchKeyed(a, b, Literal(k: Int, IntegerType), ak, bk)
            if (b.references ++ bk.references).subsetOf(l.outputSet) &&
              (a.references ++ ak.references).subsetOf(r.outputSet) =>
          (fm, b, a, k, bk, ak)
      }
      val hit = conjuncts.collectFirst {
        case fm @ FuzzyMatch(a, b, Literal(k: Int, IntegerType))
            if a.references.subsetOf(l.outputSet) &&
              b.references.subsetOf(r.outputSet) =>
          (fm, a, b, k)
        case fm @ FuzzyMatch(a, b, Literal(k: Int, IntegerType))
            if b.references.subsetOf(l.outputSet) &&
              a.references.subsetOf(r.outputSet) =>
          (fm, b, a, k)
      }
      (keyedHit, hit) match {
        case (Some((fm, ls, rs, k, lk, rk)), _)
            if k >= 0 && k <= MaxRewriteDistance =>
          val residual = conjuncts.filterNot(_ eq fm)
          rewriteKeyed(j, l, r, ls, rs, k, lk, rk, residual)
        case (_, Some((fm, ls, rs, k))) if k >= 0 && k <= MaxRewriteDistance =>
          val residual = conjuncts.filterNot(_ eq fm)
          rewrite(j, l, r, ls, rs, k, residual)
        case _ => j
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Band key = xxhash64(segment index, 12-char substring) — an 8-byte
    * long instead of the round-11 `"<i>|<chars>"` string (~26 bytes of
    * shuffle per exploded row at 45 probe keys/row, and string
    * hashing/compares in the join). Sound: equal segments always hash
    * equal (completeness untouched); a 64-bit collision only ADDS a
    * false candidate, which the exact `fuzzy_verify` post-filter
    * removes — output identical on every input.
    */
  private def segKey(i: Int, sub: Expression): Expression =
    new XxHash64(Seq(Literal(i), sub))

  /** Index side: the k+1 canonical segments of the string's prefix. */
  private def explodeSegments(side: LogicalPlan, str: Expression,
      k: Int): (LogicalPlan, Attribute) = {
    val keys = (0 to k).map { i =>
      segKey(i, Substring(str, Literal(1 + i * SegLen), Literal(SegLen)))
    }
    generate(side, keys)
  }

  /** Probe side: substrings at every start within ±k of each home
    * position (clamped to valid positions) — ≤ (k+1)(2k+1) bounded
    * keys per row, deduplicated.
    */
  private def explodeProbes(side: LogicalPlan, str: Expression,
      k: Int): (LogicalPlan, Attribute) = {
    val keys = for {
      i <- 0 to k
      delta <- -k to k
      pos = 1 + i * SegLen + delta
      if pos >= 1
    } yield segKey(i, Substring(str, Literal(pos), Literal(SegLen)))
    generate(side, keys, distinct = true)
  }

  private def generate(side: LogicalPlan, keys: Seq[Expression],
      distinct: Boolean = false): (LogicalPlan, Attribute) = {
    val arr: Expression =
      if (distinct) ArrayDistinct(CreateArray(keys)) else CreateArray(keys)
    val keyAttr = AttributeReference("graft_seg_key", LongType)()
    val gen = Generate(Explode(arr), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(keyAttr),
      child = side)
    (gen, keyAttr)
  }

  /** UNKEYED form: routed through the keyed recipe on a SYNTHETIC
    * key = xxhash64(string) — so prefix payloads stop riding the
    * ≤(k+1)(2k+1)-probe fan-out (the round-13 ladder residual: the
    * old shape banded the full `j.output` row, multiplying every
    * payload byte by the probe count on the shuffle). The hash key is
    * sound here exactly where a `monotonically_increasing_id` would
    * NOT be: the fetch branches re-SCAN `l`/`r`, so the key must be a
    * deterministic pure function of row values. Collisions are
    * harmless both ways — two rows with equal strings SHOULD share a
    * key (the pair dedup collapses them, the re-fetch re-expands every
    * row combination = exact bag semantics), and a 64-bit cross-string
    * collision only re-fetches extra combinations that the exact
    * `fuzzy_verify` + residual post-filter removes. Completeness is
    * untouched: every true pair still bands (pigeonhole) and its
    * (hash, hash) key pair survives the dedup. q82-shape ladder win:
    * the band shuffle carries 16 bytes/row instead of the document
    * prefix payload.
    */
  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      ls: Expression, rs: Expression, k: Int,
      residual: Seq[Expression]): LogicalPlan =
    rewriteKeyed(j, l, r, ls, rs, k,
      new XxHash64(Seq(ls)), new XxHash64(Seq(rs)), residual)

  /** The KEYED rewrite ([[FuzzyMatchKeyed]]): band (key, segment-hash)
    * pairs ONLY — 16 bytes per exploded row instead of the full string
    * payload riding the ≤(k+1)(2k+1)-way probe fan-out — then dedup
    * candidate KEY pairs and re-fetch each side's payload through one
    * equi join before the exact verify:
    *
    * {{{
    *   Filter(fuzzy_verify(ls, rs, k) AND residual...,
    *     Join(Join(Aggregate((lkey, rkey),       // dedup candidate key pairs
    *                 Project((lkey, rkey), bandJoin(slim_l, slim_r))),
    *               l, lkey <=> lkey'),           // re-fetch left payload
    *          r, rkey <=> rkey'))                // re-fetch right payload
    * }}}
    *
    * The re-fetch joins shuffle each side ONCE by its key (or
    * broadcast the candidate set when it is small — AQE's call); the
    * 45-probe fan-out never carries payload. Exactness: banding is
    * complete (pigeonhole), candidates are key PAIRS, the re-fetch
    * re-expands every row combination under a pair, and the verify +
    * residual re-check each combination — so this form has exact BAG
    * semantics even with duplicate or null keys (null-safe `<=>`
    * re-fetch; see [[FuzzyMatchKeyed]]'s scaladoc). q82's sf1 ladder:
    * 2.0× → ~1.5× from the payload slimming alone.
    */
  private def rewriteKeyed(j: Join, l: LogicalPlan, r: LogicalPlan,
      ls: Expression, rs: Expression, k: Int,
      lkey: Expression, rkey: Expression,
      residual: Seq[Expression]): LogicalPlan = {
    // NULL strings: same argument as in rewrite() — they can never
    // verify, and unfiltered they'd all band under hash(index) alone
    val lnn: LogicalPlan = if (ls.nullable) Filter(IsNotNull(ls), l) else l
    val rnn: LogicalPlan = if (rs.nullable) Filter(IsNotNull(rs), r) else r
    // band sides slimmed to (key, segkey): alias the key below the
    // explode, project everything else away above it
    val lkBand = Alias(lkey, "graft_lkey")()
    val rkBand = Alias(rkey, "graft_rkey")()
    val (lg, lsk) = explodeSegments(Project(lnn.output :+ lkBand, lnn), ls, k)
    val (rg, rsk) = explodeProbes(Project(rnn.output :+ rkBand, rnn), rs, k)
    val lb = Project(Seq(lkBand.toAttribute, lsk), lg)
    val rb = Project(Seq(rkBand.toAttribute, rsk), rg)
    val noBc = JoinHint(
      Some(HintInfo(strategy = Some(NO_BROADCAST_HASH))),
      Some(HintInfo(strategy = Some(NO_BROADCAST_HASH))))
    val bandJoin = Join(lb, rb, Inner, Some(EqualTo(lsk, rsk)), noBc)
    val pairCols = Seq(lkBand.toAttribute, rkBand.toAttribute)
    val pairs = Aggregate(pairCols, pairCols, Project(pairCols, bandJoin))
    // re-fetch: join the candidate key pairs back to each side's full
    // rows. Each fetch branch re-computes the key under a FRESH alias
    // (the banded branch's attrs are hidden behind the aggregate, so
    // no duplicate exprIds are EXPOSED at either join). <=> so null
    // keys still re-fetch their rows.
    val lkFetch = Alias(lkey, "graft_lkey_f")()
    val rkFetch = Alias(rkey, "graft_rkey_f")()
    val lFetch = Project(l.output :+ lkFetch, l)
    val rFetch = Project(r.output :+ rkFetch, r)
    val fetched = Join(
      Join(pairs, lFetch, Inner,
        Some(EqualNullSafe(lkBand.toAttribute, lkFetch.toAttribute)),
        JoinHint.NONE),
      rFetch, Inner,
      Some(EqualNullSafe(rkBand.toAttribute, rkFetch.toAttribute)),
      JoinHint.NONE)
    val verify: Expression = FuzzyVerify(ls, rs, Literal(k))
    Project(j.output, Filter((verify +: residual).reduce(And), fetched))
  }
}
