package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}

/** Statistical-testing and sketch-style audit operators: the model-
  * evaluation / drift-monitoring layer a training-data pipeline runs
  * on top of the relational core. Everything here follows the repo's
  * determinism contract — exact integer statistics wherever a sum
  * crosses an exchange, single fixed-shape double expressions (mirrored
  * operation-for-operation in the oracle) only at final scoring, and
  * `round(...)` only at output.
  */
object StatisticsQueries {

  /** The (score, event_id)-ranked events relation q137 (AUC) and q147
    * (calibration) both consume — the identical total order, so the
    * range-repartitioned ranking pass is paid ONCE per (session, sf)
    * and pinned with `localCheckpoint`, the q78/q93 / basket-memo
    * convention. At 100 TB the memo's role is played by materializing
    * the ranked/decile relation to storage and pointing every
    * evaluation job at it.
    */
  def rankedEvents(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    graft.SessionMemo.getOrCompute(s, "stats.ranked:" + d) {
      // score statistics rank OBSERVED scores only: a NULL value has
      // no place in a (y, event_id) total order — Spark sorts NULLs
      // first, DuckDB last, and every consumer's oracle twin carries
      // the same `value IS NOT NULL` guard (SURVEY §5, fuzz class A)
      val e = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_id"),
          (col("event_type") === "purchase").as("pos"),
          expr("cast(round(value * 100) as bigint)").as("y"))
      graft.api.Ranking.withRank(e, Nil, Seq(col("y"), col("event_id")))
        .localCheckpoint()
    }

  /** The (event_type, integer-cents, count) value-compressed events
    * relation q138 (KS binning) and q145 (MAD medians) both start
    * from — one events scan + one partial-aggregable shuffle, paid
    * once per (session, sf) and pinned with `localCheckpoint` like
    * [[rankedEvents]]. Distinct cents per type sit orders of
    * magnitude below row count, so every downstream pass (CDFs,
    * binning, deviation build) runs on the compressed relation.
    */
  def compressedCents(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    graft.SessionMemo.getOrCompute(s, "stats.cents:" + d) {
      // observed values only — NULL cents would ride the CDF as a
      // phantom group (Spark orders it first, DuckDB's quantile_cont
      // ignores it); consumers' oracle twins filter identically
      Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"),
          expr("cast(round(value * 100) as bigint)").as("y"))
        .groupBy(col("event_type"), col("y")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
    }

  /** The per-type weighted CDF of [[compressedCents]] — (event_type,
    * y, c, __hi, __lo, n) per [[graft.api.Quantiles.cdfOf]] — paid
    * once per (session, sf): q145 (median), q154 (p05/p95 bounds) and
    * q175 (deciles) all probe the SAME cents distribution, so the
    * range-partitioned running-total machinery runs once here and each
    * consumer is a filter + one partial-aggregable groupBy
    * (`Quantiles.*FromCdf`). Per-type CDFs are independent, so q175's
    * view/click restriction filters this relation directly.
    */
  def centsCdf(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    graft.SessionMemo.getOrCompute(s, "stats.centscdf:" + d) {
      graft.api.Quantiles.cdfOf(
        compressedCents(s, d), Seq("event_type"), "y", "c")
        .localCheckpoint()
    }

  /** Portable Bloom-filter membership audit — the compact-filter
    * semi-join reduction pattern (the manual twin of Spark's runtime
    * bloom pruning, `ScaleSpec`'s conf-gated cousin) made first-class:
    * build a FIXED-SIZE filter (2^16 bits = 1024 longs) over the
    * distinct part keys appearing on high-quantity lineitems, probe
    * every part key, and classify each probe tp/fp/tn against ground
    * truth. `fn` is impossible by construction — if one ever appeared
    * the class column would carry 'fn' and the hash gate itself would
    * fail, so the no-false-negative Bloom invariant is oracle-gated.
    *
    * Scale shape: the filter is CONSTANT-SIZE regardless of corpus
    * (≤ 1024 rows cross the build exchange — the q87/q107 sketch
    * contract); the probe side joins against the broadcast filter
    * map-side, and ground truth is one semi-join-shaped key lookup.
    * At 100 TB this is exactly how a scan-side prune list ships.
    *
    * Determinism: one `mix64` per key (replayed by the oracle in
    * HUGEINT mod-2^64 arithmetic, the q103 idiom), three 16-bit slices
    * as double-hashing positions, masks built with the same shift in
    * both engines (DuckDB converts the unsigned 2^63 bit back to the
    * signed BIGINT domain), `bit_or` aggregation in both.
    */
  val q136BloomFilter = QueryDef(
    "q136_bloom_filter",
    "portable bloom filter: constant-size build + broadcast probe, tp/fp/tn audit, no-false-negative hash-gated",
    """WITH bk AS (SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_quantity >= 48),
      |pk AS (SELECT p_partkey AS k FROM part),
      |z0 AS (SELECT k, CAST(k + 40503 AS HUGEINT) AS z FROM pk),
      |m1 AS (SELECT k, (xor(z, z >> 30) * 2685821657736338717) % 18446744073709551616 AS z FROM z0),
      |m2 AS (SELECT k, (xor(z, z >> 27) * 1181783497276652981) % 18446744073709551616 AS z FROM m1),
      |hz AS (SELECT k, xor(z, z >> 31) AS z FROM m2),
      |pos AS (SELECT k, CAST((z >> (16 * i)) % 65536 AS BIGINT) AS p
      |        FROM hz CROSS JOIN (VALUES (0), (1), (2)) s(i)),
      |cells AS (SELECT k, p // 64 AS w,
      |  CASE WHEN (CAST(1 AS HUGEINT) << (p % 64)) % 18446744073709551616 >= 9223372036854775808
      |       THEN CAST((CAST(1 AS HUGEINT) << (p % 64)) % 18446744073709551616
      |                 - 18446744073709551616 AS BIGINT)
      |       ELSE CAST((CAST(1 AS HUGEINT) << (p % 64)) % 18446744073709551616 AS BIGINT)
      |  END AS mask
      |  FROM pos),
      |bloom AS (SELECT w, bit_or(mask) AS word
      |          FROM cells JOIN bk USING (k) GROUP BY w),
      |probe AS (SELECT c.k,
      |            CAST(count(*) FILTER (WHERE b.word IS NULL
      |                   OR (b.word & c.mask) <> c.mask) AS BIGINT) AS misses
      |          FROM cells c LEFT JOIN bloom b ON b.w = c.w GROUP BY c.k),
      |o AS (SELECT p.k AS p_partkey, (p.misses = 0) AS predicted,
      |             (bk.k IS NOT NULL) AS actual
      |      FROM probe p LEFT JOIN bk ON bk.k = p.k)
      |SELECT p_partkey, predicted, actual,
      |  CASE WHEN actual AND predicted THEN 'tp'
      |       WHEN predicted THEN 'fp'
      |       WHEN actual THEN 'fn' ELSE 'tn' END AS cls
      |FROM o ORDER BY p_partkey""".stripMargin) { (s, d) =>
    graft.plans.GraftFunctions.register(s)
    val bk = Tables.lineitem(s, d).filter(col("l_quantity") >= 48)
      .select(col("l_partkey").as("k")).distinct()
    val pk = Tables.part(s, d).select(col("p_partkey").as("k"))
    // build keys are a subset of probe keys (l_partkey → p_partkey FK),
    // so ONE hash pass over the probe side serves both
    val hz = pk.select(col("k"),
      graft.plans.GraftFunctions.mix64(col("k") + lit(40503L)).as("h"))
    val cells = hz
      .select(col("k"), explode(array((0 to 2).map(i =>
        shiftrightunsigned(col("h"), 16 * i).bitwiseAND(lit(65535L))): _*)).as("p"))
      .select(col("k"), expr("p div 64").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))").as("mask"))
    val bloom = cells.join(bk, "k")
      .groupBy(col("w")).agg(expr("bit_or(mask)").as("word"))
    val probe = cells.join(broadcast(bloom), Seq("w"), "left")
      .groupBy(col("k"))
      .agg(sum(when(col("word").isNull ||
        col("word").bitwiseAND(col("mask")) =!= col("mask"), 1L)
        .otherwise(0L)).as("misses"))
    probe
      .join(bk.select(col("k"), lit(true).as("in_bk")), Seq("k"), "left")
      .select(col("k").as("p_partkey"),
        (col("misses") === 0L).as("predicted"),
        coalesce(col("in_bk"), lit(false)).as("actual"))
      .withColumn("cls",
        when(col("actual") && col("predicted"), "tp")
          .when(col("predicted"), "fp")
          .when(col("actual"), "fn").otherwise("tn"))
      .orderBy(col("p_partkey"))
  }

  /** ROC AUC by rank-sum (Mann–Whitney U) — the classifier-quality
    * metric, computed EXACTLY: rank every event by a total order on
    * (score, event_id) with [[graft.api.Ranking.withRank]] (range
    * repartition + metadata offsets — never the single-reducer global
    * window the textbook SQL uses), then
    * `U = Σ ranks(positives) − P(P+1)/2` and
    * `AUC_bp = ⌊10000·U / (P·N)⌋`. All integers, so partition order
    * never touches the result; the deterministic event_id tiebreak
    * makes tied scores engine-exact (documented: this is AUC under a
    * fixed tie resolution, not midrank AUC).
    */
  val q137RankSumAuc = QueryDef(
    "q137_rank_sum_auc",
    "exact ROC AUC via rank-sum U statistic, scale-safe global ranking, integer basis points",
    """WITH e AS (SELECT event_id, event_type = 'purchase' AS pos,
      |                  CAST(round(value * 100) AS BIGINT) AS y
      |           FROM events WHERE value IS NOT NULL),
      |r AS (SELECT pos, CAST(row_number() OVER (ORDER BY y, event_id) AS BIGINT) AS rn FROM e),
      |a AS (SELECT CAST(sum(CASE WHEN pos THEN rn ELSE 0 END) AS BIGINT) AS rank_sum,
      |             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt,
      |             CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS n_cnt
      |      FROM r)
      |SELECT p_cnt, n_cnt,
      |  rank_sum - (p_cnt * (p_cnt + 1)) // 2 AS u_stat,
      |  (10000 * (rank_sum - (p_cnt * (p_cnt + 1)) // 2)) // (p_cnt * n_cnt) AS auc_bp
      |FROM a""".stripMargin) { (s, d) =>
    val ranked = rankedEvents(s, d)
    ranked.agg(
      sum(when(col("pos"), col("rn")).otherwise(0L)).as("rank_sum"),
      sum(when(col("pos"), 1L).otherwise(0L)).as("p_cnt"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("n_cnt"))
      .select(col("p_cnt"), col("n_cnt"),
        expr("rank_sum - (p_cnt * (p_cnt + 1)) div 2").as("u_stat"),
        // single-class totality (DegenerateInputSpec): with every
        // event positive (or every event negative) P·N = 0 and the
        // integer division throws under ANSI — AUC is undefined
        // there, report NULL instead of poisoning the run
        when(col("p_cnt") * col("n_cnt") === 0, lit(null).cast("long"))
          .otherwise(
            expr("(10000 * (rank_sum - (p_cnt * (p_cnt + 1)) div 2)) div (p_cnt * n_cnt)"))
          .as("auc_bp"))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic, BINNED — the
    * distribution-drift monitor between the 'view' and 'click' value
    * populations. The exact KS needs a global sort of both samples;
    * the production form bins both sides onto one fixed 256-bucket
    * spine (integer-cents equi-width over the pooled min/max, the q104
    * data-driven-bounds idiom but in EXACT INTEGER arithmetic) and
    * takes D over bin boundaries — a lower bound on exact D that
    * converges as bins grow, and the standard monitoring tradeoff.
    *
    * Scale shape: one partial-aggregable (bin, side) count shuffle;
    * the CDF window runs on the 256-row METADATA spine (q117's
    * bucket-spine precedent), never on the corpus. All statistics are
    * exact integers: D is maximized over |ca_cum·n_b − cb_cum·n_a|
    * cross-products, divided into basis points only at output.
    */
  val q138KsDrift = QueryDef(
    "q138_ks_drift",
    "binned two-sample KS drift statistic: integer CDF cross-products over a 256-bucket spine",
    """WITH src AS (SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS y
      |             FROM events
      |             WHERE event_type IN ('view', 'click') AND value IS NOT NULL),
      |b AS (SELECT min(y) AS lo, max(y) AS hi FROM src),
      |bu AS (SELECT t, CASE WHEN hi = lo THEN 0
      |                      ELSE least(255, ((y - lo) * 256) // (hi - lo)) END AS bin
      |       FROM src, b),
      |c AS (SELECT bin, CAST(sum(CASE WHEN t = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |             CAST(sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |      FROM bu GROUP BY bin),
      |spine AS (SELECT unnest(generate_series(0, 255)) AS bin),
      |g AS (SELECT CAST(s.bin AS BIGINT) AS bin, coalesce(c.ca, 0) AS ca,
      |             coalesce(c.cb, 0) AS cb
      |      FROM spine s LEFT JOIN c ON c.bin = s.bin),
      |cum AS (SELECT bin, CAST(sum(ca) OVER (ORDER BY bin) AS BIGINT) AS cca,
      |               CAST(sum(cb) OVER (ORDER BY bin) AS BIGINT) AS ccb
      |        FROM g),
      |n AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM g),
      |dd AS (SELECT bin, abs(cca * n_b - ccb * n_a) AS dn, n_a, n_b FROM cum, n),
      |mx AS (SELECT max(dn) AS dmax FROM dd)
      |SELECT n_a, n_b,
      |  CAST((10000 * dmax) // (n_a * n_b) AS BIGINT) AS d_bp,
      |  CAST(min(bin) AS BIGINT) AS at_bucket
      |FROM dd, mx WHERE dn = dmax
      |GROUP BY n_a, n_b, dmax""".stripMargin) { (s, d) =>
    // NO events scan of its own: filter the memoized value-compressed
    // relation (shared with q145 — the scan + compress shuffle is
    // paid once per session) down to the two compared sides; both the
    // bounds pass and the binning pass then run over that filtered
    // compressed relation (the round-6 shape re-scanned events twice,
    // once just to learn min/max).
    val comp = compressedCents(s, d)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_type").as("t"), col("y"), col("c").as("w"))
    val bounds = comp.agg(min(col("y")).as("lo"), max(col("y")).as("hi"))
    val bu = comp.crossJoin(broadcast(bounds))
      .select(col("t"), col("w"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(lit(255L), expr("((y - lo) * 256) div (hi - lo)")))
          .as("bin"))
    val c = bu.groupBy(col("bin")).agg(
      sum(when(col("t") === "view", col("w")).otherwise(0L)).as("ca"),
      sum(when(col("t") === "click", col("w")).otherwise(0L)).as("cb"))
    val spine = s.range(0, 256).select(col("id").as("bin"))
    val g = spine.join(c, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    // CDF window over the 256-row metadata spine, never the corpus
    val w = Window.partitionBy().orderBy(col("bin"))
    val cum = g.select(col("bin"),
      sum(col("ca")).over(w).as("cca"), sum(col("cb")).over(w).as("ccb"))
    val n = g.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val dd = cum.crossJoin(broadcast(n))
      .select(col("bin"),
        abs(col("cca") * col("n_b") - col("ccb") * col("n_a")).as("dn"),
        col("n_a"), col("n_b"))
    val mx = dd.agg(max(col("dn")).as("dmax"))
    dd.crossJoin(broadcast(mx)).filter(col("dn") === col("dmax"))
      .groupBy(col("n_a"), col("n_b"), col("dmax"))
      .agg(min(col("bin")).as("at_bucket"))
      // empty-input totality (EmptyInputSpec): with both samples empty
      // the spine still yields one (0, 0, 0) group and 0 div 0 throws
      // under ANSI — report NULL drift instead of poisoning the run
      .select(col("n_a"), col("n_b"),
        when(col("n_a") * col("n_b") === 0, lit(null).cast("long"))
          .otherwise(expr("(10000 * dmax) div (n_a * n_b)")).as("d_bp"),
        col("at_bucket"))
  }

  /** Per-source language-mix Gini impurity — the corpus-composition
    * audit ("how monolingual is each source?"), in EXACT INTEGERS:
    * `gini_bp = ⌊10000·(n² − Σc²) / n²⌋` from per-(source, lang)
    * counts. Two partial-aggregable shuffles total ((source, lang)
    * then source); at this corpus n² ≤ ~1e10 so the ×10000 product
    * stays far inside BIGINT (the 100 TB form runs the same shape in
    * DECIMAL(38,0), the q78 convention).
    */
  val q139SourceImpurity = QueryDef(
    "q139_source_impurity",
    "per-source language-mix Gini impurity in exact-integer basis points, two aggregate passes",
    """WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      |           FROM documents GROUP BY source, lang),
      |g AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
      |             CAST(sum(c * c) AS BIGINT) AS ss,
      |             CAST(count(*) AS BIGINT) AS n_langs
      |      FROM c GROUP BY source)
      |SELECT source, n, n_langs,
      |  (10000 * (n * n - ss)) // (n * n) AS gini_bp
      |FROM g ORDER BY source""".stripMargin) { (s, d) =>
    val c = Tables.documents(s, d)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
    c.groupBy(col("source"))
      .agg(sum(col("c")).as("n"), sum(col("c") * col("c")).as("ss"),
        count(lit(1)).as("n_langs"))
      .select(col("source"), col("n"), col("n_langs"),
        expr("(10000 * (n * n - ss)) div (n * n)").as("gini_bp"))
      .orderBy(col("source"))
  }

  /** Benford first-digit audit of order totals — the fraud/synthetic-
    * data screen: observed leading-digit frequencies vs the Benford
    * expectation. The leading digit comes from the DECIMAL STRING of
    * the exact integer cents (both engines print integers
    * identically — no float formatting, no log10 edge cases at power-
    * of-ten boundaries), and the expected distribution is a literal
    * ⌊log10(1+1/d)·10⁴⌋ lookup so no runtime transcendental crosses
    * the gate. One partial-aggregable 9-group shuffle.
    */
  val q141BenfordAudit = QueryDef(
    "q141_benford_audit",
    "Benford leading-digit audit: exact string-derived digits vs literal expected basis points",
    """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |dg AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM c),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM dg),
      |o AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM dg GROUP BY digit)
      |SELECT digit, n_obs, (10000 * n_obs) // total AS obs_bp,
      |  CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1760 WHEN 3 THEN 1249
      |       WHEN 4 THEN 969 WHEN 5 THEN 791 WHEN 6 THEN 669
      |       WHEN 7 THEN 579 WHEN 8 THEN 511 ELSE 457 END AS exp_bp
      |FROM o, n ORDER BY digit""".stripMargin) { (s, d) =>
    val dg = Tables.orders(s, d)
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .select(substring(col("cents").cast("string"), 1, 1).cast("long").as("digit"))
    val n = dg.agg(count(lit(1)).as("total"))
    dg.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      .crossJoin(broadcast(n))
      .select(col("digit"), col("n_obs"),
        expr("(10000 * n_obs) div total").as("obs_bp"),
        when(col("digit") === 1, 3010L).when(col("digit") === 2, 1760L)
          .when(col("digit") === 3, 1249L).when(col("digit") === 4, 969L)
          .when(col("digit") === 5, 791L).when(col("digit") === 6, 669L)
          .when(col("digit") === 7, 579L).when(col("digit") === 8, 511L)
          .otherwise(457L).as("exp_bp"))
      .orderBy(col("digit"))
  }

  /** A/B experiment readout — Welch's z between the purchase-value
    * means of two deterministic user cohorts (`user_id % 2`; a real
    * experiment ships the assignment column, the statistics are
    * identical). The five sufficient statistics per arm (n, Σy, Σy²
    * in integer cents) are EXACT partial-aggregable sums — one
    * shuffle, q135's moment-sum shape — and the mean difference and
    * z-score are each ONE fixed-shape double expression of those
    * integers, mirrored operation-for-operation in the oracle and
    * rounded at 4dp only at output.
    */
  val q143AbTest = QueryDef(
    "q143_ab_test",
    "A/B Welch z-test from exact integer moment sums, one aggregate pass",
    """WITH p AS (SELECT CAST(user_id % 2 AS BIGINT) AS arm,
      |                  CAST(round(value * 100) AS BIGINT) AS y
      |           FROM events WHERE event_type = 'purchase'),
      |m AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
      |             CAST(sum(y * y) AS BIGINT) AS ss
      |      FROM p GROUP BY arm),
      |w AS (SELECT
      |  max(CASE WHEN arm = 0 THEN n END) AS n0, max(CASE WHEN arm = 0 THEN s END) AS s0,
      |  max(CASE WHEN arm = 0 THEN ss END) AS ss0,
      |  max(CASE WHEN arm = 1 THEN n END) AS n1, max(CASE WHEN arm = 1 THEN s END) AS s1,
      |  max(CASE WHEN arm = 1 THEN ss END) AS ss1
      |  FROM m)
      |SELECT n0, n1,
      |  round(CAST(s0 AS DOUBLE) / n0 - CAST(s1 AS DOUBLE) / n1, 4) AS mean_diff_cents,
      |  round((CAST(s0 AS DOUBLE) / n0 - CAST(s1 AS DOUBLE) / n1)
      |    / sqrt((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0) / (n0 - 1) / n0
      |         + (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1), 4) AS z_welch
      |FROM w""".stripMargin) { (s, d) =>
    val p = Tables.events(s, d).filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).cast("long").as("arm"),
        expr("cast(round(value * 100) as bigint)").as("y"))
    val m = p.groupBy(col("arm")).agg(count(lit(1)).as("n"),
      sum(col("y")).as("s"), sum(col("y") * col("y")).as("ss"))
    val w = m.agg(
      max(when(col("arm") === 0, col("n"))).as("n0"),
      max(when(col("arm") === 0, col("s"))).as("s0"),
      max(when(col("arm") === 0, col("ss"))).as("ss0"),
      max(when(col("arm") === 1, col("n"))).as("n1"),
      max(when(col("arm") === 1, col("s"))).as("s1"),
      max(when(col("arm") === 1, col("ss"))).as("ss1"))
    val mean0 = col("s0").cast("double") / col("n0")
    val mean1 = col("s1").cast("double") / col("n1")
    val var0 = (col("ss0").cast("double") - col("s0").cast("double") * col("s0") / col("n0")) /
      (col("n0") - 1) / col("n0")
    val var1 = (col("ss1").cast("double") - col("s1").cast("double") * col("s1") / col("n1")) /
      (col("n1") - 1) / col("n1")
    w.select(col("n0"), col("n1"),
      round(mean0 - mean1, 4).as("mean_diff_cents"),
      round((mean0 - mean1) / sqrt(var0 + var1), 4).as("z_welch"))
  }

  /** Robust outlier detection via MAD (median absolute deviation) —
    * q113's 3-sigma sweep breaks when the contamination itself skews
    * μ/σ; the robust form flags `|y − median| > 3·1.4826·MAD`. Both
    * medians come from q109's compressed-relation construction (one
    * (key, value) count shuffle each — never a per-group value
    * buffer), and everything stays EXACT INTEGER by doubling: with
    * `med2 = m1 + m2` (twice the interpolated median) the deviation
    * `dev = |2y − med2|` is an integer, `mad2 = twice the interpolated
    * median of dev` is an integer (4× the real MAD), and the flag
    * test `|y−med| > 3·1.4826·MAD` becomes `10000·dev > 22239·mad2`
    * — only integer products cross the gate. The reported median/MAD
    * are `med2/2.0` and `mad2/4.0`: exact dyadic rationals, so the
    * doubles are bit-identical in both engines with no rounding.
    */
  val q145MadOutliers = QueryDef(
    "q145_mad_outliers",
    "robust MAD outlier counts per event type: two compressed-relation exact medians, integer flag test",
    """WITH y AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS y
      |           FROM events WHERE value IS NOT NULL),
      |med AS (SELECT event_type,
      |          CAST(2 * quantile_cont(y, 0.5) AS BIGINT) AS med2,
      |          CAST(count(*) AS BIGINT) AS n
      |        FROM y GROUP BY event_type),
      |dev AS (SELECT y.event_type, abs(2 * y.y - m.med2) AS dev, m.med2, m.n
      |        FROM y JOIN med m ON y.event_type = m.event_type),
      |mad AS (SELECT event_type, CAST(2 * quantile_cont(dev, 0.5) AS BIGINT) AS mad2,
      |               min(med2) AS med2, min(n) AS n
      |        FROM dev GROUP BY event_type),
      |fl AS (SELECT d.event_type,
      |         CAST(sum(CASE WHEN 10000 * d.dev > 22239 * m.mad2 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |       FROM dev d JOIN mad m ON d.event_type = m.event_type
      |       GROUP BY d.event_type)
      |SELECT m.event_type, m.n, m.med2 / 2.0 AS median_cents,
      |  m.mad2 / 4.0 AS mad_cents, f.n_outliers
      |FROM mad m JOIN fl f ON f.event_type = m.event_type
      |ORDER BY m.event_type""".stripMargin) { (s, d) =>
    // NO events re-scan: everything runs on the memoized (type, value,
    // count) compressed relation (shared with q138) — the deviation
    // relation is DERIVED from it (|2y−med2| per distinct y, weights
    // carried along), never re-scanned from events.
    val comp = compressedCents(s, d)
    // Exact interpolated median read off the MEMOIZED per-type cents
    // CDF ([[centsCdf]], shared with q154/q175): a filter + one
    // groupBy — the range-partitioned CDF machinery (never a
    // partitionBy(event_type) window — with ~5 event types that shape
    // funnels each type's whole distinct-value set through one task)
    // is paid once per session. med2 = 2× the median, an integer.
    // med and mad are 5-row relations each consumed by TWO branches
    // (deviation build + final join; flag test + final join) — cache
    // them or the whole upstream pipeline evaluates twice.
    val med = graft.AutoUnpersist.scoped(
      graft.api.Quantiles.median2FromCdf(centsCdf(s, d), Seq("event_type"), "y"))
    // devComp is NOT cached: its only consumer is devCdf (itself
    // cached below), so a persist here would be pure overhead
    val devComp =
      comp.join(broadcast(med.select(col("event_type"), col("med2"))),
          "event_type")
        .select(col("event_type"),
          abs(lit(2) * col("y") - col("med2")).as("dev"), col("c"))
        .groupBy(col("event_type"), col("dev")).agg(sum(col("c")).as("c"))
    // The dev distribution is probed twice (its median AND the flag
    // count) — build its CDF once, cache it, and read both answers off
    // it (the same pay-once shape as the cents CDF, scoped to this
    // query because dev depends on med).
    val devCdf = graft.AutoUnpersist.scoped(
      graft.api.Quantiles.cdfOf(devComp, Seq("event_type"), "dev", "c"))
    val mad = graft.AutoUnpersist.scoped(
      graft.api.Quantiles.median2FromCdf(devCdf, Seq("event_type"), "dev")
        .select(col("event_type"), col("med2").as("mad2")))
    val flagged = devCdf.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(sum(when(lit(10000L) * col("dev") > lit(22239L) * col("mad2"),
        col("c")).otherwise(0L)).as("n_outliers"))
    med.join(mad, "event_type").join(flagged, "event_type")
      .select(col("event_type"), col("n"),
        (col("med2") / 2.0).as("median_cents"),
        (col("mad2") / 4.0).as("mad_cents"), col("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** Score-calibration curve (reliability diagram) — q137's AUC says
    * whether the score RANKS well; calibration says whether its decile
    * buckets carry honest outcome rates. Deciles come from the same
    * scale-safe total order ((score, event_id) via
    * [[graft.api.Ranking.withRank]], never `ntile()` whose
    * tie-handling differs between engines), cut by the integer rule
    * `decile = ⌊(rn−1)·10 / N⌋`; per-decile outcome rates and mean
    * scores are exact integer arithmetic.
    */
  val q147Calibration = QueryDef(
    "q147_calibration",
    "decile calibration of score vs purchase outcome: rank-derived integer deciles, exact rates",
    """WITH e AS (SELECT event_id, event_type = 'purchase' AS pos,
      |                  CAST(round(value * 100) AS BIGINT) AS y
      |           FROM events WHERE value IS NOT NULL),
      |r AS (SELECT pos, y, CAST(row_number() OVER (ORDER BY y, event_id) AS BIGINT) AS rn FROM e),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM e),
      |dec AS (SELECT ((rn - 1) * 10) // total AS decile, pos, y FROM r, n)
      |SELECT decile, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |  (10000 * CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS rate_bp,
      |  CAST(sum(y) AS BIGINT) // count(*) AS mean_score_cents
      |FROM dec GROUP BY decile
      |ORDER BY decile""".stripMargin) { (s, d) =>
    rankedEvents(s, d)
      .select(col("pos"), col("y"),
        expr("((rn - 1) * 10) div grp_n").as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("y")).as("sum_y"))
      .select(col("decile"), col("n_events"), col("n_pos"),
        expr("(10000 * n_pos) div n_events").as("rate_bp"),
        expr("sum_y div n_events").as("mean_score_cents"))
      .orderBy(col("decile"))
  }

  /** Revenue concentration (Pareto / gains curve) — "what share of
    * revenue do the top decile of parts carry?": per-part revenue in
    * exact integer cents (q128's per-row fixed-shape round), parts
    * ranked globally by (revenue desc, key) with the scale-safe
    * ranking API, deciles by the same integer rule as q147, then the
    * cumulative share window runs on the 10-row decile relation —
    * METADATA, never the part table. The classic skew audit that
    * motivates q51's salting and AQE's skew handling.
    */
  val q148RevenueConcentration = QueryDef(
    "q148_revenue_concentration",
    "Pareto revenue-concentration curve: exact cents, scale-safe ranking, metadata-sized cumulative window",
    """WITH rev AS (
      |  SELECT l_partkey AS part, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem GROUP BY l_partkey),
      |r AS (SELECT part, cents,
      |        CAST(row_number() OVER (ORDER BY cents DESC, part) AS BIGINT) AS rn
      |      FROM rev),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_parts, CAST(sum(cents) AS BIGINT) AS total FROM rev),
      |dec AS (SELECT ((rn - 1) * 10) // n_parts AS decile, cents FROM r, n),
      |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_parts,
      |             CAST(sum(cents) AS BIGINT) AS decile_cents
      |      FROM dec GROUP BY decile),
      |c AS (SELECT decile, n_parts, decile_cents,
      |        CAST(sum(decile_cents) OVER (ORDER BY decile) AS BIGINT) AS cum_cents
      |      FROM g)
      |SELECT decile, n_parts, decile_cents,
      |  (10000 * cum_cents) // (SELECT total FROM n) AS cum_share_bp
      |FROM c ORDER BY decile""".stripMargin) { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .select(col("l_partkey").as("part"),
        expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
          .as("c"))
      .groupBy(col("part")).agg(sum(col("c")).as("cents"))
    val ranked = graft.api.Ranking.withRank(rev, Nil,
      Seq(col("cents").desc, col("part")))
    val g = ranked
      .select(expr("((rn - 1) * 10) div grp_n").as("decile"), col("cents"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("decile_cents"))
    val tot = rev.agg(sum(col("cents")).as("total"))
    // cumulative share over the 10-row decile relation — metadata
    val w = Window.partitionBy().orderBy(col("decile"))
    g.select(col("decile"), col("n_parts"), col("decile_cents"),
        sum(col("decile_cents")).over(w).as("cum_cents"))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_parts"), col("decile_cents"),
        expr("(10000 * cum_cents) div total").as("cum_share_bp"))
      .orderBy(col("decile"))
  }

  /** NDCG@100 of the score ranking against purchase outcomes — the
    * graded-ranking evaluation that completes the family (q137 AUC:
    * pairwise order; q147 calibration: bucket honesty; this: position-
    * discounted top-of-list quality). Positions come from the SAME
    * memoized [[rankedEvents]] total order (descending position
    * `n − rn + 1` — no second ranking pass); the discount table
    * `g(i) = ⌊10⁶·log2(2)/log2(i+1)⌋` is PRECOMPUTED into literals
    * shared by BOTH engines (the q141 Benford convention — no runtime
    * transcendental ever crosses the engine boundary), so DCG is an
    * exact integer sum and IDCG an exact prefix-sum lookup at
    * min(P, 100). NDCG in basis points by integer division.
    */
  private val NdcgK = 100
  private val NdcgGain: IndexedSeq[Long] =
    (1 to NdcgK).map(i =>
      math.floor(1e6 * math.log(2) / math.log(i + 1.0)).toLong)
  private val NdcgCum: IndexedSeq[Long] = NdcgGain.scanLeft(0L)(_ + _).tail

  val q152NdcgEval = QueryDef(
    "q152_ndcg_eval",
    "NDCG@100 of score vs purchase outcome: shared ranked relation, literal discount table, integer DCG",
    {
      val gainRows = (1 to NdcgK)
        .map(i => s"($i, ${NdcgGain(i - 1)})").mkString(", ")
      val cumRows = (1 to NdcgK)
        .map(i => s"($i, ${NdcgCum(i - 1)})").mkString(", ")
      s"""WITH e AS (SELECT event_id, event_type = 'purchase' AS pos,
         |                  CAST(round(value * 100) AS BIGINT) AS y
         |           FROM events WHERE value IS NOT NULL),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
         |             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
         |      FROM e),
         |r AS (SELECT pos,
         |        CAST(row_number() OVER (ORDER BY y DESC, event_id DESC) AS BIGINT) AS i
         |      FROM e),
         |g(i, gv) AS (VALUES $gainRows),
         |cg(i, cv) AS (VALUES $cumRows),
         |dcg AS (SELECT CAST(sum(CASE WHEN r.pos THEN g.gv ELSE 0 END) AS BIGINT) AS dcg_micro
         |        FROM r JOIN g ON g.i = r.i WHERE r.i <= $NdcgK),
         |idcg AS (SELECT CAST(cg.cv AS BIGINT) AS idcg_micro
         |         FROM n LEFT JOIN cg ON cg.i = least(n.n_pos, $NdcgK))
         |SELECT n.n_events, n.n_pos, dcg.dcg_micro, idcg.idcg_micro,
         |  (10000 * dcg.dcg_micro) // idcg.idcg_micro AS ndcg_bp
         |FROM n, dcg, idcg""".stripMargin
    }) { (s, d) =>
    import s.implicits._
    val ranked = rankedEvents(s, d)
    // descending position: rn ranks ascending by (y, event_id), so
    // i = n − rn + 1 is exactly row_number over (y DESC, event_id DESC)
    val top = ranked
      .select(col("pos"), (col("grp_n") - col("rn") + 1).as("i"))
      .filter(col("i") <= NdcgK)
    val gain = NdcgGain.zipWithIndex
      .map { case (g, idx) => (idx + 1L, g) }.toDF("i", "gv")
    val cum = NdcgCum.zipWithIndex
      .map { case (c, idx) => (idx + 1L, c) }.toDF("i", "cv")
    val n = ranked.agg(count(lit(1)).as("n_events"),
      sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
    val dcg = top.join(broadcast(gain), "i")
      .agg(sum(when(col("pos"), col("gv")).otherwise(0L)).as("dcg_micro"))
    // LEFT join: on single-class input n_pos = 0 matches no cum row —
    // the q137/q138 convention is a row with a NULL metric, never an
    // empty result, so the lookup must not filter the counts away
    val idcg = broadcast(n)
      .join(broadcast(cum),
        col("i") === least(col("n_pos"), lit(NdcgK.toLong)), "left_outer")
      .select(col("cv").as("idcg_micro"))
    broadcast(n).crossJoin(broadcast(dcg)).crossJoin(broadcast(idcg))
      .select(col("n_events"), col("n_pos"), col("dcg_micro"),
        col("idcg_micro"),
        expr("(10000 * dcg_micro) div idcg_micro").as("ndcg_bp"))
  }

  /** Population Stability Index between the 'view' and 'click' value
    * distributions — the production drift monitor that reports
    * MAGNITUDE where q138's KS reports a supremum (PSI is what model-
    * monitoring dashboards threshold at 0.1/0.25): 20 equi-width bins
    * over the pooled range, add-1 smoothed shares, `PSI = Σ (pᵢ−qᵢ)·
    * ln(pᵢ/qᵢ)`. Starts from the SAME memoized value-compressed
    * relation as q138/q145 — no events scan of its own; the per-bin
    * term is ONE fixed-shape double expression of exact integer counts
    * (mirrored operation-for-operation in the oracle), floored to
    * micros per bin on the 20-row METADATA spine, so the reported sum
    * is an integer of at most 20 floored terms.
    *
    * Cross-engine caveat (documented tolerance): the per-bin `ln` runs
    * at RUNTIME in both engines (data-dependent ratio — not
    * precomputable into the q141/q152 literal tables), and JVM
    * `Math.log` vs DuckDB libm `log` are each only ~1-ulp accurate, so
    * a term within an ulp of an integer micro boundary could floor one
    * micro apart. Residual exact-hash risk: ≤1 micro per bin (≤20
    * total), unobserved on the driver's pairing.
    */
  val q153PsiDrift = QueryDef(
    "q153_psi_drift",
    "PSI drift between view/click value distributions: 20-bin spine, smoothed integer-count terms in micros",
    """WITH src AS (SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS y,
      |                    CAST(count(*) AS BIGINT) AS w
      |             FROM events
      |             WHERE event_type IN ('view', 'click') AND value IS NOT NULL
      |             GROUP BY event_type, CAST(round(value * 100) AS BIGINT)),
      |b AS (SELECT min(y) AS lo, max(y) AS hi FROM src),
      |bu AS (SELECT t, w, CASE WHEN hi = lo THEN 0
      |                         ELSE least(19, ((y - lo) * 20) // (hi - lo)) END AS bin
      |       FROM src, b),
      |c AS (SELECT bin, CAST(sum(CASE WHEN t = 'view' THEN w ELSE 0 END) AS BIGINT) AS ca,
      |             CAST(sum(CASE WHEN t = 'click' THEN w ELSE 0 END) AS BIGINT) AS cb
      |      FROM bu GROUP BY bin),
      |spine AS (SELECT CAST(unnest(range(0, 20)) AS BIGINT) AS bin),
      |gg AS (SELECT s.bin, coalesce(c.ca, 0) AS ca, coalesce(c.cb, 0) AS cb
      |       FROM spine s LEFT JOIN c ON c.bin = s.bin),
      |n AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM gg),
      |terms AS (SELECT bin,
      |    CAST(floor(1000000.0 *
      |      (CAST(ca + 1 AS DOUBLE) / (n_a + 20) - CAST(cb + 1 AS DOUBLE) / (n_b + 20))
      |      * ln((CAST(ca + 1 AS DOUBLE) * (n_b + 20)) / (CAST(cb + 1 AS DOUBLE) * (n_a + 20)))
      |    ) AS BIGINT) AS term_micro
      |  FROM gg, n)
      |SELECT n.n_a, n.n_b,
      |  CAST(sum(t.term_micro) AS BIGINT) AS psi_micro
      |FROM terms t, n
      |GROUP BY n.n_a, n.n_b""".stripMargin) { (s, d) =>
    val src = compressedCents(s, d)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_type").as("t"), col("y"), col("c").as("w"))
    val bounds = src.agg(min(col("y")).as("lo"), max(col("y")).as("hi"))
    val bu = src.crossJoin(broadcast(bounds))
      .select(col("t"), col("w"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(lit(19L), expr("((y - lo) * 20) div (hi - lo)")))
          .as("bin"))
    val c = bu.groupBy(col("bin")).agg(
      sum(when(col("t") === "view", col("w")).otherwise(0L)).as("ca"),
      sum(when(col("t") === "click", col("w")).otherwise(0L)).as("cb"))
    val spine = s.range(0, 20).select(col("id").as("bin"))
    val gg = spine.join(c, Seq("bin"), "left_outer")
      .select(col("bin"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val n = gg.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val pa = (col("ca") + 1).cast("double") / (col("n_a") + 20)
    val pb = (col("cb") + 1).cast("double") / (col("n_b") + 20)
    val ratio = ((col("ca") + 1).cast("double") * (col("n_b") + 20)) /
      ((col("cb") + 1).cast("double") * (col("n_a") + 20))
    gg.crossJoin(broadcast(n))
      .select(col("n_a"), col("n_b"),
        floor(lit(1000000.0) * (pa - pb) * log(ratio))
          .cast("long").as("term_micro"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum(col("term_micro")).as("psi_micro"))
      .select(col("n_a"), col("n_b"), col("psi_micro"))
  }

  /** Winsorized robust statistics — the third member of the outlier
    * family (q113 flags by 3σ, q145 by MAD; winsorization doesn't
    * flag, it CLAMPS to the exact [p05, p95] quantiles, the standard
    * way to feed heavy-tailed metrics into means). Bounds are exact
    * nearest-rank quantiles at the symmetric 0-based positions
    * k = ⌊(n−1)·5/100⌋ and (n−1)−k, pulled by
    * [[graft.api.Quantiles.valuesAtPositionsFromCdf]] off the
    * MEMOIZED per-type cents CDF ([[centsCdf]], shared with
    * q145/q175 — no events scan or CDF machinery of its own); the
    * clamped sum is exact integer arithmetic against the broadcast
    * 5-row bounds, divided into a rounded double only at output.
    */
  val q154WinsorizedStats = QueryDef(
    "q154_winsorized_stats",
    "winsorized per-type mean: exact nearest-rank p05/p95 clamp bounds from one CDF pass, integer clamp sum",
    """WITH y AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS y,
      |                  CAST(count(*) AS BIGINT) AS c
      |           FROM events WHERE value IS NOT NULL
      |           GROUP BY event_type, CAST(round(value * 100) AS BIGINT)),
      |cum AS (SELECT event_type, y, c,
      |         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY y) AS BIGINT) AS hi
      |        FROM y),
      |nn AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM y GROUP BY event_type),
      |k AS (SELECT event_type, n,
      |        CAST(floor((n - 1) * 5 / 100.0) AS BIGINT) AS k_lo,
      |        (n - 1) - CAST(floor((n - 1) * 5 / 100.0) AS BIGINT) AS k_hi
      |      FROM nn),
      |b AS (SELECT k.event_type, k.n,
      |        min(CASE WHEN k.k_lo >= cum.hi - cum.c AND k.k_lo < cum.hi THEN cum.y END) AS p05,
      |        min(CASE WHEN k.k_hi >= cum.hi - cum.c AND k.k_hi < cum.hi THEN cum.y END) AS p95
      |      FROM k JOIN cum ON cum.event_type = k.event_type
      |      GROUP BY k.event_type, k.n),
      |w AS (SELECT y.event_type, b.n, b.p05, b.p95,
      |        CAST(sum(CASE WHEN y.y < b.p05 OR y.y > b.p95 THEN y.c ELSE 0 END) AS BIGINT) AS n_clamped,
      |        CAST(sum(least(greatest(y.y, b.p05), b.p95) * y.c) AS BIGINT) AS wsum
      |      FROM y JOIN b ON b.event_type = y.event_type
      |      GROUP BY y.event_type, b.n, b.p05, b.p95)
      |SELECT event_type, n, p05 AS p05_cents, p95 AS p95_cents, n_clamped,
      |  round(CAST(wsum AS DOUBLE) / n, 4) AS wins_mean_cents
      |FROM w ORDER BY event_type""".stripMargin) { (s, d) =>
    val comp = compressedCents(s, d)
    def kLo(n: org.apache.spark.sql.Column) =
      floor((n - 1) * 5 / lit(100.0)).cast("long")
    // bounds read off the memoized per-type cents CDF (shared with
    // q145/q175): filter + one groupBy, no CDF machinery of its own
    val bounds = graft.api.Quantiles.valuesAtPositionsFromCdf(
      centsCdf(s, d), Seq("event_type"), "y",
      Seq("p05" -> (n => kLo(n)), "p95" -> (n => n - 1 - kLo(n))))
    comp.join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"))
      .agg(min(col("n")).as("n"),
        min(col("p05")).as("p05_cents"),
        min(col("p95")).as("p95_cents"),
        sum(when(col("y") < col("p05") || col("y") > col("p95"), col("c"))
          .otherwise(0L)).as("n_clamped"),
        sum(least(greatest(col("y"), col("p05")), col("p95")) * col("c"))
          .as("wsum"))
      .select(col("event_type"), col("n"), col("p05_cents"), col("p95_cents"),
        col("n_clamped"),
        round(col("wsum").cast("double") / col("n"), 4).as("wins_mean_cents"))
      .orderBy(col("event_type"))
  }

  /** The spine-filled, 1-indexed hourly event-count series q162 (ACF)
    * and q163 (seasonal anomaly) both consume — one events scan into
    * a per-hour partial+final aggregate, gap-filled against a
    * generated `sequence` spine (q70's shape) so lag arithmetic sees
    * a REGULAR series, then indexed by one `row_number` window over
    * the ~720-row METADATA relation (hours grow with calendar span,
    * not data volume — ~9k rows/year at any corpus size). Memoized
    * per (session, sf) like [[rankedEvents]]/[[compressedCents]].
    */
  def hourlySeries(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    graft.SessionMemo.getOrCompute(s, "stats.hourly:" + d) {
      // durable through the catalog like the other shared families:
      // the series is calendar-sized, but its BUILD scans all of
      // events — the scan, not the rows, is what the memo saves
      graft.api.MemoCatalog.readThrough(s, "hourly:" + d,
        Seq(Tables.events(s, d).select(col("ts")))) {
      val hc = Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("x"))
      val b = hc.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      val spine = b.select(
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
      spine.join(hc, Seq("h"), "left_outer")
        .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
        .withColumn("i",
          row_number().over(Window.orderBy(col("h"))).cast("long"))
      }
    }

  /** Sample autocorrelation function of the hourly event-count series
    * at lags 1–24 — the seasonality detector that tells a pipeline
    * whether its traffic has a daily cycle before it trusts q135's
    * linear trend or q163's hour-of-day baselines: a spike at lag 24
    * is the daily period, geometric decay is short-memory noise.
    * Standard sample ACF: r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²
    * (constant denominator, full-series mean — the Box–Jenkins form).
    *
    * Exactness: both sides are multiplied through by n² so every term
    * is the exact integer (n·x_t − S); numerator and denominator are
    * exact LONG sums and the single final `⌊10⁴·num/den⌋` double
    * division is cross-engine exact (inputs < 2^53, IEEE ÷ correctly
    * rounded — the q159 sqrt argument, here without even the sqrt).
    * Integer `div` would NOT be portable here: Spark truncates toward
    * zero, DuckDB floors, and ACF numerators go negative. LONG bound:
    * terms peak at n·(n·x_max)² — with the ~720-hour window that
    * holds through ~5 M events/hour (≈4 B events/month); past that,
    * widen the sums to DECIMAL(38,0) (the q159 note's convention).
    *
    * Scale shape: everything after the [[hourlySeries]] aggregate
    * runs on the ~720-row metadata series — the 24 lag joins produce
    * ~17k rows total. NULL ACF on a constant series (den = 0).
    */
  val q162Autocorrelation = QueryDef(
    "q162_autocorrelation",
    "hourly-count ACF at lags 1-24: spine-filled series, exact n^2-scaled integer moments, daily-cycle detector",
    """WITH b AS (SELECT min(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS lo,
      |                  max(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hi FROM events),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
      |hc AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, CAST(count(*) AS BIGINT) AS x
      |       FROM events GROUP BY 1),
      |ser AS (SELECT row_number() OVER (ORDER BY s.h) AS i, coalesce(hc.x, 0) AS x
      |        FROM spine s LEFT JOIN hc ON hc.h = s.h),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx FROM ser),
      |den AS (SELECT CAST(sum((n*x - sx)*(n*x - sx)) AS BIGINT) AS d FROM ser, st),
      |lags AS (SELECT unnest(range(1, 25)) AS k),
      |num AS (SELECT k, CAST(count(*) AS BIGINT) AS n_pairs,
      |          CAST(sum((st.n*a.x - st.sx)*(st.n*b.x - st.sx)) AS BIGINT) AS nu
      |        FROM lags, ser a JOIN ser b ON b.i = a.i + lags.k, st
      |        GROUP BY k)
      |SELECT k AS lag, n_pairs,
      |  CASE WHEN den.d = 0 THEN NULL
      |       ELSE CAST(floor((10000.0 * nu) / CAST(den.d AS DOUBLE)) AS BIGINT) END AS acf_bp
      |FROM num, den ORDER BY lag""".stripMargin) { (s, d) =>
    val ser = hourlySeries(s, d)
    val st = ser.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val den = ser.crossJoin(broadcast(st))
      .agg(sum((col("n") * col("x") - col("sx")) *
               (col("n") * col("x") - col("sx"))).as("d"))
    val lags = s.range(1, 25).select(col("id").as("k"))
    val sa = ser.select(col("i").as("ia"), col("x").as("xa"))
    val sb = ser.select(col("i").as("ib"), col("x").as("xb"))
    val num = sa.crossJoin(broadcast(lags))
      .join(sb, col("ib") === col("ia") + col("k"))
      .crossJoin(broadcast(st))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("n") * col("xa") - col("sx")) *
            (col("n") * col("xb") - col("sx"))).as("nu"))
    num.crossJoin(broadcast(den))
      .select(col("k").as("lag"), col("n_pairs"),
        when(col("d") === 0L, lit(null))
          .otherwise(floor((lit(10000.0) * col("nu")) / col("d").cast("double")))
          .cast("long").as("acf_bp"))
      .orderBy(col("lag"))
  }

  /** Hour-of-day seasonal anomaly detection with a LEAVE-ONE-OUT
    * baseline — the on-call traffic monitor: each hour's count is
    * z-scored against the mean/std of the SAME hour-of-day across
    * every OTHER day, so the candidate observation never contaminates
    * its own baseline (the masked-detector property; a global 3σ like
    * q113 would let a big spike inflate the σ that is supposed to
    * catch it). Complements q162: ACF says WHETHER there is a daily
    * cycle, this scores each hour against that cycle.
    *
    * Exactness: per-hour-of-day (m, Σx, Σx²) are exact LONG sums;
    * the LOO variance is multiplied through so
    * A = (m−1)(Q−x²) − (S−x)² and B = m·x − S are exact integers and
    * z = B·√((m−2)/((m−1)·A)) is ONE fixed-shape double expression
    * of exact < 2^53 integers — cross-engine exact by the q159 IEEE
    * sqrt/÷ argument. NULL z when m < 3 or A ≤ 0 (degenerate
    * baseline, q137 convention); the anomaly flag is
    * `coalesce(|z| ≥ 3, false)` so constant groups read "normal",
    * never NULL.
    *
    * Scale shape: one groupBy over the [[hourlySeries]] metadata
    * relation (24 baseline rows, broadcast back); no data-sized
    * window, no second events scan.
    */
  val q163SeasonalAnomaly = QueryDef(
    "q163_seasonal_anomaly",
    "hour-of-day anomalies: leave-one-out seasonal baseline, exact integer moments, z in bp, |z|>=3 flag",
    """WITH b AS (SELECT min(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS lo,
      |                  max(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hi FROM events),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
      |hc AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, CAST(count(*) AS BIGINT) AS x
      |       FROM events GROUP BY 1),
      |ser AS (SELECT s.h, CAST(hour(s.h) AS BIGINT) AS hod, coalesce(hc.x, 0) AS x
      |        FROM spine s LEFT JOIN hc ON hc.h = s.h),
      |g AS (SELECT hod, CAST(count(*) AS BIGINT) AS m, CAST(sum(x) AS BIGINT) AS sx,
      |             CAST(sum(x*x) AS BIGINT) AS q FROM ser GROUP BY hod),
      |zt AS (SELECT ser.h, ser.x, g.m,
      |         (g.m - 1)*(g.q - ser.x*ser.x) - (g.sx - ser.x)*(g.sx - ser.x) AS a,
      |         g.m*ser.x - g.sx AS bb
      |       FROM ser JOIN g ON g.hod = ser.hod),
      |zz AS (SELECT h, x, CASE WHEN m < 3 OR a <= 0 THEN NULL
      |         ELSE CAST(floor((10000.0 * bb) *
      |                sqrt(CAST(m - 2 AS DOUBLE) / (CAST(m - 1 AS DOUBLE) * a))) AS BIGINT)
      |         END AS z_bp
      |       FROM zt)
      |SELECT h AS hour_start, x AS n_events, z_bp,
      |  coalesce(abs(z_bp) >= 30000, FALSE) AS is_anomaly
      |FROM zz ORDER BY hour_start""".stripMargin) { (s, d) =>
    val ser = hourlySeries(s, d)
      .select(col("h"), hour(col("h")).cast("long").as("hod"), col("x"))
    val g = ser.groupBy(col("hod"))
      .agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("q"))
    val zt = ser.join(broadcast(g), "hod")
      .select(col("h"), col("x"), col("m"),
        ((col("m") - 1) * (col("q") - col("x") * col("x")) -
          (col("sx") - col("x")) * (col("sx") - col("x"))).as("a"),
        (col("m") * col("x") - col("sx")).as("bb"))
    val zz = zt.select(col("h"), col("x"),
      when(col("m") < 3L || col("a") <= 0L, lit(null))
        .otherwise(floor((lit(10000.0) * col("bb")) *
          sqrt((col("m") - 2).cast("double") /
               ((col("m") - 1).cast("double") * col("a")))))
        .cast("long").as("z_bp"))
    zz.select(col("h").as("hour_start"), col("x").as("n_events"), col("z_bp"),
        coalesce(abs(col("z_bp")) >= 30000L, lit(false)).as("is_anomaly"))
      .orderBy(col("hour_start"))
  }

  /** Spearman rank correlation between two per-user activity signals
    * (view count vs click count) — the rank-based dependence monitor
    * that complements q135's least-squares slope (raw-scale, outlier-
    * sensitive) and q137's rank-sum AUC (binary-label): Spearman asks
    * "do the users who view most also click most?" robustly to the
    * heavy-tailed count scales. Computed as Pearson on average-tie
    * ranks — the textbook tied-data form.
    *
    * Exactness: ranks are VALUE-COMPRESSED — per-user counts collapse
    * to (count-value, multiplicity) relations of ~Poisson-support size
    * (dozens of rows at any corpus scale), so the average-tie rank
    * `2·avg = 2·|less| + m + 1` (scaled by 2 to stay integral) comes
    * from a running sum over that METADATA relation, never a window
    * over the user table. All moment sums (Σxy, Σx², …) aggregate the
    * (a, b)-pair-compressed joint relation in DECIMAL(38,0) (DuckDB:
    * HUGEINT) — with average-tie ranks ≤ 2n+1 the variance terms
    * reach ~4·n_users⁴, which overflows LONG already at ~4×10⁴ users;
    * the 38-digit sums hold to ~1.3×10⁹ users. The single final
    * double expression `⌊10⁴·num / √(d1·d2)⌋` is cross-engine exact
    * while the wide integers sit under 2^53 (exact as doubles; IEEE
    * requires correctly-rounded sqrt/·// — unlike ln, q153's
    * documented tolerance); beyond 2^53 (n_users ≳ 7×10³) both
    * engines round the SAME wide integer to double, a
    * correctly-rounded conversion in each, leaving at most the
    * floor-boundary sensitivity every fixed-shape double expression
    * in the suite shares. Degenerate zero-variance inputs report NULL
    * rho (q137/q152 convention), gated in DegenerateInputSpec.
    *
    * Scale shape: one events scan → per-user partial+final aggregate;
    * everything after runs on compressed relations joined back via
    * broadcast. No data-sized window, no driver collect.
    */
  val q159SpearmanActivity = QueryDef(
    "q159_spearman_activity",
    "Spearman rank correlation of per-user view vs click counts: value-compressed average-tie ranks, exact integer moments",
    """WITH ub AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS b
      |  FROM events GROUP BY user_id),
      |ca AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS m FROM ub GROUP BY a),
      |cb AS (SELECT b AS v, CAST(count(*) AS BIGINT) AS m FROM ub GROUP BY b),
      |ra AS (SELECT v, 2 * (CAST(sum(m) OVER (ORDER BY v) AS BIGINT) - m) + m + 1 AS r2 FROM ca),
      |rb AS (SELECT v, 2 * (CAST(sum(m) OVER (ORDER BY v) AS BIGINT) - m) + m + 1 AS r2 FROM cb),
      |jt AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM ub GROUP BY a, b),
      |jr AS (SELECT jt.c, ra.r2 AS x, rb.r2 AS y
      |       FROM jt JOIN ra ON ra.v = jt.a JOIN rb ON rb.v = jt.b),
      |s AS (SELECT CAST(sum(c) AS BIGINT) AS n,
      |             sum(CAST(c AS HUGEINT) * x) AS sx,
      |             sum(CAST(c AS HUGEINT) * y) AS sy,
      |             sum(CAST(c AS HUGEINT) * x * y) AS sxy,
      |             sum(CAST(c AS HUGEINT) * x * x) AS sxx,
      |             sum(CAST(c AS HUGEINT) * y * y) AS syy
      |      FROM jr)
      |SELECT n AS n_users,
      |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
      |       ELSE CAST(floor((10000.0 * CAST(n * sxy - sx * sy AS DOUBLE)) /
      |              sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
      |                   CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
      |  END AS rho_bp
      |FROM s""".stripMargin) { (s, d) =>
    val ub = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("b"))
    val ubc = graft.AutoUnpersist.scoped(ub)
    // value-compressed average-tie rank maps: |support| rows, windowed
    // over THAT metadata relation only (the 20-row-spine precedent)
    def rankMap(keyCol: String): org.apache.spark.sql.DataFrame = {
      val cwin = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ubc.groupBy(col(keyCol).as("v")).agg(count(lit(1)).as("m"))
        .withColumn("r2",
          lit(2) * (sum(col("m")).over(cwin) - col("m")) + col("m") + 1)
        .select(col("v"), col("r2"))
    }
    val jt = ubc.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    val jr = jt
      .join(broadcast(rankMap("a")), col("v") === col("a")).drop("v")
      .withColumnRenamed("r2", "x")
      .join(broadcast(rankMap("b")), col("v") === col("b")).drop("v")
      .withColumnRenamed("r2", "y")
    // moment sums in DECIMAL(38,0) (the DuckDB twin's HUGEINT): with
    // average-tie ranks ≤ 2n+1 the per-row product c·x·y reaches 4n³
    // and the variance terms n·sxx − sx² reach 4n⁴ — LONG overflows at
    // ~4×10⁴ users, DECIMAL(38,0) holds to ~1.3×10⁹. Beyond that bound
    // the failure modes DIVERGE: Spark non-ANSI decimal overflow
    // yields NULLs that sum() silently skips, while DuckDB HUGEINT
    // raises — if a corpus ever approaches 1.3e9 distinct users, add
    // an explicit n_users guard rather than relying on either engine.
    val dc = col("c").cast("decimal(38,0)")
    val dx = col("x").cast("decimal(38,0)")
    val dy = col("y").cast("decimal(38,0)")
    val agg = jr.agg(
      sum(col("c")).as("n"),
      sum(dc * dx).as("sx"),
      sum(dc * dy).as("sy"),
      sum(dc * dx * dy).as("sxy"),
      sum(dc * dx * dx).as("sxx"),
      sum(dc * dy * dy).as("syy"))
    val dn = col("n").cast("decimal(38,0)")
    val num = dn * col("sxy") - col("sx") * col("sy")
    val d1 = dn * col("sxx") - col("sx") * col("sx")
    val d2 = dn * col("syy") - col("sy") * col("sy")
    agg.select(col("n").as("n_users"),
      when(d1 === lit(0).cast("decimal(38,0)") ||
           d2 === lit(0).cast("decimal(38,0)"), lit(null))
        .otherwise(floor(
          (lit(10000.0) * num.cast("double")) /
            sqrt(d1.cast("double") * d2.cast("double"))))
        .cast("long").as("rho_bp"))
  }

  /** Seasonal-naive forecast evaluation — the accuracy floor every
    * real forecaster is judged against (M-competition practice: if a
    * model can't beat "same hour yesterday", ship the naive): predict
    * x̂_t = x_{t−24} on the hourly series, report MAE and sMAPE plus
    * signed bias. Third consumer of the memoized [[hourlySeries]]
    * relation (q162 detects the cycle, q163 scores hours against it,
    * this measures how predictable it actually is).
    *
    * Exactness: errors are integer differences; sMAPE is kept exact
    * by flooring each per-pair term to integer MICROS
    * (`10⁶·|e| div (a+f)`, counts are non-negative so truncating and
    * flooring division agree across engines) and summing LONGs —
    * never a float sum whose order could diverge. MAE reported in
    * centi-events by the same integer-division argument.
    */
  val q165ForecastEval = QueryDef(
    "q165_forecast_eval",
    "seasonal-naive (t-24) forecast accuracy on hourly counts: integer MAE/sMAPE/bias, the model-eval floor",
    """WITH b AS (SELECT min(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS lo,
      |                  max(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hi FROM events),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
      |hc AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, CAST(count(*) AS BIGINT) AS x
      |       FROM events GROUP BY 1),
      |ser AS (SELECT row_number() OVER (ORDER BY s.h) AS i, coalesce(hc.x, 0) AS x
      |        FROM spine s LEFT JOIN hc ON hc.h = s.h),
      |p AS (SELECT a.x AS actual, f.x AS fc FROM ser a JOIN ser f ON a.i = f.i + 24),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum(abs(actual - fc)) AS BIGINT) AS tot_abs,
      |             CAST(sum(actual - fc) AS BIGINT) AS bias,
      |             CAST(sum(CASE WHEN actual + fc = 0 THEN 0
      |                  ELSE (1000000 * abs(actual - fc)) // (actual + fc) END) AS BIGINT) AS smape_sum
      |      FROM p)
      |SELECT n AS n_pairs, tot_abs AS total_abs_err,
      |  (100 * tot_abs) // n AS mae_centi,
      |  smape_sum // n AS smape_micro, bias
      |FROM t""".stripMargin) { (s, d) =>
    val ser = hourlySeries(s, d)
    val a = ser.select(col("i").as("ia"), col("x").as("actual"))
    val f = ser.select(col("i").as("ifc"), col("x").as("fc"))
    a.join(f, col("ia") === col("ifc") + 24)
      .agg(count(lit(1)).as("n"),
        sum(abs(col("actual") - col("fc"))).as("tot_abs"),
        sum(col("actual") - col("fc")).as("bias"),
        sum(when(col("actual") + col("fc") === 0L, 0L)
          .otherwise(expr("(1000000 * abs(actual - fc)) div (actual + fc)")))
          .as("smape_sum"))
      .select(col("n").as("n_pairs"), col("tot_abs").as("total_abs_err"),
        expr("(100 * tot_abs) div n").as("mae_centi"),
        expr("smape_sum div n").as("smape_micro"), col("bias"))
  }

  /** DAU / WAU engagement analytics — per day, the distinct users
    * active that day (DAU), in the trailing 7 days (WAU), and the
    * DAU/WAU "stickiness" ratio product dashboards threshold (~50% is
    * a daily habit). The canonical windowed-COUNT-DISTINCT problem:
    * distinct counts don't decompose over sliding windows, so the
    * trailing window is materialized as an explicit 7-offset
    * day-spine join over the DEDUPLICATED (day, user) relation — a
    * bounded 7× replication of the compressed relation, never of raw
    * events, then a partial-aggregable distinct count per day.
    * Stickiness is exact integer bp (counts are positive, `div`/`//`
    * agree).
    */
  val q166ActiveUsers = QueryDef(
    "q166_active_users",
    "DAU/WAU/stickiness per day: dedup to (day,user) once, 7-offset spine join, exact integer bp ratio",
    """WITH du AS (SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS d, user_id FROM events),
      |days AS (SELECT DISTINCT d FROM du),
      |dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d),
      |offs AS (SELECT unnest(range(0, 7)) AS o),
      |wau AS (SELECT days.d, CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau
      |        FROM days JOIN offs ON TRUE
      |                  JOIN du ON du.d = days.d - to_days(CAST(o AS INT))
      |        GROUP BY days.d)
      |SELECT dau.d AS day, dau.dau, wau.wau,
      |  (10000 * dau.dau) // wau.wau AS stickiness_bp
      |FROM dau JOIN wau ON wau.d = dau.d
      |ORDER BY day""".stripMargin) { (s, d) =>
    val du = graft.AutoUnpersist.scoped(
      Tables.events(s, d)
        .select(date_trunc("day", col("ts")).as("dd"), col("user_id"))
        .distinct())
    val days = du.select(col("dd").as("d2")).distinct()
    val dau = du.groupBy(col("dd").as("day")).agg(count(lit(1)).as("dau"))
    val offs = s.range(0, 7).select(col("id").as("o"))
    val wau = days.crossJoin(broadcast(offs))
      .join(du, col("dd") === expr("d2 - make_dt_interval(cast(o as int))"))
      .groupBy(col("d2"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, col("day") === col("d2"))
      .select(col("day"), col("dau"), col("wau"),
        expr("(10000 * dau) div wau").as("stickiness_bp"))
      .orderBy(col("day"))
  }

  /** Difference-in-differences uplift — the causal-inference step
    * past q143's Welch z (which only says the groups DIFFER, not
    * that the treatment moved them): with deterministic parity
    * assignment (the q56 idiom) and a mid-window cutover, the
    * pre-period difference absorbs any pre-existing group gap and
    * DiD = (T̄post−T̄pre) − (C̄post−C̄pre) estimates the treatment
    * effect under parallel trends. Cell sums/counts are exact LONG
    * integers off one partial-aggregable (treat, post) aggregate;
    * the estimate is ONE fixed-shape double expression of the eight
    * integers, floored to micro-cents — cross-engine exact (q159's
    * IEEE argument). Any empty cell ⇒ NULL DiD with counts kept
    * (q137/q152 convention, gated in DegenerateInputSpec).
    */
  val q167DidUplift = QueryDef(
    "q167_did_uplift",
    "difference-in-differences purchase uplift: parity treatment, mid-window cutover, exact integer cells, NULL on empty cell",
    """WITH e AS (SELECT user_id % 2 AS treat,
      |             CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS post,
      |             CAST(round(value * 100) AS BIGINT) AS cents
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT treat, post, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
      |      FROM e GROUP BY treat, post),
      |w AS (SELECT
      |  max(CASE WHEN treat=1 AND post=1 THEN n END) AS n_tp, max(CASE WHEN treat=1 AND post=1 THEN s END) AS s_tp,
      |  max(CASE WHEN treat=1 AND post=0 THEN n END) AS n_tq, max(CASE WHEN treat=1 AND post=0 THEN s END) AS s_tq,
      |  max(CASE WHEN treat=0 AND post=1 THEN n END) AS n_cp, max(CASE WHEN treat=0 AND post=1 THEN s END) AS s_cp,
      |  max(CASE WHEN treat=0 AND post=0 THEN n END) AS n_cq, max(CASE WHEN treat=0 AND post=0 THEN s END) AS s_cq
      |  FROM c)
      |SELECT n_tp, n_tq, n_cp, n_cq,
      |  CASE WHEN n_tp IS NULL OR n_tq IS NULL OR n_cp IS NULL OR n_cq IS NULL THEN NULL
      |       ELSE CAST(floor(1000000.0 * ((CAST(s_tp AS DOUBLE)/n_tp - CAST(s_tq AS DOUBLE)/n_tq)
      |                                   - (CAST(s_cp AS DOUBLE)/n_cp - CAST(s_cq AS DOUBLE)/n_cq))) AS BIGINT)
      |  END AS did_micro_cents
      |FROM w""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).as("treat"),
        when(col("ts") >= lit("2024-01-16 00:00:00").cast("timestamp"), 1)
          .otherwise(0).as("post"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
    val c = e.groupBy(col("treat"), col("post"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    def cell(t: Int, p: Int, v: String) =
      max(when(col("treat") === t && col("post") === p, col(v)))
    val w = c.agg(
      cell(1, 1, "n").as("n_tp"), cell(1, 1, "s").as("s_tp"),
      cell(1, 0, "n").as("n_tq"), cell(1, 0, "s").as("s_tq"),
      cell(0, 1, "n").as("n_cp"), cell(0, 1, "s").as("s_cp"),
      cell(0, 0, "n").as("n_cq"), cell(0, 0, "s").as("s_cq"))
    w.select(col("n_tp"), col("n_tq"), col("n_cp"), col("n_cq"),
      when(col("n_tp").isNull || col("n_tq").isNull ||
           col("n_cp").isNull || col("n_cq").isNull, lit(null))
        .otherwise(floor(lit(1000000.0) *
          ((col("s_tp").cast("double") / col("n_tp") -
            col("s_tq").cast("double") / col("n_tq")) -
           (col("s_cp").cast("double") / col("n_cp") -
            col("s_cq").cast("double") / col("n_cq")))))
        .cast("long").as("did_micro_cents"))
  }

  /** Quantile–quantile drift table — WHERE two distributions diverge,
    * where q138's KS gives the single largest gap and q153's PSI a
    * scalar magnitude: exact nearest-rank deciles of the 'view' and
    * 'click' value distributions side by side with signed gaps. A
    * tail-only gap (deciles 8–9) means drift concentrated in heavy
    * values — a different remediation than a uniform shift. All 18
    * decile lookups read the MEMOIZED per-type cents CDF
    * ([[centsCdf]], shared with q145/q154) via
    * [[graft.api.Quantiles.valuesAtPositionsFromCdf]] — a filter +
    * one groupBy, no CDF machinery of its own; positions use the
    * q154 floor-of-double convention mirrored in the twin.
    */
  val q175QqDrift = QueryDef(
    "q175_qq_drift",
    "Q-Q drift: exact nearest-rank deciles of view vs click values with signed gaps, one CDF pass",
    """WITH y AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS y,
      |                  CAST(count(*) AS BIGINT) AS c
      |           FROM events
      |           WHERE event_type IN ('view', 'click') AND value IS NOT NULL
      |           GROUP BY event_type, CAST(round(value * 100) AS BIGINT)),
      |cum AS (SELECT event_type, y, c,
      |         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY y) AS BIGINT) AS hi
      |        FROM y),
      |nn AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM y GROUP BY event_type),
      |k AS (SELECT nn.event_type, nn.n, d.d,
      |        CAST(floor((nn.n - 1) * d.d / 10.0) AS BIGINT) AS kd
      |      FROM nn CROSS JOIN (SELECT unnest(range(1, 10)) AS d) d),
      |b AS (SELECT k.event_type, k.d,
      |        min(CASE WHEN k.kd >= cum.hi - cum.c AND k.kd < cum.hi THEN cum.y END) AS q
      |      FROM k JOIN cum ON cum.event_type = k.event_type
      |      GROUP BY k.event_type, k.d)
      |SELECT v.d AS decile, v.q AS view_cents, c2.q AS click_cents,
      |  v.q - c2.q AS gap_cents
      |FROM b v JOIN b c2 ON v.d = c2.d
      |WHERE v.event_type = 'view' AND c2.event_type = 'click'
      |ORDER BY decile""".stripMargin) { (s, d) =>
    val positions = (1 to 9).map { dd =>
      s"q$dd" -> ((n: org.apache.spark.sql.Column) =>
        floor((n - 1) * dd / lit(10.0)).cast("long"))
    }
    // per-type CDFs are independent, so restricting the memoized
    // all-types cents CDF (shared with q145/q154) to view/click rows
    // IS the CDF of the restriction — filter + one groupBy
    val qs = graft.api.Quantiles.valuesAtPositionsFromCdf(
      centsCdf(s, d).filter(col("event_type").isin("view", "click")),
      Seq("event_type"), "y", positions)
    val stacked = qs.select(col("event_type"),
      expr("stack(9, " + (1 to 9).map(dd => s"${dd}L, q$dd").mkString(", ") +
        ") as (decile, q)"))
    stacked.filter(col("event_type") === "view")
      .select(col("decile"), col("q").as("view_cents"))
      .join(stacked.filter(col("event_type") === "click")
        .select(col("decile"), col("q").as("click_cents")), "decile")
      .select(col("decile"), col("view_cents"), col("click_cents"),
        (col("view_cents") - col("click_cents")).as("gap_cents"))
      .orderBy(col("decile"))
  }

  /** A/B experiment power analysis — the question q143 does NOT
    * answer: not "did the arms differ?" but "what effect COULD this
    * experiment detect?" The minimum detectable effect at α = 0.05
    * two-sided / 80% power is `(z_{0.975} + z_{0.8})·SE = 2.8·SE`
    * with the same Welch standard error as q143 (the z constants are
    * shared literals, the q141/q152 convention — no runtime normal
    * quantile). An experiment whose observed |Δ| sits under its MDE
    * is underpowered, not negative — the `powered` flag says which.
    * Same exact integer cell moments, one aggregate pass; the SE/MDE
    * chain is one fixed-shape double expression mirrored
    * operation-for-operation (IEEE sqrt/÷ — the q159 argument).
    */
  val q176AbPower = QueryDef(
    "q176_ab_power",
    "A/B power analysis: Welch-SE minimum detectable effect at alpha=.05/80% power, powered-or-not flag",
    """WITH p AS (SELECT CAST(user_id % 2 AS BIGINT) AS arm,
      |                  CAST(round(value * 100) AS BIGINT) AS y
      |           FROM events WHERE event_type = 'purchase'),
      |m AS (SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
      |             CAST(sum(y * y) AS BIGINT) AS ss
      |      FROM p GROUP BY arm),
      |w AS (SELECT
      |  max(CASE WHEN arm = 0 THEN n END) AS n0, max(CASE WHEN arm = 0 THEN s END) AS s0,
      |  max(CASE WHEN arm = 0 THEN ss END) AS ss0,
      |  max(CASE WHEN arm = 1 THEN n END) AS n1, max(CASE WHEN arm = 1 THEN s END) AS s1,
      |  max(CASE WHEN arm = 1 THEN ss END) AS ss1
      |  FROM m)
      |SELECT n0, n1,
      |  round(sqrt((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0) / (n0 - 1) / n0
      |           + (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1), 4) AS se_cents,
      |  round(2.8 * sqrt((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0) / (n0 - 1) / n0
      |                 + (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1), 4) AS mde_cents,
      |  abs(CAST(s0 AS DOUBLE) / n0 - CAST(s1 AS DOUBLE) / n1)
      |    >= 2.8 * sqrt((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0) / (n0 - 1) / n0
      |                + (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1) AS powered
      |FROM w""".stripMargin) { (s, d) =>
    val p = Tables.events(s, d).filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).cast("long").as("arm"),
        expr("cast(round(value * 100) as bigint)").as("y"))
    val m = p.groupBy(col("arm")).agg(count(lit(1)).as("n"),
      sum(col("y")).as("s"), sum(col("y") * col("y")).as("ss"))
    val w = m.agg(
      max(when(col("arm") === 0, col("n"))).as("n0"),
      max(when(col("arm") === 0, col("s"))).as("s0"),
      max(when(col("arm") === 0, col("ss"))).as("ss0"),
      max(when(col("arm") === 1, col("n"))).as("n1"),
      max(when(col("arm") === 1, col("s"))).as("s1"),
      max(when(col("arm") === 1, col("ss"))).as("ss1"))
    val var0 = (col("ss0").cast("double") - col("s0").cast("double") * col("s0") / col("n0")) /
      (col("n0") - 1) / col("n0")
    val var1 = (col("ss1").cast("double") - col("s1").cast("double") * col("s1") / col("n1")) /
      (col("n1") - 1) / col("n1")
    val se = sqrt(var0 + var1)
    val effect = abs(col("s0").cast("double") / col("n0") -
      col("s1").cast("double") / col("n1"))
    w.select(col("n0"), col("n1"),
      round(se, 4).as("se_cents"),
      round(lit(2.8) * se, 4).as("mde_cents"),
      (effect >= lit(2.8) * se).as("powered"))
  }

  /** Poisson-bootstrap confidence interval — the distribution-free
    * uncertainty estimate next to q143's Welch z and q176's MDE: the
    * 95% CI for each event type's mean value, from B = 64 bootstrap
    * replicates. Classic resampling draws n-of-n WITH replacement —
    * impossible to coordinate across a cluster; the production form
    * (the one web-scale A/B platforms ship) is the POISSON bootstrap:
    * each row independently enters replicate b with weight
    * w ~ Poisson(1), so a replicate is one weighted aggregate and
    * all B replicates ride ONE partial-aggregable shuffle of
    * (type, b) cells.
    *
    * Determinism/portability: w is drawn by inverse-CDF on the TOP
    * 20 bits of `mix64(event_id·64 + b)` (the q134 idiom — top bits,
    * never a signed modulo, so the HUGEINT replay matches bit-exactly)
    * against Poisson(1) CDF thresholds precomputed as shared integer
    * literals ⌊CDF·2^20⌋ (the q141/q152 convention; weights capped at
    * 5, P(w>5) ≈ 6e-4 ignored by both engines identically). Replicate
    * means are exact integer micros (`(10⁶·Σwy) div Σw` — positive
    * operands, so trunc and floor agree); the CI reads the 2nd and
    * 63rd of the 64 sorted replicate means (2.5%/97.5% nearest-rank).
    *
    * Scale shape: the ×64 replicate expansion is map-side (explode +
    * codegen'd mix64) feeding a partial aggregate — what crosses the
    * shuffle is 64·|types| cells, not rows; the rank window runs on
    * that ~320-row metadata relation. Σwy·10⁶ needs LONG headroom:
    * overflows past ~$90B of summed value per (type, replicate) —
    * widen to DECIMAL(38,0) (the q159 move) before that scale.
    */
  val q184BootstrapCi = QueryDef(
    "q184_bootstrap_ci",
    "Poisson-bootstrap 95% CI per event type: 64 deterministic mix64 replicates in one shuffle, integer-micro means",
    """WITH ev AS (SELECT event_type, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS y FROM events),
      |rep AS (SELECT event_type, y, b,
      |    CAST(event_id * 64 + b AS HUGEINT) AS z0
      |  FROM ev, (SELECT unnest(range(0, 64)) AS b)),
      |m1 AS (SELECT event_type, y, b,
      |    (xor(z0, z0 >> 30) * 2685821657736338717) % 18446744073709551616 AS z FROM rep),
      |m2 AS (SELECT event_type, y, b,
      |    (xor(z, z >> 27) * 1181783497276652981) % 18446744073709551616 AS z FROM m1),
      |u AS (SELECT event_type, y, b,
      |    xor(z, z >> 31) // 17592186044416 AS u20 FROM m2),
      |wts AS (SELECT event_type, y, b,
      |    CASE WHEN u20 < 385749 THEN 0 WHEN u20 < 771499 THEN 1
      |         WHEN u20 < 964373 THEN 2 WHEN u20 < 1028665 THEN 3
      |         WHEN u20 < 1044738 THEN 4 ELSE 5 END AS w
      |  FROM u),
      |cells AS (SELECT event_type, b, CAST(sum(w * y) AS BIGINT) AS s,
      |    CAST(sum(w) AS BIGINT) AS n
      |  FROM wts GROUP BY event_type, b),
      |means AS (SELECT event_type, b, (1000000 * s) // n AS m
      |  FROM cells WHERE n > 0),
      |r AS (SELECT event_type, b, m,
      |    row_number() OVER (PARTITION BY event_type ORDER BY m, b) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS cnt
      |  FROM means),
      |ci AS (SELECT event_type,
      |    CAST(min(CASE WHEN rn = CAST(floor(0.025 * cnt) AS BIGINT) + 1 THEN m END) AS BIGINT) AS lo_micro,
      |    CAST(min(CASE WHEN rn = CAST(ceil(0.975 * cnt) AS BIGINT) THEN m END) AS BIGINT) AS hi_micro
      |  FROM r GROUP BY event_type),
      |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |    CAST((1000000 * CAST(sum(y) AS BIGINT)) // count(*) AS BIGINT) AS mean_micro
      |  FROM ev GROUP BY event_type)
      |SELECT pt.event_type, pt.n_events, pt.mean_micro, ci.lo_micro, ci.hi_micro
      |FROM pt JOIN ci USING (event_type)
      |ORDER BY pt.event_type""".stripMargin) { (s, d) =>
    graft.plans.GraftFunctions.register(s)
    val ev = Tables.events(s, d).select(col("event_type"), col("event_id"),
      expr("cast(round(value * 100) as bigint)").as("y"))
    val rep = ev
      .select(col("event_type"), col("event_id"), col("y"),
        explode(sequence(lit(0L), lit(63L))).as("b"))
      .withColumn("u20", shiftrightunsigned(
        graft.plans.GraftFunctions.mix64(col("event_id") * 64L + col("b")), 44))
      .withColumn("w",
        when(col("u20") < 385749L, 0L).when(col("u20") < 771499L, 1L)
          .when(col("u20") < 964373L, 2L).when(col("u20") < 1028665L, 3L)
          .when(col("u20") < 1044738L, 4L).otherwise(5L))
    val cells = rep.groupBy(col("event_type"), col("b"))
      .agg(sum(col("w") * col("y")).as("s"), sum(col("w")).as("n"))
    val means = cells.filter(col("n") > 0)
      .select(col("event_type"), col("b"), expr("(1000000 * s) div n").as("m"))
    val wr = Window.partitionBy(col("event_type")).orderBy(col("m"), col("b"))
    val wc = Window.partitionBy(col("event_type"))
    val r = means
      .withColumn("rn", row_number().over(wr).cast("long"))
      .withColumn("cnt", count(lit(1)).over(wc))
    val ci = r.groupBy(col("event_type"))
      .agg(
        min(when(col("rn") ===
          floor(lit(0.025) * col("cnt")).cast("long") + 1, col("m")))
          .as("lo_micro"),
        min(when(col("rn") ===
          ceil(lit(0.975) * col("cnt")).cast("long"), col("m")))
          .as("hi_micro"))
    val pt = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("y")).as("sy"))
      .select(col("event_type"), col("n_events"),
        expr("(1000000 * sy) div n_events").as("mean_micro"))
    pt.join(ci, "event_type")
      .select(col("event_type"), col("n_events"), col("mean_micro"),
        col("lo_micro"), col("hi_micro"))
      .orderBy(col("event_type"))
  }

  /** Two-sided CUSUM changepoint monitor on the hourly event-rate
    * series — the sequential drift detector a pipeline dashboard runs
    * next to the distributional monitors (q138 KS, q153 PSI): those
    * compare two snapshots; CUSUM localizes WHEN a level shift
    * happened and accumulates evidence across hours, catching slow
    * drifts each individual hour hides. Fourth consumer of the
    * memoized [[hourlySeries]] spine (q162 ACF, q163 seasonal
    * anomaly, q165 forecast eval).
    *
    * The textbook recursion S⁺_t = max(0, S⁺_{t−1} + d_t − k) is
    * sequential; the scale shape uses its closed form
    * S⁺_t = C_t − min(0, min_{j≤t} C_j) with C the running sum of
    * (d − k) — two windows over the METADATA-sized hour spine (the
    * q138/q164 spine-window precedent), never over events. Deviations
    * are kept integer by multiplying through by the hour count:
    * d_t = H·x_t − S (Σd = 0 exactly), and the detector
    * self-calibrates from the series' own mean absolute deviation
    * A/H: allowance k = A/(2H) (half the typical hourly deviation —
    * the classic δ/2 rule) and threshold = 4·A/H, both floored
    * integers, so the whole orbit is engine-exact. Output is the
    * dashboard table: per hour, alarm levels in basis points of the
    * threshold plus the boolean alarms.
    *
    * Overflow: |d| ≤ H·max(x); the running sums stay under 2⁶³ to
    * ~10⁵ hours × 10¹² hourly events — beyond any real corpus (a
    * century is 8.8·10⁵ hours; widen to DECIMAL(38,0)/HUGEINT past
    * that, q159's documented divergence class).
    */
  val q189CusumChangepoint = QueryDef(
    "q189_cusum_changepoint",
    "two-sided CUSUM level-shift monitor on hourly counts: closed-form integer recursion, self-calibrated k and threshold",
    """WITH b AS (SELECT min(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS lo,
      |                  max(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hi FROM events),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
      |hc AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
      |              CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
      |hs AS (SELECT s.h, coalesce(hc.x, 0) AS x FROM spine s LEFT JOIN hc USING (h)),
      |t AS (SELECT CAST(sum(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS hn FROM hs),
      |d AS (SELECT h, x, hn * x - s AS dev FROM hs CROSS JOIN t),
      |a AS (SELECT CAST(sum(abs(dev)) AS BIGINT) AS aa FROM d),
      |kk AS (SELECT aa // (2 * hn) AS k, (4 * aa) // hn AS th FROM a CROSS JOIN t),
      |c AS (SELECT h, x, dev,
      |        CAST(sum(dev - k) OVER (ORDER BY h) AS BIGINT) AS cp,
      |        CAST(sum(dev + k) OVER (ORDER BY h) AS BIGINT) AS cn
      |      FROM d CROSS JOIN kk),
      |sf AS (SELECT h, x, dev,
      |        cp - least(CAST(0 AS BIGINT), min(cp) OVER (ORDER BY h)) AS sp,
      |        greatest(CAST(0 AS BIGINT), max(cn) OVER (ORDER BY h)) - cn AS sn
      |      FROM c)
      |SELECT h AS hour_start, x, dev,
      |  CASE WHEN th = 0 THEN NULL ELSE (10000 * sp) // th END AS up_bp,
      |  CASE WHEN th = 0 THEN NULL ELSE (10000 * sn) // th END AS dn_bp,
      |  CASE WHEN th = 0 THEN NULL ELSE sp > th END AS alarm_up,
      |  CASE WHEN th = 0 THEN NULL ELSE sn > th END AS alarm_dn
      |FROM sf CROSS JOIN kk
      |ORDER BY hour_start""".stripMargin) { (s, d) =>
    val hs = hourlySeries(s, d)
    val tot = hs.agg(sum(col("x")).as("s"), count(lit(1)).as("hn"))
    val dev = hs.crossJoin(broadcast(tot))
      .select(col("h"), col("x"), col("i"), col("hn"),
        (col("hn") * col("x") - col("s")).as("dev"))
    val cal = dev.agg(sum(abs(col("dev"))).as("aa"), first(col("hn")).as("hn"))
      .select(expr("aa div (2 * hn)").as("k"), expr("(4 * aa) div hn").as("th"))
    val w = Window.orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = dev.crossJoin(broadcast(cal))
      .withColumn("cp", sum(col("dev") - col("k")).over(w))
      .withColumn("cn", sum(col("dev") + col("k")).over(w))
    c.withColumn("sp", col("cp") - least(lit(0L), min(col("cp")).over(w)))
      .withColumn("sn", greatest(lit(0L), max(col("cn")).over(w)) - col("cn"))
      .select(col("h").as("hour_start"), col("x"), col("dev"),
        when(col("th") === 0, lit(null).cast("long"))
          .otherwise(expr("(10000 * sp) div th")).as("up_bp"),
        when(col("th") === 0, lit(null).cast("long"))
          .otherwise(expr("(10000 * sn) div th")).as("dn_bp"),
        when(col("th") === 0, lit(null).cast("boolean"))
          .otherwise(col("sp") > col("th")).as("alarm_up"),
        when(col("th") === 0, lit(null).cast("boolean"))
          .otherwise(col("sn") > col("th")).as("alarm_dn"))
      .orderBy(col("hour_start"))
  }

  /** Kaplan–Meier risk table for time-to-conversion — survival
    * analysis with RIGHT-CENSORING, the read behind "how long until a
    * viewer purchases" that naive conversion averages get wrong:
    * users who haven't converted YET aren't failures, they're
    * censored at the observation horizon, and dropping them biases
    * the curve optimistic. Per user: entry = first 'view', event =
    * first 'purchase' at-or-after it (else censored at the corpus'
    * last timestamp). Emitted at each whole-day event time: the
    * at-risk count, events, censorings, and the discrete hazard
    * d/n_risk in basis points — the exact-integer KM table (the
    * cumulative product Π(1−dᵢ/nᵢ) is a trailing float fold a
    * dashboard applies to this table; emitting the integer table
    * keeps the cross-engine contract hash-exact, the q137 rank-sum
    * convention).
    *
    * Scale shape: one (user) partial-aggregable entry aggregate, one
    * user-keyed join of the purchase subset, a second per-user
    * aggregate, then a day-keyed count shuffle onto the ≤ calendar
    * day spine; n_risk is a SUFFIX sum over that metadata spine
    * (q138's 256-bucket precedent) — nothing row-sized is windowed.
    * All integers: durations in whole days via µs div, hazard by
    * floor division on non-negative counts.
    */
  val q195SurvivalHazard = QueryDef(
    "q195_survival_hazard",
    "Kaplan-Meier risk table: view->purchase time-to-event with right-censoring, integer day spine",
    """WITH horizon AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) AS hz FROM events),
      |entry AS (
      |  SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS tv
      |  FROM events WHERE event_type = 'view' GROUP BY user_id),
      |conv AS (
      |  SELECT e.user_id, min(epoch_us(CAST(e.ts AS TIMESTAMP))) AS tp
      |  FROM events e JOIN entry n ON n.user_id = e.user_id
      |  WHERE e.event_type = 'purchase'
      |    AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= n.tv
      |  GROUP BY e.user_id),
      |subj AS (
      |  SELECT n.user_id,
      |    CASE WHEN c.tp IS NOT NULL THEN (c.tp - n.tv) // 86400000000
      |         ELSE (h.hz - n.tv) // 86400000000 END AS day,
      |    c.tp IS NOT NULL AS is_event
      |  FROM entry n LEFT JOIN conv c ON c.user_id = n.user_id
      |  CROSS JOIN horizon h),
      |byday AS (
      |  SELECT day,
      |    CAST(sum(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN is_event THEN 0 ELSE 1 END) AS BIGINT) AS cen
      |  FROM subj GROUP BY day),
      |risk AS (
      |  SELECT day, d, cen,
      |    CAST(sum(d + cen) OVER (ORDER BY day DESC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS n_risk
      |  FROM byday)
      |SELECT day, n_risk, d AS n_events, cen AS n_censored,
      |  (10000 * d) // n_risk AS hazard_bp
      |FROM risk
      |WHERE d > 0
      |ORDER BY day""".stripMargin) { (s, d) =>
    val us = unix_micros(col("ts"))
    val ev = Tables.events(s, d)
    val horizon = ev.agg(max(us).as("hz"))
    val entry = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(us).as("tv"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), us.as("tp0"))
      .join(entry, "user_id")
      .filter(col("tp0") >= col("tv"))
      .groupBy(col("user_id")).agg(min(col("tp0")).as("tp"))
    val subj = entry.join(conv, Seq("user_id"), "left_outer")
      .crossJoin(broadcast(horizon))
      .select(
        when(col("tp").isNotNull, expr("(tp - tv) div 86400000000"))
          .otherwise(expr("(hz - tv) div 86400000000")).as("day"),
        col("tp").isNotNull.as("is_event"))
    val byday = subj.groupBy(col("day"))
      .agg(sum(when(col("is_event"), 1L).otherwise(0L)).as("d"),
        sum(when(col("is_event"), 0L).otherwise(1L)).as("cen"))
    // suffix sum over the <=calendar-sized day spine
    val w = Window.orderBy(col("day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byday
      .withColumn("n_risk", sum(col("d") + col("cen")).over(w))
      .filter(col("d") > 0)
      .select(col("day"), col("n_risk"), col("d").as("n_events"),
        col("cen").as("n_censored"),
        expr("(10000 * d) div n_risk").as("hazard_bp"))
      .orderBy(col("day"))
  }

  /** Theil–Sen robust trend of monthly revenue — the median of all
    * pairwise slopes (y_j − y_i)/(j − i): unlike q135's least-squares
    * line (which one corrupted month drags arbitrarily far), the
    * Theil–Sen estimator has a 29% breakdown point, the standard
    * robust trend check a pipeline runs BEFORE trusting OLS on dirty
    * aggregates. Intercept is the companion median of y_i − slope·i.
    *
    * Exactness: monthly revenue is exact integer cents (the q141
    * per-row round idiom); each slope is one IEEE division of exact
    * integers — bit-equal across engines — and both medians are
    * ORDER-STATISTIC selections (lower median at row ⌊(m+1)/2⌋ by
    * (value, i, j)), so no floating aggregation exists anywhere.
    *
    * Scale shape: the corpus-sized work is ONE orders scan into an
    * 80-row monthly aggregate; the pairwise-slope relation is
    * CALENDAR²-bounded (80 months → 3160 pairs at ANY corpus size —
    * grows with the time span, never the data volume), so its
    * row_number selection windows are metadata operations, the q162
    * class. A per-row-data Theil–Sen would be O(n²) and is exactly
    * what this pre-aggregate-then-pair shape avoids.
    */
  val q201TheilSen = QueryDef(
    "q201_theil_sen",
    "Theil-Sen robust monthly-revenue trend: median pairwise slope + companion intercept over the calendar-bounded month series",
    """WITH m AS MATERIALIZED (
      |          -- MATERIALIZED: DuckDB 1.0 missorts a NULL date_trunc
      |          -- group key fed straight from the hash aggregate into
      |          -- ORDER BY (ignores NULLS LAST, nondeterministic)
      |          SELECT date_trunc('month', o_orderdate) AS mo,
      |            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |          FROM orders GROUP BY 1),
      |ser AS (SELECT mo, cents,
      |          CAST(row_number() OVER (ORDER BY mo NULLS LAST) AS BIGINT) AS i FROM m),
      |pairs AS (SELECT a.i AS i, b.i AS j,
      |            CAST(b.cents - a.cents AS DOUBLE) / (b.i - a.i) AS slope
      |          FROM ser a JOIN ser b ON b.i > a.i),
      |np AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
      |sl AS (SELECT slope FROM (
      |         SELECT slope, row_number() OVER (ORDER BY slope, i, j) AS rn FROM pairs)
      |       JOIN np ON true WHERE rn = (np.m + 1) // 2),
      |res AS (SELECT ser.i, ser.cents - sl.slope * ser.i AS r FROM ser CROSS JOIN sl),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ser),
      |ic AS (SELECT r FROM (SELECT r, row_number() OVER (ORDER BY r, i) AS rn FROM res)
      |       JOIN nn ON true WHERE rn = (nn.n + 1) // 2)
      |SELECT nn.n AS n_months, np.m AS n_pairs,
      |  round(sl.slope, 4) AS ts_slope_cents,
      |  round(ic.r, 4) AS ts_intercept_cents
      |FROM np CROSS JOIN nn CROSS JOIN sl CROSS JOIN ic""".stripMargin) { (s, d) =>
    val ser = Tables.load(s, d, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("mo"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
      // NULLS LAST pinned on both engines: a NULL month (null
      // o_orderdate feed) must take the same series index i in both
      // (SURVEY §5, fuzz class A)
      .withColumn("i",
        row_number().over(Window.orderBy(col("mo").asc_nulls_last))
          .cast("long"))
      .localCheckpoint() // 80-row metadata; consumed by pairs AND residuals
    // theta self-join of the 80-row month metadata: broadcast the
    // right side so the plan is a BroadcastNestedLoopJoin, never a
    // CartesianProduct (the suite-wide PlanSpec gate)
    val pairs = ser.alias("a").join(broadcast(ser.alias("b")), col("b.i") > col("a.i"))
      .select(col("a.i").as("i"), col("b.i").as("j"),
        ((col("b.cents") - col("a.cents")).cast("double") /
          (col("b.i") - col("a.i"))).as("slope"))
    val np = pairs.agg(count(lit(1)).as("m"))
    val sl = pairs
      .withColumn("rn", row_number().over(Window.orderBy(col("slope"), col("i"), col("j"))).cast("long"))
      .crossJoin(broadcast(np))
      .filter(col("rn") === expr("(m + 1) div 2"))
      .select(col("slope"))
    val res = ser.crossJoin(broadcast(sl))
      .select(col("i"), (col("cents") - col("slope") * col("i")).as("r"))
    val nn = ser.agg(count(lit(1)).as("n"))
    val ic = res
      .withColumn("rn", row_number().over(Window.orderBy(col("r"), col("i"))).cast("long"))
      .crossJoin(broadcast(nn))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("r"))
    np.crossJoin(broadcast(nn)).crossJoin(broadcast(sl)).crossJoin(broadcast(ic))
      .select(col("n").as("n_months"), col("m").as("n_pairs"),
        round(col("slope"), 4).as("ts_slope_cents"),
        round(col("r"), 4).as("ts_intercept_cents"))
  }

  /** QUANTILE NORMALIZATION across sources — the batch-effect
    * correction (microarray lineage, now standard in feature
    * pipelines): each document's length maps to the POOLED
    * distribution's value at its within-source quantile, so after
    * normalization every source has (up to rank granularity) the
    * identical length distribution — the transform that makes
    * per-source length features comparable when feeds have different
    * verbosity. q175's Q-Q deciles DIAGNOSE the drift; this applies
    * the fix, emitting the full exact mapping.
    *
    * Exact integer semantics: within-source rank r of (n_chars,
    * doc_id) maps to pooled order statistic at index
    * ⌈r·N/n_s⌉ = (r·N + n_s − 1) div n_s — pure integer arithmetic,
    * rank joins are equi joins, the whole mapping hash-gates.
    *
    * Scale shape: BOTH ranks ride [[graft.api.Ranking.withRank]]
    * (range repartition + K-row offset metadata — the per-source rank
    * would otherwise funnel one reducer per source, and the pooled
    * rank one reducer total); the index lookup is one equi join on
    * the computed rank. Nothing collects.
    */
  val q218QuantileNormalization = QueryDef(
    "q218_quantile_normalization",
    "cross-source quantile normalization of doc length: within-source rank -> pooled order statistic, exact integer mapping",
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |r AS (SELECT doc_id, source, n_chars,
      |        row_number() OVER (PARTITION BY source
      |                           ORDER BY n_chars NULLS LAST, doc_id) AS rn,
      |        count(*) OVER (PARTITION BY source) AS gn
      |      FROM d),
      |p AS (SELECT n_chars AS norm_chars,
      |        row_number() OVER (ORDER BY n_chars NULLS LAST, doc_id) AS p_rn
      |      FROM d),
      |g AS (SELECT count(*) AS nn FROM d)
      |SELECT r.doc_id, r.source, r.n_chars, CAST(r.rn AS BIGINT) AS src_rank,
      |  p.norm_chars
      |FROM r CROSS JOIN g
      |JOIN p ON p.p_rn = (r.rn * g.nn + r.gn - 1) // r.gn
      |ORDER BY r.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
    // NULLS LAST pinned on both engines: a doc with NULL n_chars must
    // take the same rank in both orders (SURVEY §5, fuzz class A)
    val ranked = graft.api.Ranking.withRank(docs, Seq("source"),
      Seq(col("n_chars").asc_nulls_last, col("doc_id")))
    val pooled = graft.api.Ranking.withRank(
        docs.select(col("doc_id").as("p_id"), col("n_chars").as("norm_chars")),
        Seq.empty, Seq(col("norm_chars").asc_nulls_last, col("p_id")),
        rankCol = "p_rn",
        totalCol = "p_n")
      .select(col("p_rn"), col("norm_chars"))
    val total = docs.agg(count(lit(1)).as("nn"))
    ranked.crossJoin(broadcast(total))
      .withColumn("tix", expr("(rn * nn + grp_n - 1) div grp_n"))
      .join(pooled, col("tix") === col("p_rn"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("rn").cast("long").as("src_rank"), col("norm_chars"))
      .orderBy(col("doc_id"))
  }

  /** SPLIT-CONFORMAL prediction intervals — the distribution-free
    * uncertainty wrapper modern ML serving puts around ANY point
    * predictor: fit on one half, take the ⌈0.9·(n+1)⌉-th smallest
    * absolute residual on the CALIBRATION half as the interval
    * half-width, and the marginal coverage guarantee P(|y−ŷ| ≤ q) ≥
    * 0.9 holds for free (exchangeability only — no distributional
    * assumption). The predictor here is the per-type floored mean of
    * even-id events; odd-id events measure realized coverage. q184's
    * bootstrap gives CI on a STATISTIC; this gives intervals on
    * PREDICTIONS — different reads.
    *
    * Exactness: cents = floor(value·100 + 0.5) (pure IEEE arithmetic,
    * identical both engines — never `round()`, whose decimal-tie
    * semantics differ); mean is integer division; the quantile is an
    * ORDER STATISTIC (rank k = ⌈9(n+1)/10⌉ clamped to n, picked by
    * (residual, event_id) total order); coverage in integer bp.
    *
    * Scale shape: one partial-aggregable per-type mean, residual rank
    * via the scale-safe grouped [[graft.api.Ranking.withRank]], one
    * broadcast-sized (|types| rows) quantile relation joined back,
    * one partial-aggregable coverage count. No global windows.
    */
  val q220ConformalIntervals = QueryDef(
    "q220_conformal_intervals",
    "split-conformal 90% prediction intervals per event type: calibration residual order statistic + held-out coverage bp",
    """WITH c AS (SELECT event_id, event_type,
      |            CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |          FROM events),
      |cal AS (SELECT * FROM c WHERE event_id % 2 = 0),
      |tst AS (SELECT * FROM c WHERE event_id % 2 = 1),
      |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
      |        CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents
      |      FROM cal GROUP BY event_type),
      |r AS (SELECT cal.event_type, cal.event_id,
      |        abs(cal.cents - m.mean_cents) AS resid, m.n_cal, m.mean_cents
      |      FROM cal JOIN m USING (event_type)),
      |rk AS (SELECT event_type, n_cal, mean_cents, resid,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY resid NULLS LAST, event_id) AS rn
      |       FROM r),
      |q AS (SELECT event_type, n_cal, mean_cents, resid AS q90_cents
      |      FROM rk WHERE rn = least((9 * (n_cal + 1) + 9) // 10, n_cal)),
      |cov AS (SELECT tst.event_type,
      |          CAST(count(*) AS BIGINT) AS n_test,
      |          CAST(count(*) FILTER (abs(tst.cents - q.mean_cents) <= q.q90_cents)
      |            AS BIGINT) AS covered
      |        FROM tst JOIN q USING (event_type)
      |        GROUP BY tst.event_type)
      |SELECT q.event_type, q.n_cal, q.mean_cents, q.q90_cents,
      |  cov.n_test, cov.covered,
      |  CAST((10000 * cov.covered) // cov.n_test AS BIGINT) AS coverage_bp
      |FROM q JOIN cov USING (event_type)
      |ORDER BY q.event_type""".stripMargin) { (s, d) =>
    val c = Tables.load(s, d, "events")
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val cal = c.filter(col("event_id") % 2 === 0)
    val tst = c.filter(col("event_id") % 2 === 1)
    val m = cal.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_cal"),
        expr("sum(cents) div count(1)").as("mean_cents"))
    val r = cal.join(m, "event_type")
      .select(col("event_type"), col("event_id"), col("n_cal"),
        col("mean_cents"), abs(col("cents") - col("mean_cents")).as("resid"))
    // NULLS LAST pinned on both engines: a NULL residual (null value)
    // must take the same calibration rank in both, so the order-
    // statistic pick agrees (SURVEY §5, fuzz class A)
    val q = graft.api.Ranking.withRank(r, Seq("event_type"),
        Seq(col("resid").asc_nulls_last, col("event_id")))
      .filter(col("rn") ===
        least(expr("(9 * (n_cal + 1) + 9) div 10"), col("n_cal")))
      .select(col("event_type"), col("n_cal"), col("mean_cents"),
        col("resid").as("q90_cents"))
    val cov = tst.join(q, "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs(col("cents") - col("mean_cents")) <= col("q90_cents"), 1L)
          .otherwise(0L)).as("covered"))
    q.join(cov, "event_type")
      .select(col("event_type"), col("n_cal"), col("mean_cents"),
        col("q90_cents"), col("n_test"), col("covered"),
        expr("(10000 * covered) div n_test").as("coverage_bp"))
      .orderBy(col("event_type"))
  }

  /** SEQUENTIAL hypothesis test (Wald's SPRT) — the always-monitoring
    * companion to q143's fixed-horizon z-test and q176's power
    * planning: a fixed-horizon test peeked at daily inflates false
    * positives, while the SPRT's likelihood-ratio boundaries
    * ln((1−β)/α) / ln(β/(1−α)) license a look after EVERY day with
    * exact error control — the experimentation-platform default.
    * Tests the treatment arm's purchase rate, H0 p=0.18 vs H1 p=0.22
    * at α=β=0.05; the decision is STICKY (a sequential test stops at
    * first crossing — later drift is never consulted).
    *
    * Exactness: the per-observation log-likelihood increments
    * ln(p1/p0), ln(q1/q0) are micro-floored constants of double
    * literals (identical both engines, the q121 1-ulp caveat), so
    * every day's cumulative LLR is s·c1 + f·c0 — exact integer
    * arithmetic; boundaries are the same micro-floored literals.
    *
    * Scale shape: one partial-aggregable per-day aggregate over the
    * treatment arm, then everything lives on the ≤31-row day spine
    * (metadata window, broadcast 1-row first-crossing relation —
    * left-joined on a constant key so a no-decision month stays
    * 'continue' instead of vanishing).
    */
  val q224Sprt = QueryDef(
    "q224_sprt",
    "Wald SPRT on the treatment arm's purchase rate: daily integer-micro LLR with sticky accept/reject at ln(19) bounds",
    """WITH b AS (SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
      |            CAST(event_type = 'purchase' AS INT) AS s
      |          FROM events WHERE user_id % 2 = 1),
      |day_ AS (SELECT d, CAST(count(*) AS BIGINT) AS n_d,
      |           CAST(sum(s) AS BIGINT) AS s_d FROM b GROUP BY d),
      |spine AS (SELECT CAST(unnest(range(0, 31)) AS BIGINT) AS d),
      |cum AS (SELECT spine.d,
      |          coalesce(n_d, 0) AS n_d, coalesce(s_d, 0) AS s_d,
      |          sum(coalesce(s_d, 0)) OVER w AS cs,
      |          sum(coalesce(n_d, 0)) OVER w AS cn
      |        FROM spine LEFT JOIN day_ ON day_.d = spine.d
      |        WINDOW w AS (ORDER BY spine.d
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |llr AS (SELECT d, n_d, s_d,
      |          CAST(cs * CAST(floor(1000000.0 * ln(22.0 / 18.0)) AS BIGINT) +
      |          (cn - cs) * CAST(floor(1000000.0 * ln(78.0 / 82.0)) AS BIGINT)
      |            AS BIGINT) AS llr_micro
      |        FROM cum),
      |fc AS (SELECT d AS fd, llr_micro AS fllr FROM llr
      |       WHERE llr_micro >= CAST(floor(1000000.0 * ln(19.0)) AS BIGINT)
      |          OR llr_micro <= CAST(floor(1000000.0 * ln(1.0 / 19.0)) AS BIGINT)
      |       ORDER BY d LIMIT 1)
      |SELECT l.d AS day, l.n_d AS trials, l.s_d AS successes, l.llr_micro,
      |  CASE WHEN fc.fd IS NULL OR l.d < fc.fd THEN 'continue'
      |       WHEN fc.fllr >= CAST(floor(1000000.0 * ln(19.0)) AS BIGINT)
      |       THEN 'accept_h1' ELSE 'reject_h0' END AS decision
      |FROM llr l LEFT JOIN fc ON true
      |ORDER BY day""".stripMargin) { (s, d) =>
    val c1 = floor(lit(1000000.0) * log(lit(22.0) / lit(18.0))).cast("long")
    val c0 = floor(lit(1000000.0) * log(lit(78.0) / lit(82.0))).cast("long")
    val bUp = floor(lit(1000000.0) * log(lit(19.0))).cast("long")
    val bLo = floor(lit(1000000.0) * log(lit(1.0) / lit(19.0))).cast("long")
    val b = Tables.load(s, d, "events")
      .filter(col("user_id") % 2 === 1)
      .select(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
        .cast("long").as("d"),
        (col("event_type") === "purchase").cast("int").as("s"))
    val day = b.groupBy(col("d"))
      .agg(count(lit(1)).as("n_d"), sum(col("s")).as("s_d"))
    val spine = s.range(0, 31).select(col("id").as("d"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val llr = spine.join(day, Seq("d"), "left_outer")
      .select(col("d"), coalesce(col("n_d"), lit(0L)).as("n_d"),
        coalesce(col("s_d"), lit(0L)).as("s_d"))
      .withColumn("cs", sum(col("s_d")).over(w))
      .withColumn("cn", sum(col("n_d")).over(w))
      .withColumn("llr_micro",
        col("cs") * c1 + (col("cn") - col("cs")) * c0)
      .withColumn("k", lit(1))
    val fc = llr.filter(col("llr_micro") >= bUp || col("llr_micro") <= bLo)
      .orderBy(col("d")).limit(1)
      .select(lit(1).as("k"), col("d").as("fd"), col("llr_micro").as("fllr"))
    llr.join(broadcast(fc), Seq("k"), "left_outer")
      .select(col("d").as("day"), col("n_d").as("trials"),
        col("s_d").as("successes"), col("llr_micro"),
        when(col("fd").isNull || col("d") < col("fd"), "continue")
          .when(col("fllr") >= bUp, "accept_h1")
          .otherwise("reject_h0").as("decision"))
      .orderBy(col("day"))
  }

  /** Wasserstein-1 (earth-mover) drift of each source's token-length
    * distribution against the corpus — the DISTANCE companion to
    * q138's KS statistic: KS reads the worst single CDF gap (sharp
    * but local), W1 integrates |F_source − F_corpus| over the value
    * axis, so a long mild tail shift — exactly what a contaminated or
    * re-crawled source looks like — registers even when no single
    * quantile moves much. On a discrete support W1 is EXACT INTEGER
    * arithmetic: Σᵢ |F_a(vᵢ) − F_b(vᵢ)|·(vᵢ₊₁ − vᵢ) with CDFs kept as
    * count cross-products (the q138 convention), so the micro-scaled
    * result hashes across engines.
    *
    * Scale shape: ONE corpus scan computes per-doc token counts; a
    * (source, len) partial-aggregable aggregate value-compresses it;
    * everything after lives on the |sources| × |distinct lens| grid —
    * metadata-sized (the support of a length distribution), never
    * corpus-sized. The per-source CDF windows partition by source;
    * products ride decimal(38,0) (cum·N ≤ 10¹⁶ × gap ≤ 10⁵ overflows
    * a long at corpus scale).
    */
  val q244LengthDrift = QueryDef(
    "q244_length_drift",
    "Wasserstein-1 token-length drift per source vs the corpus: integer CDF cross-products on the value-compressed length grid",
    """WITH tok AS (
      |  SELECT source,
      |         CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS BIGINT) AS n
      |  FROM documents WHERE source IS NOT NULL),
      |t AS (SELECT source, n FROM tok WHERE n > 0),
      |c AS (SELECT source, n, CAST(count(*) AS BIGINT) AS m FROM t GROUP BY source, n),
      |lens AS (SELECT DISTINCT n FROM c),
      |srcs AS (SELECT source, CAST(sum(m) AS BIGINT) AS ns FROM c GROUP BY source),
      |tot AS (SELECT CAST(sum(m) AS BIGINT) AS nn FROM c),
      |corp AS (SELECT n, CAST(sum(m) AS BIGINT) AS cm FROM c GROUP BY n),
      |grid AS (SELECT s.source, l.n, coalesce(cc.m, 0) AS m, corp.cm
      |         FROM srcs s CROSS JOIN lens l
      |         LEFT JOIN c cc ON cc.source = s.source AND cc.n = l.n
      |         JOIN corp ON corp.n = l.n),
      |cum AS (SELECT source, n,
      |          CAST(sum(m) OVER w AS BIGINT) AS cs,
      |          CAST(sum(cm) OVER w AS BIGINT) AS cc,
      |          lead(n) OVER w AS nxt
      |        FROM grid WINDOW w AS (PARTITION BY source ORDER BY n)),
      |term AS (SELECT cum.source,
      |           abs(CAST(cs AS HUGEINT) * tot.nn - CAST(cc AS HUGEINT) * srcs.ns)
      |             * (nxt - n) AS v
      |         FROM cum JOIN srcs ON srcs.source = cum.source CROSS JOIN tot
      |         WHERE nxt IS NOT NULL),
      |agg AS (SELECT source, sum(v) AS num FROM term GROUP BY source)
      |SELECT s.source, s.ns AS n_docs, tot.nn AS corpus_docs,
      |  CAST((1000000 * coalesce(a.num, 0)) //
      |       (CAST(s.ns AS HUGEINT) * tot.nn) AS BIGINT) AS w1_micro_tokens
      |FROM srcs s CROSS JOIN tot LEFT JOIN agg a ON a.source = s.source
      |ORDER BY s.source""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d)
      .filter(col("source").isNotNull)
      .select(col("source"),
        size(filter(split(col("text"), " "), x => length(x) > 0))
          .cast("long").as("n"))
      .filter(col("n") > 0)
    // value-compressed (source, len) support — persisted: feeds the
    // grid, the per-source totals, and the corpus marginal
    val c = graft.AutoUnpersist.scoped(
      t.groupBy(col("source"), col("n")).agg(count(lit(1)).as("m")))
    val lens = c.select(col("n")).distinct()
    val srcs = c.groupBy(col("source")).agg(sum(col("m")).as("ns"))
    val tot = c.agg(sum(col("m")).as("nn"))
    val corp = c.groupBy(col("n")).agg(sum(col("m")).as("cm"))
    val grid = srcs.select(col("source"), col("ns"))
      .crossJoin(broadcast(lens))
      .join(c.select(col("source"), col("n"), col("m")), Seq("source", "n"), "left")
      .join(broadcast(corp), Seq("n"))
      .select(col("source"), col("ns"), col("n"),
        coalesce(col("m"), lit(0L)).as("m"), col("cm"))
    val w = Window.partitionBy(col("source")).orderBy(col("n"))
    val cum = grid.select(col("source"), col("ns"), col("n"),
      sum(col("m")).over(w).as("cs"), sum(col("cm")).over(w).as("cc"),
      lead(col("n"), 1).over(w).as("nxt"))
    val term = cum.crossJoin(broadcast(tot))
      .filter(col("nxt").isNotNull)
      .select(col("source"), col("ns"), col("nn"),
        (abs(col("cs").cast("decimal(38,0)") * col("nn") -
          col("cc").cast("decimal(38,0)") * col("ns")) *
          (col("nxt") - col("n"))).as("v"))
    val agg = term.groupBy(col("source")).agg(sum(col("v")).as("num"))
    srcs.crossJoin(broadcast(tot))
      .join(agg, Seq("source"), "left_outer")
      .select(col("source"), col("ns").as("n_docs"),
        col("nn").as("corpus_docs"),
        expr("""cast((cast(1000000 as decimal(38,0)) *
                coalesce(num, cast(0 as decimal(38,0)))) div
                (cast(ns as decimal(38,0)) * nn) as bigint)""")
          .as("w1_micro_tokens"))
      .orderBy(col("source"))
  }

  /** Fixed hypothesis registry for q251: the metric set a readout
    * pipeline REGISTERS statically (m is a design constant, so the
    * Benjamini–Hochberg critical values are compile-time literals) —
    * 5 event types × 2 metrics = 10 two-sided tests at α = 0.05.
    */
  private val BhTypes = Seq("click", "error", "purchase", "signup", "view")

  /** z_{1−0.05·k/(2·10)} for BH rank k = 1..10 — Φ⁻¹ evaluated once
    * offline (bisection on erf, 6 dp) and shipped as the SAME literal
    * table to both engines (the q141/q152 no-runtime-transcendental
    * convention): p_(k) ≤ kα/m ⟺ |z|_(k) ≥ crit(k), so BH runs on
    * z-scores and no engine ever evaluates Φ or its inverse.
    */
  private val BhCrit: IndexedSeq[Double] = IndexedSeq(
    2.807034, 2.575829, 2.432379, 2.326348, 2.241403,
    2.17009, 2.108358, 2.053749, 2.004654, 1.959964)

  /** Multi-metric A/B readout with Benjamini–Hochberg FDR control —
    * the multiple-comparisons step q143 (one z-test) and q176 (power)
    * leave open: an experimentation readout tests MANY metrics at
    * once, and α per test inflates the family false-positive rate
    * (10 tests at α=.05 ⇒ ~40% chance of a spurious "win"). BH
    * (Benjamini–Hochberg 1995) sorts the m p-values ascending,
    * finds kmax = max{k : p_(k) ≤ kα/m}, and rejects ranks 1..kmax —
    * controlling the expected fraction of false discoveries at α.
    *
    * Exactness: the per-hypothesis z-scores are the q143/q176
    * fixed-shape double expressions over exact integer cell moments
    * (Welch z on value cents; two-sample Poisson z on event counts);
    * the BH comparison is against the [[BhCrit]] literal table, and
    * the rank-k rejection propagates by a SUFFIX-MAX over the
    * m-row relation (reject j ⟺ ∃ k ≥ j with |z|_(k) ≥ crit(k)).
    * Degenerate cells (missing type, n < 2, zero variance) carry
    * NULL z on BOTH engines (never ±Inf — DuckDB 1.0 returns NULL
    * for float division by zero where Spark returns Infinity, so the
    * guard is explicit) and rank last, never rejected.
    *
    * Scale shape: ONE partial-aggregable (type, arm) moment scan of
    * events; everything after lives on the m = 10-row registry
    * (broadcast literal), including the ranking window — metadata,
    * never data.
    */
  val q251FdrControl = QueryDef(
    "q251_fdr_control",
    "multi-metric A/B readout with Benjamini-Hochberg FDR control: literal z-critical table, suffix-max rejection, one moment scan",
    {
      val reg = BhTypes.map(t => s"('$t')").mkString(", ")
      val crit = BhCrit.zipWithIndex
        .map { case (c, i) => s"(${i + 1}, $c)" }.mkString(", ")
      s"""WITH reg(event_type) AS (VALUES $reg),
         |crit(k, z_crit) AS (VALUES $crit),
         |cell AS (
         |  SELECT event_type, CAST(user_id % 2 AS BIGINT) AS arm,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(count(CASE WHEN value IS NOT NULL THEN 1 END) AS BIGINT) AS ny,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sy,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ss
         |  FROM events GROUP BY 1, 2),
         |t AS (
         |  SELECT reg.event_type,
         |    coalesce(max(CASE WHEN arm = 0 THEN n END), 0) AS n0,
         |    coalesce(max(CASE WHEN arm = 0 THEN ny END), 0) AS ny0,
         |    max(CASE WHEN arm = 0 THEN sy END) AS sy0,
         |    max(CASE WHEN arm = 0 THEN ss END) AS ss0,
         |    coalesce(max(CASE WHEN arm = 1 THEN n END), 0) AS n1,
         |    coalesce(max(CASE WHEN arm = 1 THEN ny END), 0) AS ny1,
         |    max(CASE WHEN arm = 1 THEN sy END) AS sy1,
         |    max(CASE WHEN arm = 1 THEN ss END) AS ss1
         |  FROM reg LEFT JOIN cell USING (event_type) GROUP BY 1),
         |h AS (
         |  SELECT event_type, 'mean_cents' AS metric, ny0 AS n0, ny1 AS n1,
         |    CASE WHEN ny0 >= 2 AND ny1 >= 2 THEN
         |      CASE WHEN (CAST(ss0 AS DOUBLE) - CAST(sy0 AS DOUBLE) * sy0 / ny0) / (ny0 - 1) / ny0
         |             + (CAST(ss1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * sy1 / ny1) / (ny1 - 1) / ny1 > 0
         |      THEN (CAST(sy0 AS DOUBLE) / ny0 - CAST(sy1 AS DOUBLE) / ny1)
         |           / sqrt((CAST(ss0 AS DOUBLE) - CAST(sy0 AS DOUBLE) * sy0 / ny0) / (ny0 - 1) / ny0
         |                + (CAST(ss1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * sy1 / ny1) / (ny1 - 1) / ny1)
         |      END END AS z
         |  FROM t
         |  UNION ALL
         |  SELECT event_type, 'event_rate' AS metric, n0, n1,
         |    CASE WHEN n0 + n1 > 0
         |         THEN (CAST(n0 AS DOUBLE) - n1) / sqrt(CAST(n0 + n1 AS DOUBLE)) END AS z
         |  FROM t),
         |r AS (
         |  SELECT event_type, metric, n0, n1, z,
         |    row_number() OVER (ORDER BY coalesce(abs(z), -1) DESC, metric, event_type) AS k
         |  FROM h),
         |f AS (
         |  SELECT r.*, CASE WHEN abs(z) >= c.z_crit THEN 1 ELSE 0 END AS hit
         |  FROM r JOIN crit c USING (k))
         |SELECT event_type, metric, n0, n1, round(z, 4) AS z,
         |  CAST(k AS BIGINT) AS bh_rank,
         |  max(hit) OVER (ORDER BY k DESC
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
         |    AS rejected
         |FROM f
         |ORDER BY bh_rank""".stripMargin
    }) { (s, d) =>
    import s.implicits._
    val cents = expr("cast(round(value * 100) as bigint)")
    val cell = Tables.events(s, d)
      .select(col("event_type"), (col("user_id") % 2).cast("long").as("arm"),
        when(col("value").isNotNull, cents).as("y"))
      .groupBy(col("event_type"), col("arm"))
      .agg(count(lit(1)).as("n"), count(col("y")).as("ny"),
        sum(col("y")).as("sy"), sum(col("y") * col("y")).as("ss"))
    def side(a: Int, c: String, alias: String) =
      max(when(col("arm") === a, col(c))).as(alias)
    val t = broadcast(BhTypes.toDF("event_type"))
      .join(cell, Seq("event_type"), "left_outer")
      .groupBy(col("event_type"))
      .agg(coalesce(side(0, "n", "x0"), lit(0L)).as("n0"),
        coalesce(side(0, "ny", "x1"), lit(0L)).as("ny0"),
        side(0, "sy", "sy0"), side(0, "ss", "ss0"),
        coalesce(side(1, "n", "x2"), lit(0L)).as("n1"),
        coalesce(side(1, "ny", "x3"), lit(0L)).as("ny1"),
        side(1, "sy", "sy1"), side(1, "ss", "ss1"))
    def vr(ss: org.apache.spark.sql.Column, sy: org.apache.spark.sql.Column,
        ny: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (ss.cast("double") - sy.cast("double") * sy / ny) / (ny - 1) / ny
    val varSum = vr(col("ss0"), col("sy0"), col("ny0")) +
      vr(col("ss1"), col("sy1"), col("ny1"))
    val zMean =
      when(col("ny0") >= 2 && col("ny1") >= 2,
        // the variance-positivity guard keeps z NULL (both engines)
        // instead of Spark-Inf-vs-DuckDB-NULL on zero variance
        when(varSum > 0,
          (col("sy0").cast("double") / col("ny0") -
            col("sy1").cast("double") / col("ny1")) / sqrt(varSum)))
    val zRate =
      when(col("n0") + col("n1") > 0,
        (col("n0").cast("double") - col("n1")) /
          sqrt((col("n0") + col("n1")).cast("double")))
    // stack, never a self-union: a union of two projections of `t`
    // would evaluate the whole upstream (the events scan) twice
    val ranked = t
      .select(col("event_type"), zMean.as("zm"), zRate.as("zr"),
        col("ny0"), col("ny1"), col("n0"), col("n1"))
      .select(col("event_type"),
        expr("stack(2, 'mean_cents', ny0, ny1, zm," +
          " 'event_rate', n0, n1, zr) as (metric, n0, n1, z)"))
      .withColumn("k",
        row_number().over(Window.orderBy(
          coalesce(abs(col("z")), lit(-1.0)).desc,
          col("metric"), col("event_type"))).cast("long"))
    val crit = broadcast(
      BhCrit.zipWithIndex.map { case (c, i) => (i + 1L, c) }.toDF("k", "z_crit"))
    ranked.join(crit, "k")
      .withColumn("hit", when(abs(col("z")) >= col("z_crit"), 1).otherwise(0))
      .withColumn("rejected",
        max(col("hit")).over(Window.orderBy(col("k").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) === 1)
      .select(col("event_type"), col("metric"), col("n0"), col("n1"),
        round(col("z"), 4).as("z"), col("k").as("bh_rank"), col("rejected"))
      .orderBy(col("bh_rank"))
  }

  val all: Seq[QueryDef] =
    Seq(q136BloomFilter, q137RankSumAuc, q138KsDrift, q139SourceImpurity,
      q141BenfordAudit, q143AbTest, q145MadOutliers, q147Calibration,
      q148RevenueConcentration, q152NdcgEval, q153PsiDrift,
      q154WinsorizedStats, q159SpearmanActivity, q162Autocorrelation,
      q163SeasonalAnomaly, q165ForecastEval, q166ActiveUsers,
      q167DidUplift, q175QqDrift, q176AbPower, q184BootstrapCi,
      q189CusumChangepoint, q195SurvivalHazard, q201TheilSen,
      q218QuantileNormalization, q220ConformalIntervals, q224Sprt,
      q244LengthDrift, q251FdrControl)
}
