package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions

/** Pins the Misra–Gries `freq_topk` aggregate in the regime the
  * DuckDB oracle cannot reach: capacity SMALLER than the number of
  * distinct keys, where the sketch's undercount bound
  * (`true - est ≤ N/(capacity+1)`) and heavy-hitter survival are the
  * contract, plus merge invariance across partition layouts (the
  * property that makes the partial-aggregate plan correct at any
  * cluster size).
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  /** Zipf-ish stream: key_i appears ~N/i times for i in 1..40 —
    * 2740 rows, 40 distinct keys, top key has 548 copies.
    */
  private lazy val skewed: Seq[String] = {
    val n = 548
    (1 to 40).flatMap(i => Seq.fill(n / i)(f"k$i%02d"))
  }

  private def topkDF(data: Seq[String], k: Int, cap: Int, parts: Int) = {
    GraftFunctions.register(spark)
    data.toDF("word").repartition(parts)
      .agg(GraftFunctions.freqTopk(col("word"), k, cap).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("e.word").as("word"), col("e.cnt").as("cnt"))
  }

  test("freq_topk is exact when capacity covers the distinct keys") {
    val got = topkDF(skewed, 10, 1024, 7).as[(String, Long)].collect().toSeq
    val want = skewed.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(10)
    assert(got == want, s"exact regime must equal true counts: $got vs $want")
  }

  test("freq_topk undercounts by at most N/(cap+1) and keeps true heavy hitters") {
    val cap = 8
    val n = skewed.size.toLong
    val truth = skewed.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = topkDF(skewed, cap, cap, 7).as[(String, Long)].collect().toMap
    val bound = n / (cap + 1) // 304
    est.foreach { case (w, c) =>
      val t = truth(w)
      assert(c <= t, s"$w: Misra-Gries must never overcount ($c > $t)")
      assert(t - c <= bound, s"$w: undercount ${t - c} exceeds N/(cap+1)=$bound")
    }
    // every key with true frequency > N/(cap+1) must survive the sketch
    val mustSurvive = truth.filter(_._2 > bound).keySet
    assert(mustSurvive.subsetOf(est.keySet),
      s"heavy hitters lost: ${mustSurvive -- est.keySet}")
  }

  test("freq_topk output is invariant to the partition layout") {
    val a = topkDF(skewed, 10, 1024, 1).as[(String, Long)].collect().toSeq
    val b = topkDF(skewed, 10, 1024, 32).as[(String, Long)].collect().toSeq
    assert(a == b, "merge must be layout-independent in the exact regime")
  }

  test("freq_topk plans as partial ObjectHashAggregate before the exchange") {
    GraftFunctions.register(spark)
    val plan = skewed.toDF("word").repartition(4)
      .agg(GraftFunctions.freqTopk(col("word"), 5, 64))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate partial/final pair, got:\n$plan")
  }

  test("count-min estimates never undercount and bound the overcount") {
    // the CMS invariant pair on the real corpus: est >= exact always
    // (min over rows that each counted every occurrence), and for the
    // top tokens the overcount stays within the d-row union bound
    // (4 * N / w is already loose at this vocab/width ratio)
    val rows = Registry.byName("q107_countmin").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0).count()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("cms_est")
      assert(est >= exact, s"CMS undercounted ${r.getAs[String]("word")}")
      assert(est - exact <= 4L * n / 1024L + 1,
        s"overcount ${est - exact} beyond the 4N/w bound for ${r.getAs[String]("word")}")
    }
  }

  test("count-min counter build plans a partial aggregate before the exchange") {
    // the constant-size-exchange claim: the (j, bkt) groupBy must
    // partial-aggregate map-side so at most d*w counter rows per
    // partition cross the shuffle
    val plan = Registry.byName("q107_countmin").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    val partials = "HashAggregate\\(keys=\\[j[^\\]]*bkt".r
      .findAllIn(plan).length
    assert(partials >= 2,
      s"expected partial+final HashAggregate pair on (j, bkt), got:\n$plan")
  }

  test("q113 outlier set equals an independent exact-rational z-score sweep") {
    // Independent reimplementation: per-type moments in BigInt, the
    // 3-sigma test via exact integer comparison of squared deviations
    // — no shared code with the query's decimal(38,0) column arithmetic.
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigInt(math.floor(r.getDouble(2) * 100).toLong)))
    val expected = ev.groupBy(_._2).flatMap { case (_, rows) =>
      val n = BigInt(rows.length)
      if (n <= 1) Seq.empty[Long]
      else {
        val s = rows.map(_._3).sum
        val q = rows.map(x => x._3 * x._3).sum
        // |v - S/n| > 3*sqrt((nQ - S^2)/(n(n-1))), squared and cleared
        // of denominators with exact integers
        rows.collect { case (id, _, v)
          if (n * v - s).pow(2) * (n - 1) > 9 * n * (n * q - s * s) => id }
          .toSeq
      }
    }.toSet
    val got = Registry.byName("q113_outliers").fn(spark, sfDir)
      .select(col("event_id")).as[Long].collect().toSet
    assert(got == expected,
      s"outlier sets differ: extra=${got -- expected} missing=${expected -- got}")
    assert(got.nonEmpty, "degenerate fixture: no outliers at sf0.001")
  }

  test("freq_topk is SQL-callable and ignores null keys") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT freq_topk(w, 3, 16) AS tk FROM VALUES
        |  ('a'), ('a'), ('b'), (CAST(NULL AS STRING)), ('a'), ('b'), ('c')
        |AS t(w)""".stripMargin)
      .select(explode(col("tk")).as("e"))
      .select(col("e.word"), col("e.cnt")).as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("HLL sketches are mergeable: union of per-shard sketches equals the direct global sketch") {
    // THE 100 TB sketch contract: per-partition/per-day/per-source
    // sketches unioned later must answer exactly what one monolithic
    // pass would — HLL registers are max-merged, so shard-then-union
    // is bit-equivalent to direct aggregation, not merely close.
    // Spark 4's Datasketches surface: hll_sketch_agg / hll_union_agg
    // / hll_sketch_estimate.
    val ev = Tables.events(spark, sfDir)
    ev.createOrReplaceTempView("hll_events")
    val direct = spark.sql(
      "SELECT hll_sketch_estimate(hll_sketch_agg(user_id)) AS est FROM hll_events")
      .head().getLong(0)
    val sharded = spark.sql(
      """SELECT hll_sketch_estimate(hll_union_agg(sk)) AS est FROM (
        |  SELECT hll_sketch_agg(user_id) AS sk
        |  FROM hll_events GROUP BY event_type)""".stripMargin)
      .head().getLong(0)
    assert(sharded == direct,
      s"shard-then-union ($sharded) must equal direct sketching ($direct)")
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(direct - exact).toDouble / exact <= 0.05,
      s"HLL estimate $direct vs exact $exact beyond 5%")
    spark.catalog.dropTempView("hll_events")
  }

  test("percentile_approx honors the GK rank-error bound against the exact CDF") {
    // Spark's built-in quantile sketch (Greenwald–Khanna) guarantees
    // rank error <= n/accuracy; gate it per event type against exact
    // ranks so the engine's approximate-quantile path has a pinned
    // contract next to the exact CDF machinery (api.Quantiles)
    val acc = 100
    val approx = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("y"))
      .groupBy(col("event_type"))
      .agg(expr(s"percentile_approx(y, array(0.25, 0.5, 0.75), $acc)")
        .as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    val exact = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

    approx.foreach { case (ty, qs) =>
      val ys = exact(ty)
      val n = ys.length
      qs.zip(Seq(0.25, 0.5, 0.75)).foreach { case (est, p) =>
        val rankLo = ys.count(_ < est)
        val rankHi = ys.count(_ <= est)
        val target = p * n
        // est's feasible rank interval must come within n/acc of target
        val dist =
          if (target < rankLo) rankLo - target
          else if (target > rankHi) target - rankHi
          else 0.0
        assert(dist <= n.toDouble / acc + 1,
          s"$ty p$p: est $est rank [$rankLo,$rankHi] vs target $target (n=$n)")
      }
    }
  }

  test("gram_sums moments are exact on a hand-computed fixture") {
    GraftFunctions.register(spark)
    // rows (0.1, 0.2) and (0.3, -0.1) quantize to (1000, 2000),
    // (3000*0.9999...→2999 or 3000? floor(0.3*10000)=2999 in binary
    // float) — compute expectations from the same quantization rule
    val rows = Seq(Array(0.1f, 0.2f), Array(0.3f, -0.1f))
    val q = rows.map(_.map(x => math.floor(x.toDouble * 10000).toLong))
    val flat = rows.toDF("v")
      .agg(GraftFunctions.gramSums(col("v")))
      .head.getSeq[Long](0)
    assert(flat(0) == 2L && flat(1) == 2L, "d then n")
    assert(flat(2) == q.map(_(0)).sum && flat(3) == q.map(_(1)).sum)
    val g00 = q.map(r => r(0) * r(0)).sum
    val g01 = q.map(r => r(0) * r(1)).sum
    val g11 = q.map(r => r(1) * r(1)).sum
    assert(flat.drop(4) == Seq(g00, g01, g11),
      s"upper-triangle gram, got ${flat.drop(4)}")
  }

  test("gram_sums is invariant to the partition layout") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir).select(col("embedding"))
    def flat(parts: Int): Seq[Long] =
      e.repartition(parts).agg(GraftFunctions.gramSums(col("embedding")))
        .head.getSeq[Long](0)
    assert(flat(1) == flat(7), "merge must be layout-independent")
  }

  test("gram_sums raises on mixed dimensions (strict-dim contract)") {
    GraftFunctions.register(spark)
    val bad = Seq(Array(0.1f, 0.2f), Array(0.3f)).toDF("v")
      .agg(GraftFunctions.gramSums(col("v")))
    val e = intercept[Exception](bad.head)
    assert(e.getMessage != null)
  }

  test("q188 plans gram_sums as one partial ObjectHashAggregate — no row-sized exchange") {
    GraftFunctions.register(spark)
    val plan = Tables.embeddings(spark, sfDir)
      .agg(GraftFunctions.gramSums(col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate partial/final pair, got:\n$plan")
    assert(!plan.contains("posexplode") && !plan.contains("SortMergeJoin"),
      s"gram must be one-pass — no explode/self-join shape:\n$plan")
  }

  test("q188 integer power iteration converges to the double-precision top eigenvector") {
    // independent double-precision reference: covariance of the SAME
    // quantized matrix, 3000 plain power-iteration steps (gap^3000 is
    // ~0 at any λ2/λ1 ≤ 0.999 — and a tie would fail the assert, not
    // mask it)
    val rows = Registry.byName("q188_power_iteration").fn(spark, sfDir)
      .orderBy(col("dim")).collect()
    assert(rows.length == 64)
    val got = rows.map(_.getAs[Long]("loading_q5").toDouble)
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 10000)).toArray)
    val d = emb.head.length
    val n = emb.length.toDouble
    val s = Array.tabulate(d)(i => emb.map(_(i)).sum)
    val m = Array.tabulate(d, d) { (i, j) =>
      n * emb.map(r => r(i) * r(j)).sum - s(i) * s(j)
    }
    var v = Array.fill(d)(1.0)
    (1 to 3000).foreach { _ =>
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => m(i)(j) * v(j)).sum)
      val mx = w.map(math.abs).max
      v = w.map(_ / mx)
    }
    val dot = got.zip(v).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) /
      (math.sqrt(got.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    assert(cos >= 0.999, s"cosine vs converged reference: $cos")
    val share = rows.head.getAs[Long]("var_share_bp")
    assert(share > 0 && share < 10000, s"var share $share out of range")
    assert(rows.forall(_.getAs[Long]("var_share_bp") == share))
  }
}
