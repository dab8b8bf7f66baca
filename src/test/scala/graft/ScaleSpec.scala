package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scale-technique gates: bucketing co-locates joins (no exchange on
  * the join path), writing partitioned data enables partition pruning
  * at the scan, and salted joins change the shuffle shape without
  * changing results. These are the 100 TB levers (SURVEY.md
  * "Partitioning & shuffle") exercised on real written data, not just
  * claimed in prose.
  */
class ScaleSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    val executed = df.queryExecution.executedPlan
    val plan = executed match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: ShuffleExchangeExec => s }.size
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = "bucket_li"
    val wh2 = "bucket_ord"
    Seq(wh, wh2).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a crashed previous run can leave the managed location behind
      // with no catalog entry — remove it or saveAsTable refuses
      val loc = java.nio.file.Paths.get("target/spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(wh)
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(wh2)
    // force sort-merge (tiny test tables would broadcast otherwise,
    // which shows 0 shuffles for the wrong reason on both sides)
    val joined = spark.table(wh).hint("merge").join(spark.table(wh2),
      col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() > 0)
    assert(shuffles(joined) == 0,
      s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
    // same sort-merge join on the raw (unbucketed) parquet must
    // shuffle — the bucketing is what removed the exchanges
    val raw = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_quantity"))
      .hint("merge")
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_totalprice")),
        col("l_orderkey") === col("o_orderkey"))
    raw.count()
    assert(shuffles(raw) > 0, "control join should shuffle")
  }

  test("date-partitioned writes enable partition pruning at the scan") {
    val path = "target/scale-spec/events_by_day"
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(path)
    val pruned = spark.read.parquet(path).filter(col("day") === "2024-01-05")
    pruned.count()
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("day"),
      s"no partition filter at the scan: $scan")
    // pruning must actually reduce input: count partitions read vs total
    val nDays = ev.select("day").distinct().count()
    assert(nDays > 5, "events must span multiple days for this test")
  }

  test("AQE splits skewed join partitions (OptimizeSkewedJoin)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // tiny thresholds so the 3-value l_returnflag key counts as skewed
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      import spark.implicits._
      val dim = Seq(("A", 0.1), ("N", 0.05), ("R", 0.25)).toDF("flag", "penalty")
      // repartition first: skew splitting works at map-output block
      // granularity, so the skewed side needs many map tasks (a single
      // parquet file = one mapper = unsplittable skew)
      val joined = Tables.lineitem(spark, sfDir)
        .repartition(16, col("l_orderkey"))
        .join(dim.hint("merge"), col("l_returnflag") === col("flag"))
      // materialize THIS DataFrame's own query execution — count()
      // and foreach() each build a different QueryExecution, leaving
      // this plan unexecuted (isFinalPlan=false); collect() drives it
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salted join equals the plain join and spreads the skew key") {
    val salted = Registry.byName("q51_salted_join").fn(spark, sfDir)
    import spark.implicits._
    val dim = Seq(("A", 0.10), ("N", 0.05), ("R", 0.25)).toDF("flag", "penalty")
    val plain = Tables.lineitem(spark, sfDir)
      .join(dim, col("l_returnflag") === col("flag"))
      .groupBy(col("flag"))
      // per-row integer cents, matching q51's round-17 convention —
      // the whole point: the salted and plain joins agree EXACTLY,
      // not merely to ulp-drifting rounded doubles
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).cast("double") / 100.0).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("flag"))
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("q37 hot-label guard: salted block join exact + per-task work bounded") {
    import spark.implicits._
    import graft.queries.DedupQueries
    val rnd = new scala.util.Random(5)
    // skewed fixture: one hot label with 400 rows (3× the 128 cap) +
    // two cold labels — the adversarial shape for label blocking
    val rows = (0L until 400L).map(i => (i, "hot", Array.fill(8)(rnd.nextGaussian().toFloat))) ++
      (400L until 430L).map(i => (i, "cold1", Array.fill(8)(rnd.nextGaussian().toFloat))) ++
      (430L until 440L).map(i => (i, "cold2", Array.fill(8)(rnd.nextGaussian().toFloat)))
    val e = rows.toDF("vec_id", "label", "embedding")
    val salted = DedupQueries.saltedLabelPairs(e, maxBlock = 128L)
      .select($"vec_a", $"vec_b")
    val plain = e.alias("a").join(e.alias("b"),
        $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"))
    // exact: same pair set, each pair exactly once
    assert(salted.exceptAll(plain).count() == 0 &&
      plain.exceptAll(salted).count() == 0,
      "salted block join disagrees with the plain blocked join")
    assert(salted.count() == plain.count(), "pair multiplicity differs")
    // bounded: no (label, salt) bucket exceeds ~cap rows, so no join
    // cell ever does more than O(cap²) work regardless of block size
    val counts = e.groupBy($"label").agg(count(lit(1)).as("n"))
    val maxBucket = e.join(counts, "label")
      .withColumn("s", ceil($"n" / 128.0).cast("int"))
      .withColumn("salt", pmod(xxhash64($"vec_id"), $"s"))
      .groupBy($"label", $"salt").count()
      .agg(max("count")).head().getLong(0)
    assert(maxBucket <= 2 * 128,
      s"a salt bucket still holds $maxBucket rows — guard not bounding work")
  }

  test("Ranking.withRank spreads a hot group across many tasks (no one-reducer group)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one group holds 99% of rows — the case where
    // row_number() OVER (PARTITION BY k) funnels everything through a
    // single task. The range partitioner keys on (group, order), so
    // the hot group must span many partitions while ranks stay exact.
    // AQE rightly coalesces this KB-sized test shuffle into a few
    // partitions, which would mask the property under test (the
    // partitioner's key layout) — and the cached range-partitioned
    // relation materializes on the FIRST action, so AQE must be off
    // for the whole test, not just the probe
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = spark.conf.getOption(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
    val df = spark.range(0, 20000)
      .select(when($"id" < 19800, "hot").otherwise(concat(lit("g"), $"id" % 7))
        .as("k"), $"id".as("v"))
    val ranked = api.Ranking.withRank(df, Seq("k"), Seq(col("v")))
    // correctness: dense 1..n per group
    val stats = ranked.groupBy($"k")
      .agg(min($"rn").as("lo"), max($"rn").as("hi"), count(lit(1)).as("n"),
        countDistinct($"rn").as("d"))
      .collect()
    stats.foreach { r =>
      assert(r.getLong(1) == 1L && r.getLong(2) == r.getLong(3) &&
        r.getLong(3) == r.getLong(4), s"non-dense ranks: $r")
    }
    // scale: the hot group's rows occupy many shuffle partitions
    val np = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val hotParts = api.Ranking.withRank(
        df, Seq("k"), Seq(col("v")), rankCol = "rn2", totalCol = "gn2")
      .filter($"k" === "hot")
      .select(org.apache.spark.sql.functions.spark_partition_id())
      .distinct().count()
    assert(hotParts > np / 2,
      s"hot group landed on only $hotParts of $np partitions — one-reducer regression")
    } finally prevAqe match {
      case Some(v) => spark.conf.set(aqeKey, v)
      case None => spark.conf.unset(aqeKey)
    }
  }

  test("dynamic partition overwrite rewrites only the touched partitions") {
    // the incremental-rerun idiom: re-processing one day of a 100 TB
    // date-partitioned sink must replace exactly that day, not
    // truncate the table (static overwrite's behavior)
    import spark.implicits._
    val path = "target/scale-spec/dyn_overwrite"
    val orig = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq(("2024-01-01", 1L, 10.0), ("2024-01-02", 2L, 20.0),
        ("2024-01-03", 3L, 30.0))
        .toDF("day", "id", "v")
        .write.mode("overwrite").partitionBy("day").parquet(path)
      // re-run day 2 only, with corrected values
      Seq(("2024-01-02", 2L, 99.0)).toDF("day", "id", "v")
        .write.mode("overwrite").partitionBy("day").parquet(path)
      val got = spark.read.parquet(path)
        .select($"day", $"v").as[(String, Double)].collect().toSet
      assert(got == Set(("2024-01-01", 10.0), ("2024-01-02", 99.0),
        ("2024-01-03", 30.0)),
        s"dynamic overwrite touched the wrong partitions: $got")
    } finally {
      orig match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // the remaining big-join lever: a selective filter on one join side
    // injects a bloom-filter semi-join test into the OTHER side's scan,
    // so at 100 TB the fact table drops non-joining rows before the
    // exchange instead of shuffling them. Thresholds are sized for the
    // test corpus (defaults assume ≥10 MB creation side / ≥10 GB scan).
    val conf = spark.conf
    val keep = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // InjectRuntimeFilter only fires on probable SHUFFLE joins — at test
      // scale the filtered dim is broadcastable by size, which at 100 TB it
      // would not be. Model the big-data regime by disabling auto-broadcast.
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"))
      // shuffle join on purpose (bloom filters target non-broadcast joins)
      val joined = li.hint("merge").join(orders, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") || optimized.contains("bloom_filter"),
        s"runtime bloom filter should be injected:\n$optimized")
      // and the filtered plan still returns exactly the join's rows
      val expect = li.join(orders, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally keep.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
