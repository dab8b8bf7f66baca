package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global and per-group total ordering.
  *
  * `row_number() OVER (ORDER BY ...)` (or partitioned by a column with
  * only a handful of distinct values, like `source`) funnels the whole
  * table through one reducer task per partition value — the classic
  * window scale-killer. This helper builds the same dense 1-based rank
  * in two fully-partitioned passes instead:
  *
  *  1. range-repartition on (group, order) keys — every shuffle
  *     partition holds a contiguous key range, all K tasks busy;
  *  2. count rows per (partition, group) — a partial+final aggregate
  *     yielding at most K + G metadata rows — and turn the counts into
  *     per-(partition, group) rank offsets and per-group totals with a
  *     window over that METADATA relation (K·G rows, not the table);
  *  3. rank = within-partition `row_number` (partitioned by
  *     (__pid, group) — all K tasks busy) + the joined-in offset.
  *
  * Unlike the q15 inline form this collects nothing on the driver: the
  * offsets stay a DataFrame joined back in (AQE broadcasts it when the
  * K·G rows fit, falls back to a keyed shuffle join when a
  * high-cardinality group column makes them large), so the whole thing
  * is ONE lazy plan. The range-partitioned input is cached via
  * [[graft.AutoUnpersist]] so both the count branch and the rank
  * branch see identical partition boundaries within the single action
  * that materializes the result, and the cache releases itself when
  * that action completes.
  *
  * `orderCols` must be a TOTAL order (include a unique tie-breaker):
  * ties within a range partition would otherwise rank
  * nondeterministically — same contract as any deterministic use of
  * `row_number`.
  */
object Ranking {

  /** Adds `rankCol` (1-based dense BIGINT rank within each group by
    * `orderCols`) and `totalCol` (BIGINT group row count) to `df`.
    * Empty `groupCols` ranks globally (one group).
    */
  def withRank(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      rankCol: String = "rn",
      totalCol: String = "grp_n"): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(!df.columns.contains(rankCol) && !df.columns.contains(totalCol),
      s"input already has a '$rankCol' or '$totalCol' column")
    require(!df.columns.contains("__pid"),
      "input already has a '__pid' column")
    require(!df.columns.contains("__off"),
      "input already has a '__off' column")
    val parts = graft.AutoUnpersist.scoped(
      df.repartitionByRange((groupCols.map(col) ++ orderCols): _*)
        .withColumn("__pid", spark_partition_id()))
    val counts = parts.groupBy(("__pid" +: groupCols).map(col): _*).count()
    // offsets + totals over the metadata relation (≤ K + G rows): the
    // unpartitioned window when groupCols is empty is deliberate — it
    // runs on K rows of counts, never on the input table
    val wg =
      if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(groupCols.map(col): _*)
    val offs = counts
      .withColumn("__off",
        coalesce(sum(col("count")).over(wg.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(totalCol, sum(col("count")).over(wg))
      .drop("count")
    val ww = Window.partitionBy(("__pid" +: groupCols).map(col): _*)
      .orderBy(orderCols: _*)
    // The offsets relation is K·G rows. For the intended low-G use it
    // broadcasts; a pathological high-cardinality group column would
    // overflow a FORCED broadcast, so no hint is given — AQE sees the
    // materialized size at runtime and picks broadcast when it fits,
    // shuffle-hash otherwise (both keyed on (__pid, group), both
    // correct). Join is NULL-SAFE (<=>) on the group columns so rows
    // with a NULL group key rank as their own group, exactly like the
    // row_number() window form this equals (RankingSpec pins it).
    val o = offs.select(
      (col("__pid").as("__opid") +:
        groupCols.map(c => col(c).as(s"__og_$c")) :+
        col("__off") :+ col(totalCol)): _*)
    val cond = ((col("__pid") === col("__opid")) +:
      groupCols.map(c => col(c) <=> col(s"__og_$c"))).reduce(_ && _)
    parts.join(o, cond)
      .withColumn(rankCol, row_number().over(ww).cast("long") + col("__off"))
      .drop("__pid" +: "__opid" +: "__off" +: groupCols.map(c => s"__og_$c"): _*)
  }

  /** Adds `cumCol` (inclusive running BIGINT sum of `weightCol` within
    * each group by `orderCols`) and `totalCol` (BIGINT group weight
    * total) to `df` — the weighted generalization of [[withRank]]
    * (rank = running total of weight 1), with the same scale shape:
    * range repartition, per-(partition, group) weight sums as a
    * METADATA relation, exclusive offsets + group totals via a window
    * over that metadata, then a within-partition running sum plus the
    * joined-in offset. Never a `partitionBy(low-cardinality
    * group).orderBy` window over the data itself — the cumulative-sum
    * scale-killer this exists to replace (q145's per-type CDF over a
    * value-compressed relation that grows with the corpus).
    *
    * `orderCols` must be a total order WITHIN each group (e.g. the
    * key of a `groupBy(group, value).count()` compressed relation):
    * tied order keys would make the within-partition running sum
    * nondeterministic, same contract as [[withRank]].
    */
  def withRunningTotal(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      weightCol: String,
      cumCol: String = "cum",
      totalCol: String = "grp_n"): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(!df.columns.contains(cumCol) && !df.columns.contains(totalCol),
      s"input already has a '$cumCol' or '$totalCol' column")
    require(!df.columns.contains("__pid") && !df.columns.contains("__off"),
      "input already has a '__pid' or '__off' column")
    val parts = graft.AutoUnpersist.scoped(
      df.repartitionByRange((groupCols.map(col) ++ orderCols): _*)
        .withColumn("__pid", spark_partition_id()))
    val counts = parts.groupBy(("__pid" +: groupCols).map(col): _*)
      .agg(sum(col(weightCol)).as("__w"))
    val wg =
      if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(groupCols.map(col): _*)
    val offs = counts
      .withColumn("__off",
        coalesce(sum(col("__w")).over(wg.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(totalCol, sum(col("__w")).over(wg))
      .drop("__w")
    val ww = Window.partitionBy(("__pid" +: groupCols).map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val o = offs.select(
      (col("__pid").as("__opid") +:
        groupCols.map(c => col(c).as(s"__og_$c")) :+
        col("__off") :+ col(totalCol)): _*)
    val cond = ((col("__pid") === col("__opid")) +:
      groupCols.map(c => col(c) <=> col(s"__og_$c"))).reduce(_ && _)
    parts.join(o, cond)
      .withColumn(cumCol, sum(col(weightCol)).over(ww) + col("__off"))
      .drop("__pid" +: "__opid" +: "__off" +: groupCols.map(c => s"__og_$c"): _*)
  }
}
