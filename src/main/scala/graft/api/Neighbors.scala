package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe access to the PREVIOUS and NEXT row under a GLOBAL
  * total order — the adjacency primitive behind sorted-suffix LCP
  * (q179's variable-length ExactSubstr), without the
  * `lag() OVER (ORDER BY ...)` single-reducer funnel.
  *
  * Shape (the [[Ranking]] family's): range-repartition on the order
  * keys so every shuffle partition holds a contiguous key range, take
  * within-partition lag/lead (partitioned by `spark_partition_id()` —
  * all K tasks busy), then patch the K partition boundaries from a
  * K-row METADATA relation of per-partition first/last values
  * (broadcast back, one row per non-empty partition; empty range
  * partitions simply have no row, so the boundary lag/lead over the
  * metadata skips them correctly).
  *
  * `orderCols` must be a TOTAL order (include a unique tie-breaker) —
  * same contract as [[Ranking.withRank]]. With ties the neighbor
  * CHOICE is nondeterministic but callers that only consume a
  * function of the neighbor VALUE at equal keys (e.g. LCP, which is
  * maximal for any equal-key neighbor) remain deterministic.
  */
object Neighbors {

  /** Adds `prevCol`/`nextCol`: `valueCol` of the globally previous /
    * next row by `orderCols` (null at the corpus ends).
    */
  def withNeighbors(
      df: DataFrame,
      orderCols: Seq[Column],
      valueCol: String,
      prevCol: String = "prev",
      nextCol: String = "next"): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(!df.columns.contains(prevCol) && !df.columns.contains(nextCol),
      s"input already has a '$prevCol' or '$nextCol' column")
    require(Seq("__pid", "__rn", "__cnt").forall(c => !df.columns.contains(c)),
      "input already has a '__pid', '__rn' or '__cnt' column")
    val parts = graft.AutoUnpersist.scoped(
      df.repartitionByRange(orderCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val ww = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    val within = parts
      .withColumn("__rn", row_number().over(ww))
      .withColumn(prevCol, lag(col(valueCol), 1).over(ww))
      .withColumn(nextCol, lead(col(valueCol), 1).over(ww))
    // per-partition first/last value + row count: one partial+final
    // aggregate → ≤ K metadata rows; the boundary lag/lead below runs
    // on THAT
    val bounds = parts.groupBy(col("__pid"))
      .agg(min_by(col(valueCol), struct(orderCols: _*)).as("__first"),
        max_by(col(valueCol), struct(orderCols: _*)).as("__last"),
        count(lit(1)).as("__cnt"))
    val wb = Window.orderBy(col("__pid"))
    val adj = bounds
      .select(col("__pid"), col("__cnt"),
        lag(col("__last"), 1).over(wb).as("__prev_last"),
        lead(col("__first"), 1).over(wb).as("__next_first"))
    // Patch the K partition boundaries by ROW POSITION (first/last row
    // of the partition), never by null-ness of the lag/lead — a null
    // `valueCol` on an interior row must stay null, not inherit the
    // previous partition's last value.
    within.join(broadcast(adj), Seq("__pid"))
      .withColumn(prevCol,
        when(col("__rn") === 1, col("__prev_last")).otherwise(col(prevCol)))
      .withColumn(nextCol,
        when(col("__rn") === col("__cnt"), col("__next_first"))
          .otherwise(col(nextCol)))
      .drop("__pid", "__rn", "__cnt", "__prev_last", "__next_first")
  }
}
