package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed quantiles without per-group value buffering.
  *
  * Spark's exact `percentile` aggregate holds every value of a group
  * in one aggregation buffer — a memory cliff at corpus scale — and
  * the textbook `PARTITION BY group ORDER BY value` cumulative window
  * funnels each group through a single task when the group column is
  * low-cardinality. This helper computes the exact type-7 interpolated
  * median from a value-COMPRESSED weighted relation instead:
  *
  *  1. the caller compresses the corpus to (group, value, weight)
  *     rows (`groupBy(group, value).count()` — distinct values per
  *     group, orders of magnitude below row count, one
  *     partial-aggregable shuffle);
  *  2. [[Ranking.withRunningTotal]] turns it into a CDF — range
  *     repartition + metadata offsets, every task busy;
  *  3. a row with inclusive running weight `hi` and weight `w` covers
  *     sorted 0-based positions [hi−w, hi); the two central positions
  *     p1 = ⌊(n−1)/2⌋ and p2 = (n−1)−p1 land in at most two rows, and
  *     `med2 = Σ value·(covers p1 + covers p2)` counts a row covering
  *     both positions twice — exactly `2·quantile_cont(0.5)` and an
  *     INTEGER whenever values are integers (the determinism contract
  *     q145's doubled-integer MAD pipeline builds on).
  *
  * Consumers: q145 (per-type MAD medians), q109 (per-language length
  * gate). The returned relation has one row per group: the group
  * columns, `totalCol` (BIGINT total weight) and `med2Col` (twice the
  * interpolated median, same type as Σ value·weight).
  */
object Quantiles {

  def median2(
      comp: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      med2Col: String = "med2",
      totalCol: String = "n"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val cum = Ranking.withRunningTotal(
      comp, groupCols, Seq(col(valueCol)), weightCol, "__hi", totalCol)
    val coversP1 = col("__p1") >= col("__lo") && col("__p1") < col("__hi")
    val coversP2 = col("__p2") >= col("__lo") && col("__p2") < col("__hi")
    cum.withColumn("__lo", col("__hi") - col(weightCol))
      .withColumn("__p1", expr(s"($totalCol - 1) div 2"))
      .withColumn("__p2", col(totalCol) - 1 - expr(s"($totalCol - 1) div 2"))
      .filter(coversP1 || coversP2)
      .groupBy(groupCols.map(col): _*)
      .agg(min(col(totalCol)).as(totalCol),
        sum(col(valueCol) *
          (when(coversP1, 1L).otherwise(0L) +
            when(coversP2, 1L).otherwise(0L))).as(med2Col))
  }
}
