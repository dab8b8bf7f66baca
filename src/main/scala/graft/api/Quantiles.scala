package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed quantiles without per-group value buffering.
  *
  * Spark's exact `percentile` aggregate holds every value of a group
  * in one aggregation buffer — a memory cliff at corpus scale — and
  * the textbook `PARTITION BY group ORDER BY value` cumulative window
  * funnels each group through a single task when the group column is
  * low-cardinality. These helpers work from a value-COMPRESSED
  * weighted relation instead:
  *
  *  1. the caller compresses the corpus to (group, value, weight)
  *     rows (`groupBy(group, value).count()` — distinct values per
  *     group, orders of magnitude below row count, one
  *     partial-aggregable shuffle);
  *  2. [[Ranking.withRunningTotal]] turns it into a CDF — range
  *     repartition + metadata offsets, every task busy;
  *  3. a row with inclusive running weight `hi` and weight `w` covers
  *     sorted 0-based positions [hi−w, hi), so the value at ANY
  *     0-based rank is a filter + one-row-per-group aggregate away.
  *
  * Consumers: q145 (per-type MAD medians), q109 (per-language length
  * gate), q154 (winsorization bounds).
  */
object Quantiles {

  /** The weighted CDF of a compressed relation: every input row plus
    * `__hi` (inclusive running weight in `valueCol` order within the
    * group), `__lo` (= `__hi` − weight, the exclusive lower bound) and
    * `totalCol` (group weight total). A row covers sorted 0-based
    * positions [`__lo`, `__hi`). One range-partitioned
    * [[Ranking.withRunningTotal]] pass; callers that probe the SAME
    * distribution repeatedly (q145's median, q154's winsorization
    * bounds, q175's deciles all read the cents CDF) should memoize
    * THIS and use the `FromCdf` variants below — the CDF machinery is
    * then paid once per (session, sf) instead of once per query.
    */
  def cdfOf(
      comp: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      totalCol: String = "n"): DataFrame = {
    // __hi is require-guarded inside withRunningTotal; __lo is ours —
    // fail fast rather than silently clobber a caller column
    require(!comp.columns.contains("__lo"),
      "cdfOf reserves column name __lo")
    require(!comp.columns.contains("__hi"),
      "cdfOf reserves column name __hi")
    Ranking.withRunningTotal(
        comp, groupCols, Seq(col(valueCol)), weightCol, "__hi", totalCol)
      .withColumn("__lo", col("__hi") - col(weightCol))
  }

  /** [[valuesAtPositions]] over a prebuilt [[cdfOf]] relation — a
    * filter plus one partial-aggregable groupBy, no new shuffle
    * machinery. The CDF may carry MORE groups than the caller wants
    * (per-group CDFs are independent, so restricting a multi-group CDF
    * to a group subset equals the CDF of the subset): filter first.
    */
  def valuesAtPositionsFromCdf(
      cdf: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      positions: Seq[(String, Column => Column)],
      totalCol: String = "n"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(positions.nonEmpty, "positions must be non-empty")
    def covers(posOf: Column => Column) = {
      val p = posOf(col(totalCol))
      p >= col("__lo") && p < col("__hi")
    }
    val aggs = positions.map { case (name, posOf) =>
      min(when(covers(posOf), col(valueCol))).as(name)
    }
    cdf.filter(positions.map { case (_, p) => covers(p) }.reduce(_ || _))
      .groupBy(groupCols.map(col): _*)
      .agg(min(col(totalCol)).as(totalCol), aggs: _*)
  }

  /** For each group, the sorted-multiset values at the given 0-based
    * positions — each position an expression of the group's total
    * weight (passed as a Column of `totalCol`). One CDF pass serves
    * every requested position; the result has one row per group with
    * the group columns, `totalCol` (BIGINT total weight) and one
    * column per named position.
    */
  def valuesAtPositions(
      comp: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      positions: Seq[(String, Column => Column)],
      totalCol: String = "n"): DataFrame =
    valuesAtPositionsFromCdf(
      cdfOf(comp, groupCols, valueCol, weightCol, totalCol),
      groupCols, valueCol, positions, totalCol)

  /** 0-based central positions of the type-7 interpolated median:
    * p1 = ⌊(n−1)/2⌋ and p2 = (n−1)−p1. Shared with oracle SQL twins.
    */
  private def p1(n: Column): Column = floor((n - 1) / lit(2.0)).cast("long")
  private def p2(n: Column): Column = n - 1 - p1(n)

  /** Twice the exact type-7 interpolated median per group —
    * `med2 = value@p1 + value@p2`, an INTEGER whenever values are
    * integers (the determinism contract q145's doubled-integer MAD
    * pipeline builds on; `med2/2.0` is an exact dyadic rational).
    * Returns the group columns, `totalCol` and `med2Col`.
    */
  def median2(
      comp: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      med2Col: String = "med2",
      totalCol: String = "n"): DataFrame =
    valuesAtPositions(comp, groupCols, valueCol, weightCol,
      Seq("__m1" -> p1, "__m2" -> p2), totalCol)
      .withColumn(med2Col, col("__m1") + col("__m2"))
      .drop("__m1", "__m2")

  /** [[median2]] over a prebuilt [[cdfOf]] relation — filter + one
    * groupBy, no new CDF machinery. */
  def median2FromCdf(
      cdf: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      med2Col: String = "med2",
      totalCol: String = "n"): DataFrame =
    valuesAtPositionsFromCdf(cdf, groupCols, valueCol,
      Seq("__m1" -> p1, "__m2" -> p2), totalCol)
      .withColumn(med2Col, col("__m1") + col("__m2"))
      .drop("__m1", "__m2")
}
