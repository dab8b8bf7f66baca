package graft.api

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.Exchange

/** Co-located (bucketed) table layout — the storage-side answer to
  * "this join shuffles 100 TB every night". Writing both sides of a
  * recurring equi join bucketed BY THE SAME key into the SAME number
  * of buckets pins each side's scan to a `HashPartitioning` on the
  * join key, so Catalyst's `EnsureRequirements` inserts NO Exchange:
  * the join (and any later groupBy on that key) runs entirely
  * bucket-local. The shuffle is paid ONCE at write time — amortized
  * across every subsequent read — which is the right trade for
  * fact/dim tables joined by every pipeline run (the reference's
  * R11–R13 key→reducer routing is the per-JOB version of the same
  * idea, `reference/src/master_manager.c:29-48`; bucketing persists
  * that assignment across jobs).
  *
  * Bucket-count choice at 100 TB: buckets ≈ corpus_bytes /
  * target_task_bytes (128–512 MB), rounded to a power of two so a
  * 2× re-bucket lines up bucket boundaries; both join sides MUST
  * agree (a mismatched side falls back to a runtime shuffle — gate
  * with [[shuffleCount]] in CI, as BucketedLayoutSpec does).
  */
object BucketedLayout {

  /** Persist `df` as a parquet table bucketed AND sorted by `keys` —
    * sorted files let the sort-merge join skip its per-task sort when
    * each bucket holds one file.
    */
  def materialize(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "bucketed layout needs at least one key column")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Number of Exchange (shuffle) operators in the executed plan —
    * the CI gate a co-located layout exists to keep at ZERO. Walks
    * through `AdaptiveSparkPlanExec` explicitly (AQE wraps the real
    * tree in a childless node, so a naive `collect` sees no
    * exchanges and a string match can't tell Exchange from
    * ReusedExchange).
    */
  def shuffleCount(df: DataFrame): Int =
    countExchanges(df.queryExecution.executedPlan)

  private def countExchanges(p: SparkPlan): Int = {
    val self = p match { case _: Exchange => 1; case _ => 0 }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      // After AQE materializes stages (df already executed), each
      // ShuffleQueryStageExec is a childless leaf hiding its wrapped
      // ShuffleExchangeExec — recurse into the stage's plan or the
      // count reads a spurious zero.
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self + kids.map(countExchanges).sum
  }

  /** The co-located join itself: plain `DataFrame.join` over the two
    * bucketed tables — no special operator needed, the layout does
    * the work. Provided as a named entry point so pipelines state
    * intent (and tests gate it) rather than relying on callers
    * remembering both tables are bucketed.
    */
  def join(spark: SparkSession, left: String, right: String,
      joinExpr: DataFrame => DataFrame => org.apache.spark.sql.Column,
      joinType: String = "inner"): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, joinExpr(l)(r), joinType)
  }
}
