package graft.api

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-shard writer — the output stage of a data-curation
  * pipeline: every row lands in exactly one of `nShards` shards,
  * deterministically from its key, with one parquet file per shard.
  * Downstream trainers address shards by number and re-read a shard
  * to the byte regardless of cluster parallelism.
  *
  * Scale shape: the assignment is a pure projection (no shuffle); the
  * single shuffle is the `repartition` on the shard column so each
  * shard becomes one write task. `partitionBy` makes the layout
  * self-describing (`shard=N/` directories), so a trainer reading
  * shard 7 scans one directory — partition pruning, not a file-list
  * filter. At 100 TB the only knob is nShards (shard size =
  * corpus/nShards; pick so one shard fits a reader task).
  */
object Sharder {

  /** Deterministic shard id: xxhash64 of the key, folded into
    * [0, nShards). Hash-based (not modulus) so clustered key ranges —
    * crawl batches, time-ordered ids — still spread uniformly.
    */
  def withShard(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column; withShard would silently overwrite it")
    df.withColumn("shard", pmod(xxhash64(col(keyCol)), lit(nShards.toLong)))
  }

  /** Writes one directory (`shard=i/`) with exactly one parquet file
    * per shard. Returns the shard layout for auditing.
    */
  def write(df: DataFrame, keyCol: String, nShards: Int, dir: String): Unit =
    withShard(df, keyCol, nShards)
      .repartition(nShards, col("shard"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(dir)
}
