package graft.api

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for long-lived parquet tables — the storage
  * half of the maintenance pair ([[AnnIndex.compact]] reclaims
  * deleted rows; this reclaims FILE COUNT). Appends, CDC merges and
  * streaming sinks accumulate files far below the ideal scan unit;
  * at 100 TB the cost is real read amplification: per-file open +
  * footer parse + a row group too small to amortize column
  * decompression, multiplied by every downstream query forever.
  *
  * Plan shape: the file listing is DRIVER METADATA (one row per
  * file, the same class as a range-sampler's boundaries), and bin
  * assignment is the [[SequencePacker]] cumsum — files in a stable
  * path order, `bin = (cum - bytes) div target` — so each output
  * file holds consecutive input files totaling ≈ `targetBytes`
  * (overflow bounded by one input file). The rewrite itself is one
  * distributed pass: scan → join the (path → bin) plan → repartition
  * to one task per bin → write, then the crash-safe
  * write-new/delete-old/rename swap [[AnnIndex.compact]] uses.
  */
object Compactor {

  /** Whole-file bin assignment over a (`path`, `bytes`) relation:
    * adds `bin` (0-based output file id). Deterministic in path
    * order; every bin's byte total is ~`targetBytes` with overflow
    * bounded by its largest file.
    */
  def plan(files: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    SequencePacker.pack(files.select(col("path"), col("bytes")),
        "path", "bytes", targetBytes)
      .select(col("path"), col("bytes"), col("seq_id").as("bin"))
  }

  /** Rewrites the flat parquet directory `dir` into ~totalBytes /
    * `targetBytes` files. Row-preserving (pure repartition by the
    * file plan); no-op on an empty or missing directory.
    */
  def compact(s: SparkSession, dir: String, targetBytes: Long): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), s.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(base)) return
    val listing = fs.listStatus(base)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath.toUri.getPath, st.getLen))
    if (listing.isEmpty) return
    import s.implicits._
    val p = plan(listing.toSeq.toDF("path", "bytes"), targetBytes)
      .select(col("path"), col("bin"))
    val nBins = listing.map(_._2).sum / targetBytes + 1
    val rows = s.read.parquet(dir)
      // input_file_name is URI-form (file:///...); normalize both
      // sides to the bare path before joining the plan
      .withColumn("path",
        regexp_replace(input_file_name(), "^[a-z0-9+.-]+:/+", "/"))
      .join(broadcast(p), "path")
    val tmp = s"$dir/../${base.getName}_compact"
    rows
      .repartition(nBins.toInt, col("bin"))
      .drop("path", "bin")
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    fs.delete(base, true)
    fs.rename(tmpPath, base)
  }
}
