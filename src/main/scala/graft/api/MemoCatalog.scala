package graft.api

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable, fingerprint-keyed catalog for expensive derived relations
  * — the cross-SESSION layer under [[graft.SessionMemo]]'s
  * cross-QUERY layer. A 100 TB pipeline cannot recompute the MinHash
  * cluster assignment or the semantic-pair relation per process: it
  * persists them once per corpus snapshot and re-reads until the
  * corpus changes. This generalizes what [[AnnIndex]] (durable IVF
  * cells) and [[IncrementalDedup]] (durable band index) already do
  * ad hoc, with the q196 fingerprint idea as the invalidation key.
  *
  * Protocol per memo `<root>/<name>/`:
  *  - `manifest.json` names the live data directory and the input
  *    fingerprint it was built from;
  *  - data lives in `data-<fp>-<nonce>` (nonce = build timestamp, so
  *    concurrent rebuilds never clobber each other's files);
  *  - a rebuild writes the NEW data dir first, then swaps the
  *    manifest via write-temp + atomic rename, then best-effort
  *    deletes the superseded data dir. A reader that raced the swap
  *    still holds a complete old directory (parquet dirs are
  *    immutable once the manifest stops naming them, and the delete
  *    is deferred to the next successful swap's cleanup — a reader
  *    mid-scan on HDFS keeps its open blocks either way).
  *
  * Invalidation: the FINGERPRINT of the declared input relations —
  * order/partition/layout-independent (count + modular sum of
  * per-row hashes, the q196 construction), so a reshard or rewrite
  * of identical content does NOT invalidate, while any row change
  * does (up to 64-bit hash collision, the documented accepted
  * class). Computing it costs one scan of the inputs — paid every
  * session, but a scan is the floor for noticing change without a
  * versioned-table contract, and it is orders cheaper than the
  * builds it guards (LSH banding, verify joins, component rounds).
  *
  * Enablement: set session conf `spark.graft.memo.dir`. Unset (the
  * default, and what the driver's correctness runs use), the catalog
  * is a pass-through to `build.localCheckpoint()` — the SessionMemo
  * stability convention, byte-identical behavior to the pre-catalog
  * code path.
  *
  * Uses the Hadoop FileSystem API throughout, so `memo.dir` may be
  * local, HDFS, or any object store with a Hadoop connector.
  */
object MemoCatalog {

  /** Session conf naming the catalog root; unset = catalog off. */
  val DirConf = "spark.graft.memo.dir"

  /** Order-independent content fingerprint: `<count>-<fp62>` where
    * fp62 is the sum of per-row unsigned xxhash64 over all columns,
    * mod 2⁶² (exact in DECIMAL(38,0) to ~9·10¹⁸ rows — the q196
    * arithmetic). Commutative sum ⇒ independent of row order, file
    * order, and partitioning; one partial-aggregable scan, nothing
    * shuffles but one row of partials per task.
    */
  def fingerprint(df: DataFrame): String = {
    val two64 = lit("18446744073709551616").cast("decimal(38,0)")
    val hd = xxhash64(struct(df.columns.map(col).toIndexedSeq: _*))
      .cast("decimal(38,0)")
    val hu = when(hd < 0, hd + two64).otherwise(hd)
    val r = df.select(hu.as("hu"))
      .agg(count(lit(1)).as("n"),
        pmod(coalesce(sum(col("hu")), lit(0).cast("decimal(38,0)")),
          lit("4611686018427387904").cast("decimal(38,0)"))
          .cast("long").as("fp62"))
      .head()
    s"${r.getLong(0)}-${r.getLong(1)}"
  }

  /** Filesystem-safe memo name (call sites key memos by data-dir
    * paths; slashes and colons must not leak into the layout).
    */
  private def sanitize(name: String): String =
    name.map(c => if (c.isLetterOrDigit || c == '.' || c == '-') c else '_')

  private case class Manifest(fingerprint: String, dataDir: String)

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      mf: Path): Option[Manifest] =
    if (!fs.exists(mf)) None
    else try {
      val in = fs.open(mf)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      // two known string fields — a 2-entry flat object; keep the
      // parse dependency-free and strict (corrupt ⇒ None ⇒ rebuild)
      def field(k: String): Option[String] = {
        val m = ("\"" + k + "\"\\s*:\\s*\"([^\"]*)\"").r
        m.findFirstMatchIn(txt).map(_.group(1))
      }
      for (fp <- field("fingerprint"); dd <- field("dataDir"))
        yield Manifest(fp, dd)
    } catch { case _: java.io.IOException => None }

  /** Read-through accessor: reuse the persisted memo when the inputs'
    * fingerprint matches the manifest, else run `build`, persist it,
    * swap the manifest, and return a scan of the fresh parquet. The
    * returned relation is always STABLE (a parquet scan when the
    * catalog is on; `localCheckpoint` of the built plan when off),
    * so callers can fan it out to multiple consumers.
    */
  def readThrough(s: SparkSession, name: String, inputs: Seq[DataFrame])
      (build: => DataFrame): DataFrame =
    s.conf.getOption(DirConf) match {
      case None => build.localCheckpoint()
      case Some(root) =>
        require(inputs.nonEmpty, "memo inputs must be declared")
        val fp = inputs.map(fingerprint).mkString("_")
        val dir = new Path(root, sanitize(name))
        val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
        val mf = new Path(dir, "manifest.json")
        readManifest(fs, mf) match {
          case Some(m) if m.fingerprint == fp &&
              fs.exists(new Path(dir, m.dataDir)) =>
            s.read.parquet(new Path(dir, m.dataDir).toString)
          case prev =>
            val dataDir = s"data-${sanitize(fp)}-${System.nanoTime()}"
            build.write.mode("overwrite")
              .parquet(new Path(dir, dataDir).toString)
            val tmp = new Path(dir, s"manifest.json.tmp-${System.nanoTime()}")
            val out = fs.create(tmp, true)
            try out.write(
              s"""{"fingerprint": "$fp", "dataDir": "$dataDir"}"""
                .getBytes("UTF-8"))
            finally out.close()
            fs.delete(mf, false)
            if (!fs.rename(tmp, mf))
              throw new java.io.IOException(s"manifest swap failed for $dir")
            // superseded data dir: safe to drop once the manifest no
            // longer names it (best effort — a crash here only leaks
            // space, never correctness; the next swap retries nothing
            // because the manifest already moved on)
            prev.foreach { m =>
              if (m.dataDir != dataDir)
                try fs.delete(new Path(dir, m.dataDir), true)
                catch { case _: java.io.IOException => () }
            }
            s.read.parquet(new Path(dir, dataDir).toString)
        }
    }
}
