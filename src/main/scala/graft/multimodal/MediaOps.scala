package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star "multimodal columns"):
  * image/audio/video as opaque `binary` columns plus a typed metadata
  * struct, with decode / feature-extraction / frame-sampling stages.
  *
  * The decode kernel dispatches on mime type:
  *  - `image/png`, `image/bmp`, `image/gif`: REAL pixel decode via
  *    the pure-JVM `javax.imageio` readers (no native codecs needed);
  *    features are the luminance histogram + mean over actual pixels;
  *  - anything else (jpeg variants without a reader here, audio,
  *    video): a clearly-marked deterministic STUB (byte histogram +
  *    moments) standing in for the codec this container lacks.
  * Everything around the kernel is the real dataflow: schema,
  * per-partition batched processing (`mapPartitions`, the Scala
  * analogue of an inference-batched pandas UDF), and the declarative
  * post-processing — swap the stub branch and the rest ships
  * unchanged to a cluster.
  *
  * Scale notes: blobs stay opaque through the plan (no
  * per-row driver traffic); feature extraction is embarrassingly
  * parallel map-side work; frame sampling explodes bounded slices,
  * not whole blobs.
  */
object MediaOps {

  /** One media row: blob + typed metadata (the schema a real
    * image/audio table would carry; FIXTURES has no binary table, so
    * `synthesizeMedia` derives deterministic blobs from documents).
    */
  case class MediaRow(doc_id: Long, blob: Array[Byte], mime: String,
      width: Int, height: Int)

  case class MediaFeatures(doc_id: Long, n_bytes: Long, mean_byte: Double,
      hist: Array[Long])

  /** Deterministic media table derived from `documents`: the UTF-8
    * text bytes stand in for an encoded image; width/height metadata
    * derive from the length. Deterministic → testable.
    */
  def synthesizeMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .select(col("doc_id"), col("blob"), lit("image/fake").as("mime"),
        (length(col("blob")) % 64 + 1).cast("int").as("width"),
        (length(col("blob")) % 48 + 1).cast("int").as("height"))
      .as[MediaRow]
  }

  /** Mime types `javax.imageio` can decode without native codecs. */
  private val ImageIoMimes = Set("image/png", "image/bmp", "image/gif")

  /** REAL decode branch: `javax.imageio` pixel decode; features are
    * the 16-bucket LUMINANCE histogram + mean luminance (ITU-R BT.601
    * integer weights) over actual decoded pixels, and n_bytes is the
    * pixel count. Runs on the executor, one image at a time, bounded
    * memory.
    */
  private def imageFeatures(r: MediaRow): MediaFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.blob))
    require(img != null, s"imageio failed to decode doc ${r.doc_id} (${r.mime})")
    val hist = new Array[Long](16)
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        hist(lum >> 4) += 1
        sum += lum
        x += 1
      }
      y += 1
    }
    val n = img.getWidth.toLong * img.getHeight
    MediaFeatures(r.doc_id, n, if (n == 0) 0.0 else sum.toDouble / n, hist)
  }

  /** Batched per-partition decode + feature extraction. The loop
    * shape matches a real codec integration: one iterator pass per
    * partition, constant per-row state, no driver round-trips.
    * PNG/BMP/GIF take the genuine `javax.imageio` pixel path; other
    * mimes take the stub branch (no codecs in this container).
    */
  def decodeFeatures(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (ImageIoMimes.contains(r.mime)) imageFeatures(r)
        else {
          // --- STUB DECODE: a real implementation decodes r.blob
          // with the matching codec here; we extract deterministic
          // fake features (16-bucket byte histogram + mean) instead ---
          val hist = new Array[Long](16)
          var sum = 0L
          r.blob.foreach { b =>
            val u = b & 0xff
            hist(u >> 4) += 1
            sum += u
          }
          MediaFeatures(r.doc_id, r.blob.length.toLong,
            if (r.blob.length == 0) 0.0 else sum.toDouble / r.blob.length, hist)
        }
      }
    }
  }

  /** Frame sampling: slice the blob into fixed-size "frames" and keep
    * every `stride`-th — the video-keyframe access pattern. Pure
    * declarative slicing (codegen'd), blobs never leave the executor.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .select(col("doc_id"),
        posexplode(split(base64(col("blob")), s"(?<=\\G.{${4 * (frameBytes / 3)}})"))
          .as(Seq("frame_idx", "frame_b64")))
      .filter(col("frame_idx") % stride === 0 && length(col("frame_b64")) > 0)

  /** Feature aggregation by an upstream key (per-source corpus stats
    * over decoded features) — the post-decode analytics stage.
    */
  def featureStats(spark: SparkSession, sfDir: String): DataFrame = {
    val media = synthesizeMedia(spark, sfDir)
    val feats = decodeFeatures(spark, media)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"))
    feats.toDF().join(docs, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("mean_byte")), 4).as("avg_mean_byte"))
      .orderBy(col("source"))
  }
}
