package graft.multimodal

import java.awt.image.BufferedImage

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
  * Both branches run under the registered q48 query: every fourth
  * document gets a genuine deterministic PNG blob (so the driver-run
  * path exercises `javax.imageio` for real), the rest keep the fake
  * mime and take the stub branch.
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

  /** Decoded features. `n_bytes` is the decoded size (pixel count for
    * real images, blob byte count for the stub), `sum_raw` the exact
    * integer sum of the decoded values (luminance resp. byte values)
    * — kept as a long so downstream aggregates can stay integer-pure
    * (hash-stable across engines); `mean_byte = sum_raw / n_bytes`.
    */
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
      sum_raw: Long, mean_byte: Double, hist: Array[Long])

  /** Fraction knob: ~every 4th doc gets a real PNG. Selected on
    * (doc_id / 7) % 4 — NOT doc_id % 4, which is perfectly correlated
    * with the synthetic `source = srcN(doc_id % 20)` assignment and
    * would make every source single-branch; dividing first mixes both
    * decode branches within most sources.
    */
  private[graft] val PngEvery = 4L

  private[graft] def isPngId(id: Long): Boolean = (id / 7) % PngEvery == 0

  private[graft] def pngDims(id: Long): (Int, Int) =
    ((id % 13 + 3).toInt, (id % 7 + 3).toInt)

  /** Deterministic PNG: width×height grayscale, every pixel of row y
    * at gray level (id*7 + y) % 256 — a row gradient, so the decoded
    * luminance sum is exactly w · Σ_y (id*7+y)%256 (BT.601 integer
    * luminance of gray g is g itself: (299+587+114)g / 1000 = g) and
    * a SQL oracle can recompute it without decoding anything.
    */
  private[graft] def syntheticPng(id: Long): Array[Byte] = {
    val (w, h) = pngDims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val v = ((id * 7 + y) % 256).toInt
      val rgb = (v << 16) | (v << 8) | v
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic media table derived from `documents`: every
    * `PngEvery`-th doc carries a genuine encoded PNG (decoded by the
    * real `javax.imageio` branch), the rest carry their UTF-8 text
    * bytes under a fake mime (stub branch). Deterministic → testable
    * and SQL-oracle-checkable.
    */
  def synthesizeMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        if (isPngId(id)) {
          val (w, h) = pngDims(id)
          MediaRow(id, syntheticPng(id), "image/png", w, h)
        } else {
          // NULL text → empty blob: its 0-byte / 0-sum features
          // contribute exactly what the SQL twin's NULL terms do
          // (sum skips them) while the row still counts in n_media
          val b = (if (text == null) "" else text)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          MediaRow(id, b, "image/fake", b.length % 64 + 1, b.length % 48 + 1)
        }
      }
  }

  /** Mime types `javax.imageio` can decode without native codecs. */
  private val ImageIoMimes = Set("image/png", "image/bmp", "image/gif")

  /** REAL decode branch: `javax.imageio` pixel decode; features are
    * the 16-bucket LUMINANCE histogram + exact luminance sum + mean
    * (ITU-R BT.601 integer weights) over actual decoded pixels, and
    * n_bytes is the pixel count. Runs on the executor, one image at a
    * time, bounded memory.
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
    MediaFeatures(r.doc_id, r.mime, n, sum,
      if (n == 0) 0.0 else sum.toDouble / n, hist)
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
          MediaFeatures(r.doc_id, r.mime, r.blob.length.toLong, sum,
            if (r.blob.length == 0) 0.0 else sum.toDouble / r.blob.length, hist)
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // Perceptual-hash near-dup surface (image dedup at corpus scale)
  // ------------------------------------------------------------------

  /** Gallery fixture dims — fixed so every image resizes through the
    * same sample grid (real pipelines resize arbitrary dims; the
    * nearest-neighbor grid below handles any w ≥ 8, h ≥ 9).
    */
  private[graft] val GalleryW = 16
  private[graft] val GalleryH = 12

  /** Number of planted image prototypes in the gallery fixture. */
  private[graft] val GalleryProtos = 20L

  /** Deterministic gallery pixel: prototype `id % GalleryProtos`
    * carries a 2-D integer texture (linear + product-mod terms so
    * vertical gradient signs VARY per column — a 1-D gradient would
    * collapse every dHash to the same few values), plus a per-id
    * sparse noise ridge (+37 gray on the `(5x+3y) ≡ id (mod 50)`
    * diagonal) so same-prototype images are near- but not exact
    * duplicates. Integer-only, so a SQL oracle replays it symbolically
    * (the q48 convention).
    */
  private[graft] def galleryPixel(id: Long, x: Int, y: Int): Int = {
    val p = id % GalleryProtos
    val base = (31 * p + 7 * x + 13 * y + (x * y * (p + 3)) % 64) % 256
    val noise = if ((x * 5 + y * 3) % 50 == id % 50) 37 else 0
    ((base + noise) % 256).toInt
  }

  /** Deterministic gallery PNG: `GalleryW`×`GalleryH` grayscale with
    * `galleryPixel` values — a REAL encoded PNG so the dedup pipeline
    * exercises genuine `javax.imageio` decode end to end.
    */
  private[graft] def syntheticGalleryPng(id: Long): Array[Byte] = {
    val img = new BufferedImage(GalleryW, GalleryH, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < GalleryH) {
      var x = 0
      while (x < GalleryW) {
        val v = galleryPixel(id, x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One gallery image per document id — the image-corpus stand-in
    * (FIXTURES has no binary table). Unlike [[synthesizeMedia]] every
    * row is a genuine PNG: the dedup query's whole decode path is the
    * real `javax.imageio` branch.
    */
  def synthesizeGallery(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      // parallelize the encode+decode compute: the ids arrive from a
      // single small file, and AQE sizes stages by BYTES (the q35/q60
      // bytes-vs-compute lesson)
      .repartition(spark.sparkContext.defaultParallelism)
      .map(id => MediaRow(id, syntheticGalleryPng(id), "image/png",
        GalleryW, GalleryH))
  }

  /** 64-bit difference hash (dHash) over REAL decoded pixels: sample
    * a 8-wide × 9-tall nearest-neighbor luminance grid (the resize
    * step — `x_j = j(w−1)/7`, `y_k = k(h−1)/8`, BT.601 integer
    * luminance) and set bit `8k+j` when the gradient at column j
    * between sampled rows k and k+1 is positive. Gradient SIGNS
    * survive brightness/contrast shifts, which is why dHash is the
    * standard first pass of image dedup pipelines; 64 bits keeps the
    * whole fingerprint in one BIGINT so banding and hamming reuse the
    * q35 SimHash machinery unchanged.
    */
  def dHash64(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    require(w >= 1 && h >= 2, s"dHash needs a decodable image, got ${w}x$h")
    def lum(x: Int, y: Int): Int = {
      val rgb = img.getRGB(x, y)
      (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
    }
    var bits = 0L
    var k = 0
    while (k < 8) {
      var j = 0
      while (j < 8) {
        val x = j * (w - 1) / 7
        if (lum(x, (k + 1) * (h - 1) / 8) > lum(x, k * (h - 1) / 8))
          bits |= 1L << (8 * k + j)
        j += 1
      }
      k += 1
    }
    bits
  }

  /** Decode every gallery blob (real `javax.imageio` path) and emit
    * its dHash — the per-partition batched kernel shape of
    * [[decodeFeatures]], with the hash replacing the histogram.
    */
  def galleryDHashes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    synthesizeGallery(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.blob))
        require(img != null, s"imageio failed to decode doc ${r.doc_id}")
        (r.doc_id, dHash64(img))
      }
    }.toDF("doc_id", "dhash")
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
    * over decoded features) — the post-decode analytics stage. Output
    * is INTEGER-pure (counts and exact sums, no floating aggregates)
    * so a DuckDB oracle that recomputes the deterministic blobs'
    * stats symbolically hash-matches bit-for-bit; users derive means
    * as `png_lum_sum / png_pixels` etc.
    */
  def featureStats(spark: SparkSession, sfDir: String): DataFrame = {
    val media = synthesizeMedia(spark, sfDir)
    val feats = decodeFeatures(spark, media)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"))
    val isPng = col("mime") === "image/png"
    feats.toDF().join(docs, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        sum(isPng.cast("long")).as("n_png"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(when(isPng, col("sum_raw")).otherwise(0L)).as("png_lum_sum"),
        sum(when(!isPng, col("sum_raw")).otherwise(0L)).as("stub_byte_sum"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------------
  // Audio frame-sampling surface (WAV/PCM binary columns)
  // ------------------------------------------------------------------

  /** One audio row: a genuine RIFF/WAVE PCM16 mono blob + mime —
    * the schema an audio corpus table carries.
    */
  case class AudioRow(doc_id: Long, blob: Array[Byte], mime: String)

  /** Frame-level audio features: header-derived sample rate, sample
    * count, number of (FrameSize, FrameHop) analysis frames, exact
    * integer frame-energy statistics (Σ|s| per frame) and the count
    * of all-zero (silent) frames. All integers → hash-stable.
    */
  case class AudioFrames(doc_id: Long, sample_rate: Int, n_samples: Long,
      n_frames: Long, total_energy: Long, peak_energy: Long, n_silent: Long)

  /** Analysis framing: 256-sample frames, 128-sample hop (50%
    * overlap) — the standard STFT-ish windowing shape.
    */
  private[graft] val FrameSize = 256
  private[graft] val FrameHop = 128

  /** Audio slice: every 5th doc carries a WAV blob. */
  private[graft] def isAudioId(id: Long): Boolean = id % 5 == 2

  private[graft] def audioRate(id: Long): Int = (8000 + (id % 3) * 4000).toInt
  private[graft] def audioLen(id: Long): Int = (4096 + (id % 7) * 512).toInt
  private[graft] def audioZeroLen(id: Long): Int = (512 + (id % 11) * 128).toInt

  /** Deterministic PCM16 sample: an integer pseudo-waveform with a
    * PLANTED per-doc silent stretch ([3072, 3072+zeroLen) is all
    * zeros — always inside the signal, length varies by doc), so
    * silent-frame detection has ground truth and a SQL oracle can
    * recompute every frame energy symbolically without parsing WAV.
    */
  private[graft] def audioSample(id: Long, t: Int): Short = {
    if (t >= 3072 && t < 3072 + audioZeroLen(id)) 0
    else (((id * 37 + t.toLong * 11) % 2048) - 1024).toShort
  }

  /** Genuine RIFF/WAVE container: canonical 44-byte header (PCM fmt
    * chunk, mono, 16-bit little-endian) + the data chunk. The parse
    * side ([[parseWav]]) walks chunks for real — the blob is a valid
    * WAV any audio tool would read.
    */
  private[graft] def syntheticWav(id: Long): Array[Byte] =
    buildWav(audioRate(id), audioLen(id), t => audioSample(id, t))

  /** Canonical RIFF/WAVE assembly shared by the per-doc synthesizers:
    * 44-byte header (PCM fmt chunk, mono, 16-bit little-endian) + the
    * data chunk filled from the sample function.
    */
  private def buildWav(sr: Int, n: Int, sample: Int => Short): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + 2 * n)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sr); bb.putInt(sr * 2) // byte rate = sr * blockAlign
    bb.putShort(2); bb.putShort(16) // blockAlign, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(2 * n)
    var t = 0
    while (t < n) { bb.putShort(sample(t)); t += 1 }
    bb.array()
  }

  // ------------------------------------------------------------------
  // Audio fingerprint surface (delta-sign energy contour, q240)
  // ------------------------------------------------------------------

  /** Gallery prototype: five shared base contours across the audio
    * slice — docs with the same prototype are PLANTED near-duplicate
    * recordings of one source (same energy envelope, per-doc
    * sample-level perturbation), the audio analogue of q157's PNG
    * prototype gallery.
    */
  private[graft] def galleryProto(id: Long): Long = (id / 5) % 5

  /** All gallery clips share one length so the fingerprint frame
    * grid lines up (a production fingerprinter trims/pads first).
    */
  private[graft] val GalleryLen = 4096

  /** Deterministic gallery PCM16 sample: a 128-periodic sawtooth
    * (Σ over any hop-aligned window is the CONSTANT 8128) amplitude-
    * modulated per hop-window by `m = ((2·proto + window) mod 7)+1`,
    * plus a per-doc ±1 perturbation every 97 samples. Frame-energy
    * deltas are therefore `8128·(m_{f+2} − m_f) + ε` with
    * |8128·Δm| ≥ 16256 and |ε| ≤ 2 — the delta SIGN is a pure
    * function of the prototype, which is what makes the fingerprint
    * perturbation-invariant by construction, not by tuning.
    */
  private[graft] def gallerySample(id: Long, t: Int): Short = {
    val m = ((2 * galleryProto(id) + t / FrameHop) % 7) + 1
    val a = (t * 17) % 128
    val pert = if (t % 97 == id % 89) 1 else 0
    (m * a + pert).toShort
  }

  private[graft] def galleryWav(id: Long): Array[Byte] =
    buildWav(audioRate(id), GalleryLen, t => gallerySample(id, t))

  /** Deterministic near-duplicate audio gallery over the audio slice
    * (the synthesizeMedia convention — FIXTURES has no binary audio
    * table).
    */
  def synthesizeAudioGallery(spark: SparkSession, sfDir: String): Dataset[AudioRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .filter(isAudioId _)
      .map(id => AudioRow(id, galleryWav(id), "audio/wav"))
  }

  /** Acoustic fingerprint: REAL WAV parse → (FrameSize, FrameHop)
    * frame energies → the sign of each consecutive-frame energy
    * delta packed into a ≤30-bit word (the Haitsma–Kalker /
    * Shazam-family "energy contour direction" idea collapsed to one
    * band) — brightness/level-invariant the same way q157's dHash
    * gradient signs are. Map-side per-partition work over opaque
    * binary columns; nothing explodes into rows.
    */
  case class AudioFingerprint(doc_id: Long, n_frames: Long, fp: Long)

  def audioFingerprints(spark: SparkSession,
      audio: Dataset[AudioRow]): Dataset[AudioFingerprint] = {
    import spark.implicits._
    audio.mapPartitions { rows =>
      rows.map { r =>
        val (_, pcm) = parseWav(r.blob)
        val n = pcm.length
        val nf = if (n < FrameSize) 0 else (n - FrameSize) / FrameHop + 1
        val e = new Array[Long](nf)
        var f = 0
        while (f < nf) {
          var s = 0L
          var t = f * FrameHop
          val end = t + FrameSize
          while (t < end) { s += math.abs(pcm(t).toLong); t += 1 }
          e(f) = s
          f += 1
        }
        val bits = math.min(30, math.max(0, nf - 1))
        var fp = 0L
        f = 0
        while (f < bits) {
          if (e(f + 1) > e(f)) fp |= (1L << f)
          f += 1
        }
        AudioFingerprint(r.doc_id, nf.toLong, fp)
      }
    }
  }

  /** Deterministic audio table derived from `documents` (FIXTURES has
    * no binary audio table — the synthesizeMedia convention).
    */
  def synthesizeAudio(spark: SparkSession, sfDir: String): Dataset[AudioRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .filter(isAudioId _)
      .map(id => AudioRow(id, syntheticWav(id), "audio/wav"))
  }

  /** REAL WAV parse: validates the RIFF/WAVE magic, walks the chunk
    * list to `fmt ` (requiring PCM16 mono) and `data`, and decodes
    * little-endian PCM16 samples. Rejects malformed blobs loudly —
    * this is the decode step a production audio pipeline runs, not a
    * formula replay (the formula exists only on the SYNTHESIS and
    * oracle sides).
    */
  private[graft] def parseWav(blob: Array[Byte]): (Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(blob)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def str4(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(str4() == "RIFF", "not a RIFF container")
    bb.getInt // riff size
    require(str4() == "WAVE", "not a WAVE file")
    var rate = -1
    var data: Array[Short] = null
    while (bb.remaining() >= 8 && (rate < 0 || data == null)) {
      val id = str4()
      val sz = bb.getInt
      // a declared size past the buffer is a truncated/corrupt blob —
      // fail with the loud contract require, not a BufferUnderflow
      require(sz >= 0 && sz <= bb.remaining(),
        s"corrupt WAV: chunk '$id' declares $sz bytes, ${bb.remaining()} remain")
      // RIFF pads every odd-sized chunk to an even boundary; the pad
      // byte is NOT in the declared size, so skip sz + (sz & 1)
      val next = bb.position() + sz + (sz & 1)
      id match {
        case "fmt " =>
          // the branch reads a fixed 16 bytes of PCM fields, so the
          // declared size must cover them — a blob whose fmt chunk
          // declares sz=8 with exactly 8 bytes remaining passes the
          // generic sz<=remaining check above yet still underflows
          // (advisor find, round 12)
          require(sz >= 16,
            s"corrupt WAV: fmt chunk declares $sz bytes, 16 required")
          val fmt = bb.getShort; val ch = bb.getShort
          rate = bb.getInt; bb.getInt; bb.getShort
          val bits = bb.getShort
          require(fmt == 1 && ch == 1 && bits == 16,
            s"unsupported WAV: fmt=$fmt channels=$ch bits=$bits")
        case "data" =>
          data = new Array[Short](sz / 2)
          var i = 0
          while (i < data.length) { data(i) = bb.getShort; i += 1 }
        case _ => () // ancillary chunk (LIST, fact, ...): skip
      }
      bb.position(math.min(next, bb.limit()))
    }
    require(rate > 0 && data != null, "missing fmt/data chunk")
    (rate, data)
  }

  // ------------------------------------------------------------------
  // Video frame-sampling surface (Y4M binary columns)
  // ------------------------------------------------------------------

  /** One video row: a genuine YUV4MPEG2 (Y4M) mono stream — the
    * header + FRAME-delimited raw luminance planes ffmpeg/mplayer
    * read — plus mime.
    */
  case class VideoRow(doc_id: Long, blob: Array[Byte], mime: String)

  /** Frame-sampled video features: header-derived dims, total frame
    * count, sampled count (every [[VideoSampleEvery]]-th frame),
    * exact integer luminance sum over sampled frames, scene-cut
    * count by sum-of-absolute-differences (SAD) between consecutive
    * sampled frames, and the peak SAD.
    */
  case class VideoFeatures(doc_id: Long, width: Int, height: Int,
      n_frames: Long, n_sampled: Long, total_lum: Long, n_cuts: Long,
      peak_sad: Long)

  private[graft] val VideoW = 16
  private[graft] val VideoH = 12

  /** Frame-sampling stride: decode every 2nd frame only — the
    * "don't decode what you don't need" contract of video pipelines.
    */
  private[graft] val VideoSampleEvery = 2

  /** Scene-cut threshold: mean per-pixel abs diff > 50 gray levels.
    * Within a planted scene the sampled-frame diff is exactly 2;
    * across a cut it is ≥ 94 — cleanly separated by construction.
    */
  private[graft] val CutMeanDiff = 50L

  /** Video slice: every 5th doc (disjoint from the audio slice). */
  private[graft] def isVideoId(id: Long): Boolean = id % 5 == 3

  private[graft] def videoFrames(id: Long): Int = (24 + (id % 9) * 4).toInt

  /** Scene base level: scenes are 8 frames long and alternate between
    * two brightness plateaus 100 levels apart — the planted cuts.
    */
  private[graft] def videoBase(id: Long, scene: Int): Int =
    (30 + (scene % 2) * 100 + (id % 40)).toInt

  /** Deterministic luminance: base(scene) + spatial gradient + a
    * per-frame step. Every term is ≤ 239 so nothing wraps mod 256,
    * which keeps the oracle CLOSED-FORM: a frame's luminance sum is
    * npix·(base + f%8) + 6048 (the gradient sum), and the SAD between
    * two frames is npix·|Δ(base + f%8)| — no per-pixel SQL loops.
    */
  private[graft] def videoPixel(id: Long, f: Int, x: Int, y: Int): Int =
    videoBase(id, f / 8) + 2 * x + 3 * y + (f % 8)

  /** Genuine Y4M container: `YUV4MPEG2 W.. H.. F12:1 Ip A1:1 Cmono`
    * stream header, then per frame a `FRAME` marker line + the raw
    * W·H luminance plane.
    */
  private[graft] def syntheticY4m(id: Long): Array[Byte] = {
    val n = videoFrames(id)
    val out = new java.io.ByteArrayOutputStream(64 + n * (6 + VideoW * VideoH))
    out.write(s"YUV4MPEG2 W$VideoW H$VideoH F12:1 Ip A1:1 Cmono\n"
      .getBytes("US-ASCII"))
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    var f = 0
    while (f < n) {
      out.write(frameHdr)
      var y = 0
      while (y < VideoH) {
        var x = 0
        while (x < VideoW) { out.write(videoPixel(id, f, x, y)); x += 1 }
        y += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** Deterministic video table derived from `documents`. */
  def synthesizeVideo(spark: SparkSession, sfDir: String): Dataset[VideoRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .filter(isVideoId _)
      .map(id => VideoRow(id, syntheticY4m(id), "video/y4m"))
  }

  /** REAL Y4M parse: stream-header tokenization (W/H/C params), then
    * the FRAME walk — each frame's marker line is verified and its
    * raw plane sliced out. Mono (4:0:0) only; malformed streams are
    * rejected loudly. Like [[parseWav]], the pixel formula exists
    * only on the synthesis/oracle sides — this path works from bytes.
    */
  private[graft] def parseY4m(blob: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    val nl0 = blob.indexOf('\n'.toByte)
    require(nl0 > 0, "missing Y4M stream header")
    val header = new String(blob, 0, nl0, "US-ASCII")
    val parts = header.split(' ')
    require(parts.headOption.contains("YUV4MPEG2"), "not a Y4M stream")
    def param(tag: Char): Option[String] =
      parts.tail.find(_.headOption.contains(tag)).map(_.tail)
    val w = param('W').map(_.toInt).getOrElse(
      throw new IllegalArgumentException("Y4M header missing width"))
    val h = param('H').map(_.toInt).getOrElse(
      throw new IllegalArgumentException("Y4M header missing height"))
    require(param('C').forall(_ == "mono"), "only mono (4:0:0) supported")
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var p = nl0 + 1
    while (p < blob.length) {
      val nl = blob.indexOf('\n'.toByte, p)
      require(nl >= p + 5 &&
        new String(blob, p, 5, "US-ASCII") == "FRAME",
        s"bad FRAME marker at offset $p")
      p = nl + 1
      require(p + w * h <= blob.length, "truncated frame plane")
      frames += java.util.Arrays.copyOfRange(blob, p, p + w * h)
      p += w * h
    }
    (w, h, frames.toArray)
  }

  /** Frame sampling + scene-cut detection over parsed planes: decode
    * every [[VideoSampleEvery]]-th frame, per sampled frame the exact
    * integer luminance sum, per consecutive sampled pair the SAD; a
    * cut is SAD > [[CutMeanDiff]]·npix. Map-side per-partition work,
    * frames iterate in place (the [[audioFrameFeatures]] shape).
    */
  def videoFrameFeatures(spark: SparkSession,
      video: Dataset[VideoRow]): Dataset[VideoFeatures] = {
    import spark.implicits._
    video.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, frames) = parseY4m(r.blob)
        val npix = w * h
        var totalLum = 0L
        var cuts = 0L
        var peakSad = 0L
        var prev: Array[Byte] = null
        var f = 0
        while (f < frames.length) {
          val cur = frames(f)
          var lum = 0L
          var i = 0
          while (i < npix) { lum += (cur(i) & 0xff); i += 1 }
          totalLum += lum
          if (prev != null) {
            var sad = 0L
            var j = 0
            while (j < npix) {
              sad += math.abs((cur(j) & 0xff) - (prev(j) & 0xff)); j += 1
            }
            if (sad > CutMeanDiff * npix) cuts += 1
            if (sad > peakSad) peakSad = sad
          }
          prev = cur
          f += VideoSampleEvery
        }
        val nSampled = (frames.length + VideoSampleEvery - 1) / VideoSampleEvery
        VideoFeatures(r.doc_id, w, h, frames.length.toLong, nSampled.toLong,
          totalLum, cuts, peakSad)
      }
    }
  }

  /** Frame sampling + exact integer energy features over parsed PCM:
    * per (FrameSize, FrameHop) frame, energy = Σ|s|; silent frames
    * are exactly-zero frames. Map-side per-partition work, constant
    * state per row — the [[decodeFeatures]] shape; frames iterate
    * in-place over the decoded array, nothing explodes into rows.
    */
  def audioFrameFeatures(spark: SparkSession,
      audio: Dataset[AudioRow]): Dataset[AudioFrames] = {
    import spark.implicits._
    audio.mapPartitions { rows =>
      rows.map { r =>
        val (rate, pcm) = parseWav(r.blob)
        val n = pcm.length
        val nf = if (n < FrameSize) 0 else (n - FrameSize) / FrameHop + 1
        var total = 0L
        var peak = 0L
        var silent = 0L
        var f = 0
        while (f < nf) {
          var e = 0L
          var t = f * FrameHop
          val end = t + FrameSize
          while (t < end) { e += math.abs(pcm(t).toLong); t += 1 }
          total += e
          if (e > peak) peak = e
          if (e == 0) silent += 1
          f += 1
        }
        AudioFrames(r.doc_id, rate, n.toLong, nf.toLong, total, peak, silent)
      }
    }
  }
}
