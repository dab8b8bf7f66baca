package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MediaOps

/** Multimodal pipeline plumbing: deterministic synthetic blobs (every
  * ~4th doc a genuine PNG, the rest stub-decoded), feature extraction
  * through BOTH kernel branches, frame sampling. These tests pin the
  * dataflow semantics so swapping the stub kernel for a real codec
  * can't silently break schema/partitioning, and prove the registered
  * q48 path really decodes PNG pixels via `javax.imageio`.
  */
class MultimodalSpec extends SparkSpec {

  test("synthesized media carries blob + typed metadata, both mime branches") {
    val m = MediaOps.synthesizeMedia(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).count()
    assert(m.count() == docs)
    val byMime = m.toDF().groupBy("mime").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMime.getOrElse("image/png", 0L) > 0, "no real-PNG rows synthesized")
    assert(byMime.getOrElse("image/fake", 0L) > 0, "no stub rows synthesized")
    assert(m.head().blob.nonEmpty)
    // the PNG rows really are PNG containers (magic bytes)
    val png = m.filter(_.mime == "image/png").head()
    assert((png.blob(0) & 0xff) == 0x89 && png.blob(1) == 'P'.toByte &&
      png.blob(2) == 'N'.toByte && png.blob(3) == 'G'.toByte,
      "image/png blob does not start with the PNG signature")
  }

  test("stub branch features are deterministic and consistent with blob bytes") {
    val m = MediaOps.synthesizeMedia(spark, sfDir).filter(_.mime == "image/fake")
    val f = MediaOps.decodeFeatures(spark, m)
    val joined = f.toDF().join(m.toDF().select(col("doc_id"), col("blob")), "doc_id")
    joined.collect().foreach { r =>
      val blob = r.getAs[Array[Byte]]("blob")
      val hist = r.getAs[scala.collection.Seq[Long]]("hist")
      assert(r.getAs[Long]("n_bytes") == blob.length)
      assert(hist.sum == blob.length, "histogram buckets must cover every byte")
      val sum = blob.map(b => (b & 0xff).toLong).sum
      assert(r.getAs[Long]("sum_raw") == sum)
      assert(math.abs(r.getAs[Double]("mean_byte") - sum.toDouble / blob.length) < 1e-9)
    }
  }

  test("PNG branch decodes real pixels: features differ from byte-stub features") {
    val m = MediaOps.synthesizeMedia(spark, sfDir).filter(_.mime == "image/png")
    val f = MediaOps.decodeFeatures(spark, m)
    val joined = f.toDF()
      .join(m.toDF().select(col("doc_id"), col("blob"), col("width"), col("height")),
        "doc_id")
    assert(joined.count() > 0)
    joined.collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      // real decode: n_bytes is the PIXEL count, not the container
      // byte count — the stub branch could never produce this
      assert(r.getAs[Long]("n_bytes") == w.toLong * h)
      assert(r.getAs[Long]("n_bytes") != r.getAs[Array[Byte]]("blob").length,
        "pixel count coincides with container size — decode not proven")
      // luminance sum equals the gradient formula the oracle uses
      val expect = (0 until h).map(y => w.toLong * ((id * 7 + y) % 256)).sum
      assert(r.getAs[Long]("sum_raw") == expect,
        s"doc $id decoded luminance sum != synthetic gradient formula")
    }
  }

  test("featureStats groups decoded features per source, integer-pure") {
    val stats = MediaOps.featureStats(spark, sfDir)
    val srcs = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(stats.count() == srcs)
    assert(stats.columns.toSeq == Seq("source", "n_media", "n_png",
      "total_bytes", "png_lum_sum", "stub_byte_sum"))
    // both branches contribute somewhere
    assert(stats.filter(col("n_png") > 0).count() > 0)
    assert(stats.filter(col("stub_byte_sum") > 0).count() > 0)
  }

  test("decodeFeatures decodes real PNG pixels via javax.imageio") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    def png(gray: Int, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // gray level g has luminance exactly g under the BT.601 weights
    val rows = Seq(
      MediaOps.MediaRow(1L, png(0, 4, 3), "image/png", 4, 3),
      MediaOps.MediaRow(2L, png(255, 2, 2), "image/png", 2, 2),
      MediaOps.MediaRow(3L, png(100, 5, 5), "image/png", 5, 5))
    val f = MediaOps.decodeFeatures(spark, rows.toDS())
      .collect().map(x => x.doc_id -> x).toMap
    assert(f(1L).n_bytes == 12 && f(1L).mean_byte == 0.0 && f(1L).hist(0) == 12)
    assert(f(2L).n_bytes == 4 && f(2L).mean_byte == 255.0 && f(2L).hist(15) == 4)
    assert(f(3L).n_bytes == 25 && f(3L).mean_byte == 100.0 &&
      f(3L).hist(100 >> 4) == 25)
  }

  test("sampleFrames slices blobs into strided frames") {
    val m = MediaOps.synthesizeMedia(spark, sfDir).toDF()
    val frames = MediaOps.sampleFrames(m, frameBytes = 48, stride = 2)
    assert(frames.count() > 0)
    // every kept frame index is a multiple of the stride
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() == 0)
  }

  // ---- perceptual-hash near-dup surface -------------------------------

  /** Build a grayscale image from a pixel function (test helper). */
  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash64 is brightness-invariant and structure-sensitive") {
    // smooth texture bounded to [0, 200] so +40 cannot wrap; smooth so
    // nearest-neighbor resize lands on near-identical values (a
    // high-frequency texture legitimately drifts under resize)
    def tex(x: Int, y: Int): Int = (x * 5 + y * 17 + (x * y) / 8) % 200
    val base = MediaOps.dHash64(gray(32, 24)(tex))
    // same structure, globally brighter: every gradient SIGN unchanged
    val brighter = MediaOps.dHash64(gray(32, 24)((x, y) => tex(x, y) + 40))
    assert(hamming(base, brighter) == 0,
      "dHash must be invariant to a global brightness shift")
    // same structure at a different resolution: nearest-neighbor
    // resize lands on nearby texture, most gradient signs survive
    val scaled = MediaOps.dHash64(gray(64, 48)((x, y) => tex(x / 2, y / 2)))
    assert(hamming(base, scaled) <= 7,
      s"2x upscale drifted ${hamming(base, scaled)} bits (> threshold)")
    // vertically mirrored structure: every gradient sign flips
    val flipped = MediaOps.dHash64(gray(32, 24)((x, y) => tex(x, 23 - y)))
    assert(hamming(base, flipped) > 20,
      s"mirror kept hamming at ${hamming(base, flipped)} — hash not structural")
  }

  test("gallery PNGs roundtrip: decoded dHash equals the symbolic formula hash") {
    val got = MediaOps.galleryDHashes(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == Tables.documents(spark, sfDir).count())
    got.keys.take(25).foreach { id =>
      val expected = MediaOps.dHash64(
        gray(MediaOps.GalleryW, MediaOps.GalleryH)((x, y) =>
          MediaOps.galleryPixel(id, x, y)))
      assert(got(id) == expected,
        s"doc $id: PNG encode/decode must be lossless for the gray texture")
    }
  }

  test("gallery plants near-dup structure: same prototype within 7 bits, cross-prototype beyond") {
    val hs = MediaOps.galleryDHashes(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byProto = hs.groupBy(_._1 % MediaOps.GalleryProtos)
    byProto.values.foreach { members =>
      for (Seq((_, ha), (_, hb)) <- members.toSeq.combinations(2))
        assert(hamming(ha, hb) <= 7, "within-prototype pair beyond threshold")
    }
    // spot-check cross-prototype distances clear the threshold
    val protos = byProto.keys.toSeq.sorted.take(6)
    for (Seq(p, q) <- protos.combinations(2)) {
      val d = hamming(byProto(p).head._2, byProto(q).head._2)
      assert(d > 7, s"prototypes $p/$q collide at hamming $d")
    }
  }

  test("q157 keeps exactly one survivor per duplicate prototype, the min id") {
    val rows = graft.queries.MultimodalQueries.q157ImageDhashNeardup
      .fn(spark, sfDir).collect()
    val n = Tables.documents(spark, sfDir).count()
    assert(rows.length == n, "survivorship output is linear in the corpus")
    val kept = rows.filter(_.getAs[Boolean]("keep")).map(_.getLong(0)).sorted
    assert(kept.length == MediaOps.GalleryProtos,
      s"expected one survivor per prototype, got ${kept.length}")
    // the deterministic survivor is the minimum id of its prototype
    val minByProto = rows.map(_.getLong(0))
      .groupBy(_ % MediaOps.GalleryProtos).values.map(_.min).toSeq.sorted
    assert(kept.toSeq == minByProto)
    rows.filterNot(_.getAs[Boolean]("keep")).foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("dup_of")) &&
        r.getAs[Long]("dup_of") < r.getLong(0),
        "every dropped image names a lower-id near-dup")
    }
  }

  test("WAV roundtrip: synthesized RIFF blob parses back to the exact waveform") {
    Seq(2L, 7L, 12L, 57L, 102L).foreach { id =>
      val blob = MediaOps.syntheticWav(id)
      // genuine container: magic + canonical 44-byte header
      assert(new String(blob.slice(0, 4), "US-ASCII") == "RIFF")
      assert(new String(blob.slice(8, 12), "US-ASCII") == "WAVE")
      val (rate, pcm) = MediaOps.parseWav(blob)
      assert(rate == MediaOps.audioRate(id))
      assert(pcm.length == MediaOps.audioLen(id))
      pcm.indices.foreach { t =>
        assert(pcm(t) == MediaOps.audioSample(id, t),
          s"doc $id sample $t: parsed ${pcm(t)} != formula")
      }
    }
  }

  test("parseWav walks chunks: unknown chunk before data is skipped, malformed blob rejected") {
    val id = 7L
    val base = MediaOps.syntheticWav(id)
    // splice a LIST chunk between fmt and data (offset 36 = end of fmt)
    val extra = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
    val spliced = base.slice(0, 36) ++ extra.array() ++ base.drop(36)
    val (rate, pcm) = MediaOps.parseWav(spliced)
    assert(rate == MediaOps.audioRate(id) && pcm.length == MediaOps.audioLen(id),
      "chunk walk must skip unknown chunks and still find data")
    intercept[IllegalArgumentException] {
      MediaOps.parseWav("NOTAWAVEFILE0000".getBytes("US-ASCII"))
    }
    // RIFF even-byte padding: an ODD-sized ancillary chunk carries one
    // pad byte outside its declared size — the walk must advance by
    // sz + (sz & 1) or every later chunk misaligns (round-11 ADVICE)
    val odd = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    odd.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put("INF".getBytes("US-ASCII")).put(0.toByte) // 3 bytes + pad
    val oddSpliced = base.slice(0, 36) ++ odd.array() ++ base.drop(36)
    val (rate2, pcm2) = MediaOps.parseWav(oddSpliced)
    assert(rate2 == MediaOps.audioRate(id) && pcm2.sameElements(pcm),
      "odd-sized chunk must advance past its RIFF pad byte")
    // a chunk whose declared size overruns the buffer is a TRUNCATED
    // blob: loud require, never a BufferUnderflowException
    val truncated = base.slice(0, base.length - 10)
    val e = intercept[IllegalArgumentException] {
      MediaOps.parseWav(truncated)
    }
    assert(e.getMessage.contains("corrupt WAV"), e.getMessage)
    // a fmt chunk DECLARING fewer than the 16 PCM-field bytes the
    // branch reads (sz=8 with exactly 8 bytes remaining) passes the
    // generic sz<=remaining check yet used to underflow anyway
    // (round-12 advisor find): must be the loud require instead
    val shortFmt = java.nio.ByteBuffer.allocate(28)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    shortFmt.put("RIFF".getBytes("US-ASCII")).putInt(20)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(8)
      .putLong(0L) // 8 declared bytes, buffer ends here
    val e2 = intercept[IllegalArgumentException] {
      MediaOps.parseWav(shortFmt.array())
    }
    assert(e2.getMessage.contains("corrupt WAV"), e2.getMessage)
  }

  test("Y4M roundtrip: synthesized stream parses back to the exact planes") {
    Seq(3L, 8L, 13L, 58L, 103L).foreach { id =>
      val blob = MediaOps.syntheticY4m(id)
      assert(new String(blob.slice(0, 9), "US-ASCII") == "YUV4MPEG2")
      val (w, h, frames) = MediaOps.parseY4m(blob)
      assert(w == MediaOps.VideoW && h == MediaOps.VideoH)
      assert(frames.length == MediaOps.videoFrames(id))
      frames.zipWithIndex.foreach { case (plane, f) =>
        for (y <- 0 until h; x <- 0 until w)
          assert((plane(y * w + x) & 0xff) == MediaOps.videoPixel(id, f, x, y),
            s"doc $id frame $f pixel ($x,$y)")
      }
    }
    intercept[IllegalArgumentException] {
      MediaOps.parseY4m("AVI1 nope\n".getBytes("US-ASCII"))
    }
  }

  test("q212 scene cuts match the planted 8-frame plateau boundaries") {
    val rows = Registry.byName("q212_video_framesample").fn(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(MediaOps.isVideoId(id), s"non-video doc $id in output")
      val nf = MediaOps.videoFrames(id)
      // sampled frames f = 0,2,..; a cut fires on every sampled pair
      // (f-2, f) whose 8-frame scene index changes — by construction
      // |diff| >= 94 there and exactly 2 within a scene
      val sampled = 0 until nf by MediaOps.VideoSampleEvery
      val expectCuts = sampled.drop(1)
        .count(f => (f - MediaOps.VideoSampleEvery) / 8 != f / 8).toLong
      assert(r.getAs[Long]("n_cuts") == expectCuts,
        s"doc $id: n_cuts ${r.getAs[Long]("n_cuts")} != $expectCuts")
      assert(r.getAs[Long]("n_sampled") == sampled.size.toLong)
      // cross-cut SAD dominates within-scene SAD by design
      assert(r.getAs[Long]("peak_sad") >= 94L * MediaOps.VideoW * MediaOps.VideoH)
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("q211 silent frames match the planted zero-stretch arithmetic") {
    val rows = Registry.byName("q211_audio_framesample").fn(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(MediaOps.isAudioId(id), s"non-audio doc $id in output")
      val zlen = MediaOps.audioZeroLen(id)
      val n = MediaOps.audioLen(id)
      // frames fully inside the EFFECTIVE zero region [3072,
      // min(3072+zlen, n)) — the stretch is clipped by the signal end
      // for short docs: starts at 3072 (128-aligned) stepping 128
      // while start+256 stays inside the region
      val upper = math.min(3072 + zlen, n)
      val expectSilent = math.max(0, (upper - 3072 - 256) / 128 + 1).toLong
      assert(r.getAs[Long]("n_silent") == expectSilent,
        s"doc $id: n_silent ${r.getAs[Long]("n_silent")} != $expectSilent (zlen $zlen)")
      assert(r.getAs[Long]("peak_energy") > 0 &&
        r.getAs[Long]("total_energy") >= r.getAs[Long]("peak_energy"))
      assert(r.getInt(1) == MediaOps.audioRate(id),
        "sample_rate must come from the parsed header")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("q240 fingerprints match a driver-side energy recompute and are perturbation-invariant") {
    val rows = Registry.byName("q240_audio_fingerprint_neardup").fn(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // driver-side recompute straight from the synthesis formula — the
    // engine must reach the same bits THROUGH the WAV parse
    def fpOf(id: Long): Long = {
      val n = MediaOps.GalleryLen
      val nf = (n - 256) / 128 + 1
      val e = (0 until nf).map { f =>
        (f * 128 until f * 128 + 256)
          .map(t => math.abs(MediaOps.gallerySample(id, t).toLong)).sum
      }
      (0 until math.min(30, nf - 1)).foldLeft(0L) { (acc, f) =>
        if (e(f + 1) > e(f)) acc | (1L << f) else acc
      }
    }
    val byProto = rows.groupBy(r => MediaOps.galleryProto(r.getLong(0)))
    rows.foreach { r =>
      assert(r.getAs[Long]("fp") == fpOf(r.getLong(0)),
        s"doc ${r.getLong(0)}: engine fingerprint != synthesis recompute")
      assert(r.getAs[Long]("n_frames") == 31L)
    }
    // same prototype => identical fingerprints (perturbation cannot
    // flip a delta sign); different prototypes => hamming >= 8 (the
    // 7-periodic pattern shift bound), far above the <=3 dup bar
    byProto.foreach { case (p, grp) =>
      assert(grp.map(_.getAs[Long]("fp")).distinct.length == 1,
        s"proto $p fingerprints must collapse")
      val keeper = grp.map(_.getLong(0)).min
      grp.foreach(r => assert(r.getAs[Long]("dup_of") == keeper,
        s"survivorship must pick the min id of proto $p"))
      assert(grp.count(_.getAs[Int]("keep") == 1) == 1)
    }
    val protos = byProto.keys.toSeq.sorted
    for (a <- protos; b <- protos if a < b) {
      val d = java.lang.Long.bitCount(
        byProto(a).head.getAs[Long]("fp") ^ byProto(b).head.getAs[Long]("fp"))
      assert(d >= 8, s"protos $a/$b hamming $d — must be far above the dup bar")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("q252 modality budget: parsed frame/patch tokens match the synthesis formulas exactly") {
    val out = Registry.byName("q252_modality_budget").fn(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    assert(out.keySet == Set("text", "image", "audio", "video"))
    // ground truth from doc ids + synthesis formulas (the ENGINE side
    // reaches the same numbers through the real WAV/Y4M parses)
    val ids = Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val img = ids.filter(i => (i / 7) % 4 == 0)
    val aud = ids.filter(_ % 5 == 2)
    val vid = ids.filter(_ % 5 == 3)
    assert(out("text")._1 == ids.length)
    assert(out("image")._1 == img.length && out("audio")._1 == aud.length
      && out("video")._1 == vid.length)
    def imgTok(i: Long) = ((i % 13 + 3 + 1) / 2) * ((i % 7 + 3 + 1) / 2)
    def audTok(i: Long) = (4096 + (i % 7) * 512 - 256) / 128 + 1
    def vidTok(i: Long) = (24 + (i % 9) * 4) * 12
    assert(out("image")._2 == img.map(imgTok).sum,
      s"image patch tokens: ${out("image")._2}")
    assert(out("audio")._2 == aud.map(audTok).sum,
      s"audio frame tokens: ${out("audio")._2}")
    assert(out("video")._2 == vid.map(vidTok).sum,
      s"video frame-patch tokens: ${out("video")._2}")
    // text tokens: driver recompute of the whitespace-token convention
    val textTok = Tables.documents(spark, sfDir).select(col("text")).collect()
      .map(r => if (r.isNullAt(0)) 0L
        else r.getString(0).split(" ").count(_.nonEmpty).toLong).sum
    assert(out("text")._2 == textTok, s"text tokens: ${out("text")._2}")
    // shares: integer-bp floors sum to at most 10000 and within 4 of it
    val shareSum = out.values.map(_._3).sum
    assert(shareSum <= 10000 && shareSum > 10000 - 4, s"share sum $shareSum")
    // dev is share - target by construction
    val targets = Map("text" -> 7000L, "image" -> 1000L,
      "audio" -> 1000L, "video" -> 1000L)
    out.foreach { case (m, (_, _, share, dev)) =>
      assert(dev == share - targets(m), s"$m dev mismatch")
    }
    spark.sharedState.cacheManager.clearCache()
  }
}
