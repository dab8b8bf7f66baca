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
}
