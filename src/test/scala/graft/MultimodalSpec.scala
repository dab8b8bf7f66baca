package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MediaOps

/** Multimodal pipeline plumbing: deterministic synthetic blobs,
  * stub-decode feature extraction, frame sampling. The decode kernel
  * is a stub (no codecs in this container) — these tests pin the
  * dataflow semantics so swapping the kernel can't silently break
  * schema/partitioning.
  */
class MultimodalSpec extends SparkSpec {

  test("synthesized media carries blob + typed metadata per doc") {
    val m = MediaOps.synthesizeMedia(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).count()
    assert(m.count() == docs)
    val r = m.head()
    assert(r.blob.nonEmpty && r.mime == "image/fake" && r.width > 0 && r.height > 0)
  }

  test("decodeFeatures is deterministic and consistent with blob bytes") {
    val m = MediaOps.synthesizeMedia(spark, sfDir)
    val f = MediaOps.decodeFeatures(spark, m)
    val joined = f.toDF().join(m.toDF().select(col("doc_id"), col("blob")), "doc_id")
    joined.collect().foreach { r =>
      val blob = r.getAs[Array[Byte]]("blob")
      val hist = r.getAs[scala.collection.Seq[Long]]("hist")
      assert(r.getAs[Long]("n_bytes") == blob.length)
      assert(hist.sum == blob.length, "histogram buckets must cover every byte")
      val mean = blob.map(_ & 0xff).sum.toDouble / blob.length
      assert(math.abs(r.getAs[Double]("mean_byte") - mean) < 1e-9)
    }
  }

  test("featureStats groups decoded features per source") {
    val stats = MediaOps.featureStats(spark, sfDir)
    val srcs = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(stats.count() == srcs)
    assert(stats.columns.toSeq ==
      Seq("source", "n_media", "total_bytes", "avg_mean_byte"))
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
