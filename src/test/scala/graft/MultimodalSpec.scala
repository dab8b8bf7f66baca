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

  test("sampleFrames slices blobs into strided frames") {
    val m = MediaOps.synthesizeMedia(spark, sfDir).toDF()
    val frames = MediaOps.sampleFrames(m, frameBytes = 48, stride = 2)
    assert(frames.count() > 0)
    // every kept frame index is a multiple of the stride
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() == 0)
  }
}
