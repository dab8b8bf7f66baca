package graft

import graft.api.BpeTrainer
import graft.api.BpeTrainer.Merge

/** Pins the distributed BPE trainer to a brute-force single-machine
  * reference implementation (classic Sennrich-style loop over a word
  * frequency map) — learned merges must match EXACTLY, in order.
  */
class BpeTrainerSpec extends SparkSpec {

  /** Reference BPE: plain Scala, no Spark. */
  private def refTrain(words: Map[String, Long], k: Int): Seq[Merge] = {
    var vocab = words.toSeq.map { case (w, n) =>
      (w.map(_.toString).toList: Seq[String], n)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    for (rank <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), cnt) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += Merge(rank, l, r, cnt)
        vocab = vocab.map { case (syms, n) =>
          (BpeTrainer.applyMerge(syms, l, r), n)
        }
      }
    }
    out.toSeq
  }

  test("applyMerge is left-to-right single-pass (aaa + (a,a) -> [aa, a])") {
    assert(BpeTrainer.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(BpeTrainer.applyMerge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(BpeTrainer.applyMerge(Seq("x", "a", "a", "y"), "a", "a") == Seq("x", "aa", "y"))
    assert(BpeTrainer.applyMerge(Seq("aa", "a", "a"), "aa", "a") == Seq("aaa", "a"))
  }

  test("distributed trainer learns exactly the reference merges on a known corpus") {
    import spark.implicits._
    val corpus = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest",
      "widest widest widest").toDF("text")
    val wordFreq = Map(
      "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val want = refTrain(wordFreq, 8)
    val got = BpeTrainer.train(corpus, "text", 8)
    assert(got == want, s"\n got=$got\nwant=$want")
    // sanity on the classic example: 'es' (or 'e s' family) merges early
    assert(got.head.count == want.head.count)
  }

  test("trainer matches reference on sf0.001 documents (20 merges)") {
    val docs = Tables.documents(spark, sfDir)
    import org.apache.spark.sql.functions._
    val freq = docs
      .select(explode(filter(split(col("text"), " "), t => length(t) > 0)).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refTrain(freq, 20)
    val got = BpeTrainer.train(docs, "text", 20)
    assert(got == want)
  }

  test("merge loop launches ZERO Spark jobs after the single vocab collect") {
    import spark.implicits._
    val corpus = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest",
      "widest widest widest").toDF("text").localCheckpoint()

    def jobsDuring(body: => Unit): Long = {
      val n = new java.util.concurrent.atomic.AtomicLong(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          n.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        // listener delivery is async: wait until the count quiesces.
        var last = -1L
        var spins = 0
        while (last != n.get() && spins < 20) {
          last = n.get(); Thread.sleep(150); spins += 1
        }
      } finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }

    val j2 = jobsDuring(BpeTrainer.train(corpus, "text", 2))
    val j16 = jobsDuring(BpeTrainer.train(corpus, "text", 16))
    // cost is the one word-frequency collect, INDEPENDENT of merge
    // count — the driver-local loop never goes back to the cluster.
    assert(j16 == j2, s"job count grew with merges: $j2 -> $j16")
    assert(j2 <= 3, s"vocab collect should be a couple of jobs, got $j2")
  }

  test("trainLocal is insensitive to word-frequency input order") {
    val freq = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val a = BpeTrainer.trainLocal(freq, 8)
    val b = BpeTrainer.trainLocal(freq.reverse, 8)
    assert(a == b)
  }

  test("tokenCounts shrinks monotonically with more merges and joins back exactly") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val merges = BpeTrainer.train(docs, "text", 10)
    val n0 = BpeTrainer.tokenCounts(docs, "doc_id", "text", Seq.empty)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).first().getLong(0)
    val n10 = BpeTrainer.tokenCounts(docs, "doc_id", "text", merges)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).first().getLong(0)
    assert(n10 < n0, "applying merges must reduce total symbol count")
    assert(BpeTrainer.tokenCounts(docs, "doc_id", "text", merges).count() == 50)
  }

  test("encode round-trips the text, agrees with tokenCounts, survives repartitioning") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).limit(50)
    val merges = BpeTrainer.train(docs, "text", 12)
    val enc = BpeTrainer.encode(docs, "doc_id", "text", merges)
    // lossless: concatenated tokens == the text with spaces stripped
    val broken = enc.alias("e")
      .join(docs.alias("d"), col("e.doc_id") === col("d.doc_id"))
      .filter(concat_ws("", col("e.bpe_tokens")) =!=
        regexp_replace(col("d.text"), " ", ""))
      .count()
    assert(broken == 0, "encode lost or reordered characters")
    // token counts agree with the counting-only path
    val mismatch = enc
      .select(col("doc_id"), size(col("bpe_tokens")).cast("long").as("n_enc"))
      .join(BpeTrainer.tokenCounts(docs, "doc_id", "text", merges), "doc_id")
      .filter(col("n_enc") =!= col("n_bpe_tokens")).count()
    assert(mismatch == 0, "encode and tokenCounts disagree")
    // the per-partition word cache must not change results
    val a = enc.orderBy("doc_id").collect().map(_.toSeq)
    val b = BpeTrainer.encode(docs.repartition(7), "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b), "encoding depends on the partition layout")
  }
}
