package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions

/** Pins the round-4 hygiene/quantization surfaces: the native
  * unicode_normalize and quantize_i8 expressions (unit semantics the
  * oracle only exercises for one form), quantized-search quality vs
  * the float baseline, and the decontamination plan shape.
  */
class HygieneSpec extends SparkSpec {

  test("unicode_normalize NFC composes and NFKC expands ligatures") {
    GraftFunctions.register(spark)
    val dec = "cafe\u0301"   // decomposed: e + combining acute
    val pre = "caf\u00e9"    // precomposed
    val lig = "\ufb01sh"     // fi ligature: NFC keeps, NFKC expands
    val df = spark.createDataFrame(Seq(
      Tuple1(dec), Tuple1("plain ascii"), Tuple1(lig)
    )).toDF("s")
      .select(col("s"),
        GraftFunctions.unicodeNormalize(col("s"), "NFC").as("nfc"),
        GraftFunctions.unicodeNormalize(col("s"), "NFD").as("nfd"),
        GraftFunctions.unicodeNormalize(col("s"), "NFKC").as("nfkc"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    val byIn = rows.map(t => t._1 -> t).toMap
    assert(byIn(dec)._2 == pre, "NFC must compose e+U+0301")
    assert(byIn(dec)._3 == dec, "NFD keeps the decomposed form")
    assert(byIn("plain ascii")._2 == "plain ascii")
    assert(byIn(lig)._2 == lig, "NFC preserves compatibility ligature")
    assert(byIn(lig)._4 == "fish", "NFKC expands compatibility ligature")
  }

  test("unicode_normalize rejects an unknown form at analysis time") {
    GraftFunctions.register(spark)
    val e = intercept[AnalysisException] {
      spark.sql("SELECT unicode_normalize('x', 'NFX')").collect()
    }
    assert(e.getMessage.contains("NFC"), s"unexpected: ${e.getMessage}")
  }

  test("unicode_normalize is null-safe") {
    GraftFunctions.register(spark)
    val out = spark.sql("SELECT unicode_normalize(CAST(NULL AS STRING), 'NFC')").collect()
    assert(out.head.isNullAt(0))
  }

  test("quantize_i8 emits integers in [-127, 127] with max-abs hitting ±127") {
    GraftFunctions.register(spark)
    val q = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), explode(GraftFunctions.quantizeI8(col("embedding"))).as("x"))
    val bad = q.filter(col("x") =!= floor(col("x")) ||
      abs(col("x")) > 127).count()
    assert(bad == 0, "quantized components must be integers within int8 range")
    // every vector's max |component| is exactly 127 (max-abs scaling)
    val maxes = q.groupBy(col("vec_id")).agg(max(abs(col("x"))).as("m"))
      .filter(col("m") =!= 127.0).count()
    assert(maxes == 0, "max-abs scaling must map the largest component to ±127")
  }

  test("quantized top-10 retains high recall vs the float baseline") {
    def topSets(name: String): Map[Long, Set[Long]] =
      Registry.byName(name).fn(spark, sfDir)
        .filter(col("q_id") < 10)
        .select(col("q_id"), col("n_id"))
        .collect().groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
    val exact = topSets("q38_cosine_topk")
    val quant = topSets("q76_quantized_topk")
    assert(exact.nonEmpty && quant.keySet == exact.keySet)
    val recall = exact.map { case (q, want) =>
      quant(q).intersect(want).size.toDouble / want.size
    }.sum / exact.size
    assert(recall >= 0.9, s"int8 quantization recall@10 too low: $recall")
  }

  test("vector_sum aggregates element-wise and rejects mixed dimensions") {
    GraftFunctions.register(spark)
    val df = spark.createDataFrame(Seq(
      (1, Seq(1.0f, 2.0f)), (1, Seq(3.0f, 4.0f)), (2, Seq(5.0f, 6.0f))
    )).toDF("g", "v")
    val out = df.groupBy(col("g"))
      .agg(GraftFunctions.vectorSum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(1) == Seq(4.0, 6.0) && out(2) == Seq(5.0, 6.0))
    // partial+final ObjectHashAggregate (map-side combine before the exchange)
    val plan = df.groupBy(col("g"))
      .agg(GraftFunctions.vectorSum(col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    val bad = spark.createDataFrame(Seq(
      (1, Seq(1.0f)), (1, Seq(1.0f, 2.0f)))).toDF("g", "v")
    val e = intercept[Exception] {
      bad.groupBy(col("g")).agg(GraftFunctions.vectorSum(col("v"))).collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("dimension mismatch"))
  }

  test("q72 decontamination: benchmark slice docs never appear in the output") {
    val out = Registry.byName("q72_decontamination").fn(spark, sfDir)
    assert(out.filter(col("doc_id") % 20 === 7).count() == 0)
    assert(out.filter(col("n_hits") > col("n_ngrams")).count() == 0)
  }

  test("q72 decontamination broadcasts the benchmark n-gram set") {
    val plan = Registry.byName("q72_decontamination").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side should be broadcast, got:\n$plan")
  }

  test("q73 keep flag equals its component thresholds") {
    val bad = Registry.byName("q73_repetition_quality").fn(spark, sfDir)
      .filter(
        (col("keep") === 1) =!= (col("top_word_bps") < 1500 && col("top_bigram_bps") < 800))
      .count()
    assert(bad == 0)
  }

  test("q74 redaction output contains no unredacted emails or phones") {
    val out = Registry.byName("q74_pii_redaction").fn(spark, sfDir)
    assert(out.filter(col("redacted_tail").rlike("@")
      && !col("redacted_tail").contains("<EMAIL>")).count() == 0)
    assert(out.filter(col("redacted_tail").rlike("555-[0-9]{4}")).count() == 0)
    assert(out.filter(col("n_emails") < 1 || col("n_phones") < 1).count() == 0,
      "every synthesized doc carries at least one email and one phone")
  }

  test("q150 duplicated-span coverage matches a driver-side interval-union recompute") {
    val rows = Registry.byName("q150_span_dedup").fn(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.nonEmpty)
    // brute force: count span occurrences corpus-wide, union covered
    // intervals per doc with a plain sweep
    val K = 8
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val occ = scala.collection.mutable.Map.empty[String, Int]
    for ((_, w) <- docs; i <- 0 to w.length - K)
      occ.updateWith(w.slice(i, i + K).mkString(" "))(c => Some(c.getOrElse(0) + 1))
    for ((id, w) <- docs if w.nonEmpty) {
      val starts = (0 to w.length - K)
        .filter(i => occ(w.slice(i, i + K).mkString(" ")) >= 2)
      val covered = starts.flatMap(i => i until i + K).distinct.size.toLong
      val (nTok, dupTok, dupBp) = rows(id)
      assert(nTok == w.length.toLong, s"n_tokens mismatch doc $id")
      assert(dupTok == covered, s"coverage mismatch doc $id: $dupTok != $covered")
      assert(dupBp == math.floor(10000.0 * covered / w.length).toLong,
        s"dup_bp mismatch doc $id")
    }
    // the fixture corpus must actually exercise the dup path
    assert(rows.values.exists(_._2 > 0), "no duplicated spans in fixture corpus")
  }

  test("q150 plans no corpus self-join: dup detection is count-then-semi-join") {
    val plan = Registry.byName("q150_span_dedup").fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "span dedup must never plan a cartesian join")
    assert(plan.contains("LeftSemi"),
      "duplicated spans should flow back via a semi join on the span key")
  }

  test("q151 DSIR weights: flag consistency and target slice scores higher") {
    val out = Registry.byName("q151_dsir_weights").fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(4) == (r.getLong(3) >= 0L),
        s"targetlike flag inconsistent: $r")
      assert(r.getLong(2) > 0, s"doc with zero scored tokens: $r")
    }
    // model sanity: the mean importance weight of the target slice
    // (en) must exceed the mean weight of every other language — the
    // defining property of an importance-resampling score fit ON that
    // slice. Per-token averaging removes doc-length confounds.
    val byLang = out.groupBy(_.getString(1)).map { case (l, rs) =>
      l -> rs.map(r => r.getLong(3).toDouble / r.getLong(2)).sum / rs.size
    }
    val en = byLang("en")
    byLang.filter(_._1 != "en").foreach { case (l, avg) =>
      assert(en > avg, s"target slice en ($en) not above $l ($avg)")
    }
  }
}
