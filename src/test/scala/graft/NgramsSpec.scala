package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Ngrams

/** Pins the round-17 map-side n-gram build ([[graft.functions.Ngrams]]
  * — zipped shifted slices) row-for-row against the historical
  * window-`lead` form it replaced, on exactly the shapes where they
  * could diverge: documents with fewer tokens than the n-gram width,
  * empty/whitespace-only text, nulls, repeated tokens, and multiple
  * spaces (the suite's toks convention drops empties).
  */
class NgramsSpec extends SparkSpec {

  private def docsOf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val edgeDocs = Seq(
    1L -> "a b c d e",
    2L -> "a b c",        // exactly one trigram
    3L -> "a b",          // bigram only
    4L -> "a",            // nothing
    5L -> "",             // nothing
    6L -> "   ",          // whitespace-only: toks drops empties
    7L -> null.asInstanceOf[String], // null text: explodes away
    8L -> "x x x x",      // repeated tokens
    9L -> "a  b   c")     // multi-space: tokens are a,b,c

  private def leadTrigrams(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    docs
      .select(col("doc_id"), posexplode(Ngrams.toks(col("text"))).as(Seq("p", "t")))
      .select(col("doc_id"), col("p"), col("t"),
        lead(col("t"), 1).over(w).as("t1"), lead(col("t"), 2).over(w).as("t2"))
      .filter(col("t2").isNotNull)
  }

  private def leadBigrams(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    docs
      .select(col("doc_id"), posexplode(Ngrams.toks(col("text"))).as(Seq("p", "t")))
      .select(col("doc_id"), col("p"), col("t"),
        lead(col("t"), 1).over(w).as("t1"))
      .filter(col("t1").isNotNull)
  }

  private def assertSameMultiset(a: DataFrame, b: DataFrame): Unit = {
    val cols = a.columns.map(col).toSeq
    val diff = a.groupBy(cols: _*).agg(count(lit(1)).as("n"))
      .union(b.groupBy(cols: _*).agg(count(lit(1)).as("n")))
      .groupBy((a.columns :+ "n").map(col).toSeq: _*)
      .agg(count(lit(1)).as("k")).filter(col("k") =!= 2)
    assert(diff.isEmpty, s"multiset mismatch: ${diff.collect().mkString(", ")}")
  }

  test("trigrams matches the window-lead form on edge documents") {
    val docs = docsOf(edgeDocs)
    assertSameMultiset(
      Ngrams.trigrams(docs).select(col("doc_id"), col("t"), col("t1"), col("t2")),
      leadTrigrams(docs).select(col("doc_id"), col("t"), col("t1"), col("t2")))
  }

  test("trigramsPos keeps the posexplode position of the first token") {
    val docs = docsOf(edgeDocs)
    assertSameMultiset(
      Ngrams.trigramsPos(docs)
        .select(col("doc_id"), col("p"), col("t"), col("t1"), col("t2")),
      leadTrigrams(docs)
        .select(col("doc_id"), col("p"), col("t"), col("t1"), col("t2")))
  }

  test("bigrams matches the window-lead form on edge documents") {
    val docs = docsOf(edgeDocs)
    assertSameMultiset(
      Ngrams.bigrams(docs).select(col("doc_id"), col("t"), col("t1")),
      leadBigrams(docs).select(col("doc_id"), col("t"), col("t1")))
  }

  test("trigrams matches the window-lead form on the sf0.001 corpus") {
    val docs = Tables.documents(spark, sfDir)
    assertSameMultiset(
      Ngrams.trigrams(docs).select(col("doc_id"), col("t"), col("t1"), col("t2")),
      leadTrigrams(docs).select(col("doc_id"), col("t"), col("t1"), col("t2")))
  }

  test("shinglePostingsOf output is hash-clustered by doc_id (no extra exchange)") {
    // the round-17 contract: the docs repartition is the subtree's
    // ONLY exchange — distinct and downstream per-doc groupBys reuse it
    val posts = graft.queries.DedupQueries.shinglePostingsOf(
      Tables.documents(spark, sfDir))
    val plan = posts.groupBy(col("doc_id")).count()
      .queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange (docs by doc_id), got $exchanges:\n$plan")
  }
}
