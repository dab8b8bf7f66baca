package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Ranked retrieval over `documents` (SURVEY.md §2.2 EXT "text
  * analysis" family): BM25 scoring — the standard probabilistic
  * ranking function (Robertson et al., TREC-3) and the default scorer
  * in Lucene/Elasticsearch. Extends the q55 TF-IDF family with
  * length-normalized term saturation.
  *
  * Scale shape: the query term set is tiny and FIXED, so per-term
  * term frequencies are array HOFs evaluated per row — the corpus is
  * scanned ONCE with no explode and no (doc, term) shuffle at all.
  * The only aggregate is the global stats row (N, Σdl, per-term df):
  * a single partial+final aggregate producing ONE row, broadcast back
  * into the scoring scan. Top-k is sort+limit (TakeOrderedAndProject:
  * per-partition top-k, k-row merge — never a global sort of the
  * corpus).
  *
  * Determinism: the per-doc score is ONE fixed-shape expression
  * (idf1·s1 + idf2·s2 + idf3·s3, left-associated identically in both
  * engines) — there is no floating SUM across rows anywhere, so
  * summation order cannot diverge. Ranking uses the unrounded double
  * (the q55 convention); output rounds at 4dp for the hash compare.
  */
object RetrievalQueries {

  private def toks(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** BM25 parameters — the universal defaults. */
  private val K1 = 1.2
  private val B = 0.75

  private val QueryTerms = Seq("spark", "window", "join")

  val q114Bm25 = {
    // DuckDB twin: identical expression structure, term order, and
    // left-associated additions.
    val tfSql = QueryTerms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(w, x -> x = '$t')) AS tf${i + 1}"
    }.mkString(",\n      |    ")
    val dfSql = QueryTerms.indices.map { i =>
      s"CAST(sum(CASE WHEN tf${i + 1} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df${i + 1}"
    }.mkString(",\n      |    ")
    val scoreSql = QueryTerms.indices.map { i =>
      val n = i + 1
      s"""ln(1.0 + (n_docs - df$n + 0.5) / (df$n + 0.5))
         |      * (tf$n * ${K1 + 1.0}) / (tf$n + $K1 * (1.0 - $B + $B * dl * n_docs / sum_dl))"""
        .stripMargin
    }.mkString("\n      |    + ")
    QueryDef(
      "q114_bm25",
      "BM25 ranked retrieval: top-20 documents for a fixed 3-term query, single corpus scan, no (doc,term) shuffle",
      s"""WITH per AS (
        |  SELECT doc_id, len(w) AS dl,
        |    $tfSql
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS w
        |        FROM documents)),
        |stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(dl) AS BIGINT) AS sum_dl,
        |    $dfSql
        |  FROM per),
        |scored AS (
        |  SELECT doc_id,
        |    $scoreSql
        |    AS score
        |  FROM per, stats)
        |SELECT doc_id, round(score, 4) AS bm25, rn FROM (
        |  SELECT doc_id, score,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rn
        |  FROM scored)
        |WHERE rn <= 20
        |ORDER BY rn""".stripMargin) { (s, d) =>
      val per = Tables.documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("w"))
        .select(
          col("doc_id") +: size(col("w")).as("dl") +:
            QueryTerms.zipWithIndex.map { case (t, i) =>
              size(filter(col("w"), x => x === t)).as(s"tf${i + 1}")
            }: _*)
      val statsCols = count(lit(1)).as("n_docs") +:
        sum(col("dl")).as("sum_dl") +:
        QueryTerms.indices.map { i =>
          sum(when(col(s"tf${i + 1}") > 0, 1L).otherwise(0L))
            .as(s"df${i + 1}")
        }
      val stats = per.agg(statsCols.head, statsCols.tail: _*)
      // one fixed-shape expression, left-associated like the SQL —
      // no floating aggregate anywhere
      val score = QueryTerms.indices.map { i =>
        val tf = col(s"tf${i + 1}").cast("double")
        val df = col(s"df${i + 1}").cast("double")
        val idf = log(lit(1.0) +
          (col("n_docs") - df + lit(0.5)) / (df + lit(0.5)))
        idf * (tf * lit(K1 + 1.0)) /
          (tf + lit(K1) * (lit(1.0 - B) +
            lit(B) * col("dl") * col("n_docs") / col("sum_dl")))
      }.reduceLeft(_ + _)
      per.crossJoin(broadcast(stats))
        .withColumn("score", score)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
        .withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("doc_id"))).cast("int"))
        .select(col("doc_id"), round(col("score"), 4).as("bm25"), col("rn"))
        .orderBy(col("rn"))
    }
  }

  val all: Seq[QueryDef] = Seq(q114Bm25)
}
