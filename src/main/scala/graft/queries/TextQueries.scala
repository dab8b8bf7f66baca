package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.TextFunctions

/** The reference's one concrete job — Unicode word count
  * (`/root/reference/src/mapper.c:14-42` map, `reducer.c:23-38` reduce)
  * — plus the text-analysis extension operators over `documents`.
  */
object TextQueries {

  /** Word count: tokenize → explode → groupBy(word).count. The entire
    * reference pipeline (read → map → combine → shuffle → reduce) in
    * one declarative plan; Spark's partial+final HashAggregate is the
    * mapper combiner (mapper.c:75-88) + reducer merge (reducer.c:23-38).
    *
    * Case folding follows [[TextFunctions.FoldConf]]: default `full`
    * (JVM Unicode lowercase); `spark.graft.fold=simple` opts into the
    * 1:1 simple mapping (İ→i) that C `towlower` (the reference,
    * mapper.c:28) and DuckDB's utf8proc `lower()` apply — under it the
    * fuzz-unicode corpus hash-matches the oracle exactly.
    */
  val wordcount = QueryDef(
    "wordcount",
    "reference-parity word count over documents.text",
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+')) AS word
      |      FROM documents)
      |WHERE word <> ''
      |GROUP BY word
      |ORDER BY word""".stripMargin) { (s, d) =>
    val words =
      if (s.conf.get(TextFunctions.FoldConf, "full") == "simple")
        TextFunctions.explodeTokensSimple(col("text"))
      else TextFunctions.explodeTokens(col("text"))
    Tables.documents(s, d)
      .select(words.as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("word"))
  }

  val all: Seq[QueryDef] = Seq(wordcount)
}
