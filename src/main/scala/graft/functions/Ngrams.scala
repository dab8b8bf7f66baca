package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Map-side word n-gram streams over the suite's single-space token
  * convention — `posexplode(arrays_zip(w, slice(w,2,·), slice(w,3,·)))`
  * instead of the historical posexplode + window-`lead` form.
  *
  * The zipped-slice build is ordinary codegen-capable projection
  * (slice / arrays_zip / generate), so the n-gram stream is produced
  * IN the scan stage with no shuffle at all, where the window form
  * first shuffled and sorted the ENTIRE exploded token stream by
  * doc_id. Downstream groupBys then shuffle aggregated partials only
  * — at cluster scale the removed exchange is the whole token stream
  * (≈ corpus bytes). Measured at sf0.1 (documents, local[32]): counted
  * trigram postings 0.69 → 0.55 s steady-state, identical rows.
  *
  * (The round-9 finding that array-HOF n-gram builds run 5–30× slower
  * interpreted was about LambdaFunction HOFs — `transform`/`aggregate`
  * per position; `arrays_zip` and `slice` are plain expressions.)
  *
  * Row-for-row identical to the window form: n-gram i = tokens
  * (i, …, i+n−1) in document order; the zip pads the shifted slices
  * with trailing nulls, which the not-null filter on the last token
  * drops — exactly the window form's `lead(..) IS NOT NULL` rows.
  * Docs with < n tokens contribute nothing; null text explodes away.
  */
object Ngrams {

  /** The suite's tokenizer: split on single space, drop empties. */
  def toks(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  private def zipped2(w: Column): Column =
    arrays_zip(w.as("t"),
      slice(w, lit(2), greatest(size(w) - 1, lit(0))).as("t1"))

  private def zipped3(w: Column): Column =
    arrays_zip(w.as("t"),
      slice(w, lit(2), greatest(size(w) - 1, lit(0))).as("t1"),
      slice(w, lit(3), greatest(size(w) - 2, lit(0))).as("t2"))

  /** (doc_id, t, t1) bigram stream of `docs(doc_id, text)`. */
  def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(zipped2(toks(col("text")))).as("z"))
      .filter(col("z.t1").isNotNull)
      .select(col("doc_id"), col("z.t").as("t"), col("z.t1").as("t1"))

  /** (doc_id, t, t1, t2) trigram stream of `docs(doc_id, text)`. */
  def trigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(zipped3(toks(col("text")))).as("z"))
      .filter(col("z.t2").isNotNull)
      .select(col("doc_id"), col("z.t").as("t"),
        col("z.t1").as("t1"), col("z.t2").as("t2"))

  /** (doc_id, p, t, t1, t2) trigram stream with the 0-based position
    * of the n-gram's first token (the old posexplode `p`).
    */
  def trigramsPos(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(zipped3(toks(col("text")))).as(Seq("p", "z")))
      .filter(col("z.t2").isNotNull)
      .select(col("doc_id"), col("p"), col("z.t").as("t"),
        col("z.t1").as("t1"), col("z.t2").as("t2"))
}
