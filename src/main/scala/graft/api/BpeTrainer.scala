package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING — the iterative merge-learning loop, not
  * just merge application. The reference pipeline tokenizes with a
  * fixed regex (q66); training the vocabulary itself is the one
  * tokenizer-side job a 100 TB corpus actually runs at corpus scale.
  *
  * Scale shape (the same one real trainers use): the corpus is
  * scanned ONCE to build the word-frequency table — one shuffle on
  * the word; every subsequent Lloyd-style iteration runs on that
  * compact vocabulary relation (distinct words × counts, millions of
  * rows at worst — orders of magnitude below corpus size), never on
  * the corpus again. Each iteration is:
  *
  *   1. explode each vocab word's current symbol sequence into
  *      adjacent pairs (weighted by word count) — a map-side explode;
  *   2. partial+final count per pair, `max_by` argmax with a total
  *      deterministic tie-break ((count DESC, pair ASC)) — ONE row to
  *      the driver (bounded metadata, like a range-sampler boundary);
  *   3. apply the learned merge to every vocab word (typed map over
  *      the vocab — per-row left-to-right merge semantics that SQL
  *      HOFs can't express, on vocab-sized data where a typed row op
  *      is the honest tool).
  *
  * The vocab Dataset is localCheckpointed every few merges so the
  * lineage (and replanning cost) stays O(1) per iteration instead of
  * O(iterations).
  */
object BpeTrainer {

  /** One learned merge: rank k means it was the k-th most frequent
    * adjacent pair (1-based), with its weighted count at learn time.
    */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Left-to-right single-pass application of one merge to a symbol
    * sequence — the sequential semantics BPE specifies ("aaa" with
    * merge (a,a) → ["aa","a"], not ["a","aa"]).
    */
  private[graft] def applyMerge(
      syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learns `nMerges` BPE merges from `df`'s `textCol` (whitespace
    * word pre-tokenization, character-level initial symbols).
    * Deterministic: ties broken by (left, right) ascending.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    val spark = df.sparkSession
    import spark.implicits._

    // corpus scan #1 and only: word-frequency table.
    var vocab: Dataset[(Seq[String], Long)] = df
      .select(explode(filter(split(col(textCol), " "), t => length(t) > 0))
        .as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => (w.map(_.toString).toList: Seq[String], n) }
      .localCheckpoint()

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    while (rank <= nMerges) {
      // adjacent-pair weighted counts over the vocab; argmax with a
      // total order so every engine/parallelism learns the same merge.
      val top = vocab
        .flatMap { case (syms, n) =>
          syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => (a, b, n) }
        }
        .toDF("l", "r", "n")
        .groupBy(col("l"), col("r")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (top.isEmpty) return merges.toSeq // every word fully merged
      val (l, r, cnt) = top.head
      merges += Merge(rank, l, r, cnt)
      vocab = vocab.map { case (syms, n) => (applyMerge(syms, l, r), n) }
      // bound lineage depth: re-root the vocab every 4 merges.
      if (rank % 4 == 0) vocab = vocab.localCheckpoint()
      rank += 1
    }
    merges.toSeq
  }

  /** Applies an ordered merge list to a corpus, emitting per-document
    * BPE token counts — the inference-side twin of [[train]], as one
    * distributed pass (merges broadcast as a plain captured Seq).
    */
  def tokenCounts(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.rank).map(m => (m.left, m.right))
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = text.split(" ").filter(_.nonEmpty)
        val n = words.iterator.map { w =>
          var syms: Seq[String] = w.map(_.toString).toSeq
          ordered.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
          syms.length.toLong
        }.sum
        (id, n)
      }
      .toDF(idCol, "n_bpe_tokens")
  }
}
