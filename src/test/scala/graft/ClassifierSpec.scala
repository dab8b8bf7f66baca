package graft

import org.apache.spark.sql.functions._

/** Semantics of the in-engine trained classifiers (q199 Naive Bayes):
  * exact driver-side recompute of the fit→apply pipeline plus a
  * separable-vocabulary fixture where the optimal answer is known.
  */
class ClassifierSpec extends SparkSpec {

  /** Driver-side multinomial NB with the exact q199 contract:
    * Laplace-smoothed micro log-probs (floor(1e6·ln p)), priors from
    * even-doc_id class counts, OOV tokens ignored, argmax with
    * (score desc, lang asc) tiebreak. Returns (doc_id, pred, score).
    */
  private def nbRecompute(dir: String): Map[Long, (String, Long)] = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] = t.split(" ").filter(_.nonEmpty).toSeq
    val train = docs.filter(_._1 % 2 == 0)
    val nAll = train.length.toLong
    val clsDocs = train.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cnt = train.flatMap { case (_, l, t) => toks(t).map((l, _)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ltot = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val vocab = cnt.keySet.map(_._2)
    val v = vocab.size.toLong
    val lp: Map[(String, String), Long] = (for {
      t <- vocab; l <- clsDocs.keys
    } yield (l, t) -> math.floor(1000000.0 *
      math.log((cnt.getOrElse((l, t), 0L) + 1.0) / (ltot(l) + v))).toLong).toMap
    val prior = clsDocs.map { case (l, n) =>
      l -> math.floor(1000000.0 * math.log(n.toDouble / nAll)).toLong
    }
    docs.filter(_._1 % 2 == 1).flatMap { case (id, _, t) =>
      val ts = toks(t).filter(vocab)
      if (ts.isEmpty) None
      else {
        val scores = clsDocs.keys.map { l =>
          l -> (ts.map(tk => lp((l, tk))).sum + prior(l))
        }.toSeq
        val (pl, ps) = scores.minBy { case (l, sc) => (-sc, l) }
        Some(id -> (pl, ps))
      }
    }.toMap
  }

  test("q199 matches a driver-side exact NB recompute") {
    val got = Registry.byName("q199_naive_bayes_langid").fn(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    val want = nbRecompute(sfDir)
    assert(got == want)
  }

  test("q199 output invariants: held-out rows, labels consistent, scores negative") {
    val rows = Registry.byName("q199_naive_bayes_langid").fn(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._1 % 2 == 1), "only held-out (odd) docs are scored")
    assert(rows.forall { case (_, lang, pred, _, c) =>
      c == (if (pred == lang) 1L else 0L)
    })
    // log-probs and log-priors are all negative micros
    assert(rows.forall(_._4 < 0L))
  }

  test("q199 separable-vocabulary fixture classifies perfectly") {
    import spark.implicits._
    // two classes with disjoint vocabularies; train = even ids,
    // held-out = odd ids. NB must recover both classes exactly.
    val rows = Seq(
      (0L, "aa aa bb aa", "A"), (2L, "aa bb bb", "A"), (4L, "aa aa", "A"),
      (10L, "xx yy xx xx", "B"), (12L, "yy yy xx", "B"),
      (1L, "aa bb aa", "A"), (3L, "bb aa", "A"),
      (11L, "xx xx yy", "B"), (13L, "yy xx", "B"))
    val dir = java.nio.file.Files.createTempDirectory("graft_nb")
      .toFile.getAbsolutePath
    rows.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Registry.byName("q199_naive_bayes_langid").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(4))).toSeq
    assert(got == Seq((1L, "A", 1L), (3L, "A", 1L),
      (11L, "B", 1L), (13L, "B", 1L)), s"got $got")
  }
}
