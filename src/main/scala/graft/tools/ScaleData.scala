package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-ladder data generator: replicates a driver sf directory by an
  * integer factor with STRUCTURE-PRESERVING remaps, so per-shard
  * statistics (duplicate density, basket shapes, per-user timelines,
  * FK containments) stay constant while the corpus grows — the honest
  * way to measure how a plan's wall-time scales.
  *
  * Remap design (copy c of factor F):
  * - Every key interleaves as `k·F + c` — magnitudes stay small
  *   (q131's pointer-doubling depth bound is `key/100 ≤ 256`) and all
  *   FK pairs (orders→customer, lineitem→part/supplier/orders) remap
  *   consistently, so containment directions and join fan-outs are
  *   preserved exactly.
  * - `documents.text` of copy c > 0 prefixes every token with `c{c}`
  *   AND prepends a 10-char copy tag whose pairwise edit distance is
  *   ≥ 5: zero cross-copy shingle overlap AND no cross-copy prefix
  *   pair within levenshtein 4, so near-dup structure REPLICATES for
  *   both the shingle and the edit-distance families (pair counts
  *   scale linearly) instead of every doc gaining F−1 near-twins
  *   (pair counts would scale quadratically — a different workload,
  *   not a bigger one; the tag closed a measured 69×-per-decade
  *   blowup in q82's true pair count, round 16).
  * - `embeddings.embedding` of copy c is the c-step cyclic shift: a
  *   permutation is orthogonal, so intra-copy geometry (all cosines/
  *   distances, cluster structure) is EXACTLY preserved while a vector
  *   and its shifted self decorrelate — no cross-copy near-dup pairs.
  * - events/orders/lineitem values, timestamps and categories are
  *   untouched: per-type value distributions replicate, so the
  *   value-compressed relations (q138/q145/q153/q154) stay
  *   metadata-sized while the pre-compression scan grows F×.
  *
  * Usage: runMain graft.tools.ScaleData <srcSfDir> <outDir> <factor>
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val f = args(2).toInt
    require(f >= 1 && f <= 64, s"factor $f out of range (cyclic shift needs f <= dim)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, t: String): Unit = {
      df.repartition(64)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scale] wrote $t")
    }

    def remap(df: DataFrame, c: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) * f + lit(c)))

    def replicated(t: String, keys: Seq[String])(extra: (DataFrame, Int) => DataFrame): Unit = {
      val base = graft.Tables.load(spark, src, t)
      val scaled = (0 until f)
        .map(c => extra(remap(base, c, keys: _*), c))
        .reduce(_.unionAll(_))
      write(scaled, t)
    }

    // tiny lookup tables pass through unscaled (their FKs from the
    // scaled side are untouched, so containment holds)
    Seq("region", "nation").foreach(t => write(graft.Tables.load(spark, src, t), t))

    replicated("customer", Seq("c_custkey"))((d, _) => d)
    replicated("supplier", Seq("s_suppkey"))((d, _) => d)
    replicated("part", Seq("p_partkey"))((d, _) => d)
    replicated("orders", Seq("o_orderkey", "o_custkey"))((d, _) => d)
    replicated("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))((d, _) => d)
    replicated("events", Seq("event_id", "user_id"))((d, _) => d)

    replicated("documents", Seq("doc_id")) { (d, c) =>
      if (c == 0) d
      else {
        // Copy tag (round 16): the token prefix alone leaves template
        // docs of DIFFERENT copies within levenshtein 4 of each other
        // over a 60-char window ("c3customer c…" vs "c7customer c…" —
        // aligned, few substitutions), so the edit-distance family's
        // TRUE pair count grew ~quadratically with copies (measured
        // 69× per decade at sf10) while every shingle family
        // replicated linearly as designed. A per-copy 10-char head
        // tag — two 5-char repeated-letter blocks, so any two
        // distinct copies differ in ≥5 aligned positions (ed ≥ 5 > 4)
        // — pushes every cross-copy prefix pair past the threshold
        // while shifting within-copy pairs identically (their
        // distances are untouched). Shingle structure is unaffected:
        // the tag is one extra c-prefixed token per doc.
        val ch0 = ('a' + (c / 26) % 26).toChar
        val ch1 = ('a' + c % 26).toChar
        val tag = s"$ch0$ch0$ch0$ch0$ch0$ch1$ch1$ch1$ch1$ch1"
        d.withColumn("text",
            concat(lit(s"$tag "), array_join(
              transform(split(col("text"), " "),
                t => when(length(t) > 0, concat(lit(s"c$c"), t)).otherwise(t)),
              " ")))
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
    }

    replicated("embeddings", Seq("vec_id")) { (d, c) =>
      if (c == 0) d
      else d.withColumn("embedding",
        expr(s"concat(slice(embedding, ${c + 1}, size(embedding) - $c), slice(embedding, 1, $c))"))
    }

    println(s"[scale] done: $src x$f -> $out")
    spark.stop()
  }
}
