package graft.api

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** The reference framework's user-facing contract, re-expressed as a
  * typed Spark API: `map(k1,v1) → list(k2,v2)`, shuffle by `k2`,
  * `reduce(v2,v2) → v2` — the exact surface a user of the reference
  * programs against (`map()` in `/root/reference/src/mapper.c:14-42`
  * is the one concrete map; the sort-merge sum in `reducer.c:23-38`
  * the one concrete reduce). Here both are arbitrary typed lambdas:
  *
  * {{{
  * MapReduce.run(pairs) { (k, v) => tokenize(v).map(_ -> 1L) } (_ + _)
  * }}}
  *
  * Execution: `flatMap` (map) → `groupByKey` (shuffle/partition, the
  * master's key→reducer dictionary replaced by stateless hash
  * partitioning) → `reduceGroups` (reduce, with Spark's map-side
  * partial reduction standing in for the reference's per-file
  * combiner, mapper.c:75-88). The reduce function must be
  * associative and commutative — the same algebra the reference's
  * combiner silently assumes.
  */
object MapReduce {

  def run[K1, V1, K2, V2](input: Dataset[(K1, V1)])
      (map: (K1, V1) => IterableOnce[(K2, V2)])
      (reduce: (V2, V2) => V2)
      (implicit ek2: Encoder[K2], ekv: Encoder[(K2, V2)]): Dataset[(K2, V2)] =
    input
      .flatMap { case (k, v) => map(k, v) }
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, reduce(a._2, b._2)))
      .map(_._2)

  /** The reference's one built-in job — Unicode word count over a
    * directory of text files read whole (mapper.c:44-117) — on the
    * generic contract above: input records are (filename, contents),
    * map emits lowercase alnum-run tokens with count 1, reduce sums.
    */
  def wordCount(spark: SparkSession, dir: String): Dataset[(String, Long)] = {
    import spark.implicits._
    val files = spark.read.option("wholetext", true).text(dir)
      .select(input_file_name().as("f"), col("value"))
      .as[(String, String)]
    run(files) { (_, contents) =>
      contents.toLowerCase.split("[^\\p{L}\\p{N}]+").iterator
        .filter(_.nonEmpty).map(_ -> 1L)
    }(_ + _)(Encoders.STRING, Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
  }
}
