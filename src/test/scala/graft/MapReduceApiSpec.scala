package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders

import graft.api.MapReduce

/** The generic typed map/reduce contract (graft.api.MapReduce) — the
  * reference framework's user API — must reproduce the reference job
  * and obey the combiner algebra on arbitrary lambdas.
  */
class MapReduceApiSpec extends SparkSpec {

  test("wordCount over a text-file dir equals the registered wordcount query") {
    import spark.implicits._
    val dir = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "mr-api").toString
    Tables.documents(spark, sfDir).select($"doc_id", $"text").collect()
      .foreach { r =>
        Files.writeString(
          java.nio.file.Paths.get(dir, s"doc_${r.getLong(0)}.txt"), r.getString(1))
      }
    val api = MapReduce.wordCount(spark, dir)
      .toDF("word", "cnt").orderBy($"word")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val query = Registry.byName("wordcount").fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(api.toSeq == query.toSeq)
  }

  test("generic run() supports arbitrary key/value types and reduce fns") {
    import spark.implicits._
    val input = Seq(("f1", "3 1 4 1 5"), ("f2", "9 2 6 5 3")).toDS()
    // map: parse ints, key by parity; reduce: max
    val out = MapReduce.run(input) { (_, line) =>
      line.split(" ").iterator.map(_.toInt).map(n => (n % 2 == 0, n))
    }(math.max)(Encoders.scalaBoolean, Encoders.tuple(Encoders.scalaBoolean, Encoders.scalaInt))
      .collect().toMap
    assert(out == Map(false -> 9, true -> 6))
  }
}
