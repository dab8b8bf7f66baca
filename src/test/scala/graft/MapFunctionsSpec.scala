package graft

import org.apache.spark.sql.functions._

/** Map-type column functions (SURVEY.md §2.2 "array / map fns") —
  * spec-only: DuckDB MAP comparison semantics don't line up with
  * Spark's for a hash-compare oracle, so the map surface is pinned
  * here instead.
  */
class MapFunctionsSpec extends SparkSpec {

  test("map constructor / map_keys / map_values / element_at") {
    import spark.implicits._
    val df = Seq(("a", 1L, "x", 10L), ("b", 2L, "y", 20L)).toDF("k1", "v1", "k2", "v2")
      .select(org.apache.spark.sql.functions.map($"k1", $"v1", $"k2", $"v2").as("m"))
    val row = df.select(
      map_keys($"m").as("ks"), map_values($"m").as("vs"),
      element_at($"m", "a").as("a")).collect()(0)
    assert(row.getAs[scala.collection.Seq[String]]("ks").toSet == Set("a", "x"))
    assert(row.getAs[scala.collection.Seq[Long]]("vs").toSet == Set(1L, 10L))
    assert(row.getAs[java.lang.Long]("a") == 1L)
  }

  test("transform_values / map_filter / map_from_entries HOFs") {
    import spark.implicits._
    val df = Seq(Seq(("a", 1L), ("b", 2L), ("c", 3L))).toDF("es")
      .select(map_from_entries($"es").as("m"))
    val doubled = df.select(
      transform_values($"m", (_, v) => v * 2).as("m2"),
      map_filter($"m", (_, v) => v > 1).as("mf")).collect()(0)
    assert(doubled.getAs[Map[String, Long]]("m2") == Map("a" -> 2L, "b" -> 4L, "c" -> 6L))
    assert(doubled.getAs[Map[String, Long]]("mf") == Map("b" -> 2L, "c" -> 3L))
  }

  test("explode_outer keeps rows with empty arrays (vs explode dropping them)") {
    import spark.implicits._
    val df = Seq((1L, Seq("x", "y")), (2L, Seq.empty[String])).toDF("id", "arr")
    assert(df.select($"id", explode($"arr")).count() == 2)
    assert(df.select($"id", explode_outer($"arr")).count() == 3)
  }

  test("aggregating a map column: per-key event_type counts as map rows") {
    // build a map column from aggregated data — the "dynamic columns"
    // idiom for sparse per-entity stats
    val m = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("event_type"), col("n"))))).as("type_counts"))
    val row = m.orderBy(col("user_id")).collect()(0)
    val counts = row.getAs[Map[String, Long]]("type_counts")
    assert(counts.nonEmpty && counts.values.forall(_ > 0))
    // total over the map equals the user's event count
    val uid = row.getLong(0)
    val total = Tables.events(spark, sfDir)
      .filter(col("user_id") === uid).count()
    assert(counts.values.sum == total)
  }
}
