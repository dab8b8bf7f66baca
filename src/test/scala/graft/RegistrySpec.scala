package graft

/** Every registered query must run on the smoke scale factor, produce
  * rows, have unique well-formed names, and keep the driver contract
  * (oracle keys ⊆ query keys).
  */
class RegistrySpec extends SparkSpec {

  test("query names are unique and kebab/snake-case") {
    val names = Registry.queries.map(_.name)
    assert(names.distinct.size == names.size)
    names.foreach(n => assert(n.matches("[a-z0-9_]+"), s"bad name $n"))
  }

  test("oracleSql keys are a subset of queries keys") {
    val q = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(q))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  Registry.queries.foreach { q =>
    test(s"${q.name} runs and returns rows on sf0.001") {
      val df = q.fn(spark, sfDir)
      // q07_anti_join legitimately returns 0 rows at tiny scale: every
      // customer may have orders. Only require successful execution
      // plus schema sanity there.
      if (q.name == "q07_anti_join") assert(df.count() >= 0)
      else assert(df.count() > 0, s"${q.name} returned no rows")
      assert(df.columns.nonEmpty)
    }
  }
}
