package graft

import org.apache.spark.sql.functions._
import graft.api.BucketedLayout

/** Gates the co-located layout's whole reason to exist: a join and a
  * key-local aggregate over co-bucketed tables must plan ZERO
  * exchanges (the write-once shuffle already paid for the layout),
  * results must match the plain-join answer exactly, and a
  * bucket-count mismatch must be CAUGHT by the shuffleCount gate
  * rather than silently re-shuffling every run.
  */
class BucketedLayoutSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("co-bucketed join + key-local aggregate plan zero exchanges; mismatch is caught") {
    val orders = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    BucketedLayout.materialize(orders, "bl_orders", 8, Seq("o_custkey"))
    BucketedLayout.materialize(cust, "bl_customer", 8, Seq("c_custkey"))
    BucketedLayout.materialize(cust, "bl_customer16", 16, Seq("c_custkey"))
    try {
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val j = BucketedLayout.join(spark, "bl_orders", "bl_customer",
          l => r => l("o_custkey") === r("c_custkey"))
        assert(BucketedLayout.shuffleCount(j) == 0,
          s"co-bucketed join must not shuffle:\n${j.queryExecution.executedPlan}")

        // parity: the layout changes the plan, never the answer
        val direct = orders.join(cust,
          orders("o_custkey") === cust("c_custkey"))
        assert(j.count() == direct.count())
        val jCnt = j.agg(count(col("o_totalprice"))).head.getLong(0)
        val dCnt = direct.agg(count(col("o_totalprice"))).head.getLong(0)
        assert(jCnt == dCnt)

        // a groupBy on the bucket key rides the same layout: partial
        // AND final aggregation happen bucket-local
        val agg = spark.table("bl_orders").groupBy("o_custkey")
          .agg(sum("o_totalprice"))
        assert(BucketedLayout.shuffleCount(agg) == 0,
          s"bucket-key aggregate must not shuffle:\n${agg.queryExecution.executedPlan}")

        // mismatched bucket counts (8 vs 16) fall back to at least one
        // runtime exchange — the CI gate this helper exists for
        val bad = BucketedLayout.join(spark, "bl_orders", "bl_customer16",
          l => r => l("o_custkey") === r("c_custkey"))
        assert(BucketedLayout.shuffleCount(bad) > 0,
          "8-vs-16-bucket join should need a shuffle (gate must catch it)")

        // a non-bucket-key aggregate still shuffles — shuffleCount
        // counts real exchanges, not zero-by-construction
        val off = spark.table("bl_orders").groupBy("o_orderstatus")
          .agg(count(lit(1)))
        assert(BucketedLayout.shuffleCount(off) == 1)

        // AND the count survives execution: once AQE materializes
        // stages, the exchange hides inside a childless
        // ShuffleQueryStageExec — the gate must recurse into it, not
        // report a spurious zero on an already-executed DataFrame
        off.count()
        assert(BucketedLayout.shuffleCount(off) == 1,
          s"post-execution shuffleCount lost the staged exchange:\n${off.queryExecution.executedPlan}")
      }
    } finally {
      Seq("bl_orders", "bl_customer", "bl_customer16")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
