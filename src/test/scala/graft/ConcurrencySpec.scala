package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Shared-SparkSession concurrency: a query library is normally
  * driven by many threads of one session (notebook users, a serving
  * layer, the reference's concurrent client connections to the
  * master — master_manager.c accepts N workers at once). Every
  * registered query must be safe to run concurrently with itself and
  * with others: no shared mutable state, no fixed-name temp objects
  * (q63 binds per-invocation view names for exactly this reason).
  */
class ConcurrencySpec extends SparkSpec {

  test("concurrent query runs equal their sequential results") {
    // two copies of the temp-view query (the historical race target)
    // plus a representative mix of join/window/scalar/streaming-twin
    val names = Seq(
      "q63_sql_subqueries", "q63_sql_subqueries",
      "q01_pricing_summary", "q04_join_broadcast",
      "q16_topk_per_group", "q22_string_funcs", "q42_tumbling_window")
    val sequential = names.map { n =>
      Registry.byName(n).fn(spark, sfDir).collect().toSeq
    }
    val pool = Executors.newFixedThreadPool(names.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val parallel = Await.result(
        Future.traverse(names) { n =>
          Future(Registry.byName(n).fn(spark, sfDir).collect().toSeq)
        }, 5.minutes)
      names.indices.foreach { i =>
        assert(parallel(i) == sequential(i),
          s"${names(i)} diverged under concurrency")
      }
    } finally pool.shutdown()
  }
}
