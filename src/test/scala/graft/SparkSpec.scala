package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM per `sbt test`
  * fork; getOrCreate dedups across suites).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir", "target/spark-warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    // WindowExec warns on EVERY unpartitioned window; all of ours run
    // on metadata-sized relations — proven structurally by PlanSpec's
    // suite-wide "DATA-sized unpartitioned window" gate — so the
    // per-operator warning is pure noise that buries real signals in
    // the test log (100+ lines per run).
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    super.beforeAll()
  }

  override def afterAll(): Unit = {
    // release query-scoped persisted inputs (dedup shingle postings)
    // between suites — the session is shared across all of them
    spark.sharedState.cacheManager.clearCache()
    super.afterAll()
  }
}
