package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time one (or more) registered queries in isolation
  * with the exact Bench session config — for chasing per-query
  * regressions without paying the full 79-query run.
  *
  * Usage: sbt "runMain graft.tools.TimeQuery q34_minhash_lsh[,q60_...] [sfDir] [runs]"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q34_minhash_lsh").split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.all.foreach { t =>
      try graft.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val fn = graft.Registry.byName(name).fn
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        spark.sharedState.cacheManager.clearCache()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[time] $name%s rows=$n%d  $dt%.3f s")
        dt
      }
      println(f"[time] $name%s median=${times.sorted.apply(runs / 2)}%.3f s")
    }
    spark.stop()
  }
}
