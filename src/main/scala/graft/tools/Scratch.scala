package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporary measurement scratch — NOT part of the library surface;
  * deleted before the round closes.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(c, " "), t => length(t) > 0)
    val docs = graft.Tables.load(spark, d, "documents")
    docs.count()

    // v1: current — posexplode + two window leads
    def v1: DataFrame = {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      docs
        .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("p", "t")))
        .select(col("doc_id"), col("p"), col("t"),
          lead(col("t"), 1).over(w).as("t1"), lead(col("t"), 2).over(w).as("t2"))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"), xxhash64(col("t"), col("t1"), col("t2")).as("gh"))
        .groupBy(col("doc_id"), col("gh")).agg(count(lit(1)).as("cnt"))
    }
    // v2: arrays_zip of shifted slices, explode, hash — no window
    def v2: DataFrame = {
      graft.functions.Ngrams.trigrams(docs)
        .select(col("doc_id"), xxhash64(col("t"), col("t1"), col("t2")).as("gh"))
        .groupBy(col("doc_id"), col("gh")).agg(count(lit(1)).as("cnt"))
    }
    def t(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"  n=$n  $dt%.3f s"); dt
    }
    println("v1 window-lead:")
    (1 to 3).foreach(_ => t(v1.count()))
    println("v2 arrays_zip:")
    (1 to 3).foreach(_ => t(v2.count()))
    // equality check: identical (doc_id, gh, cnt) multisets
    val diff = v1.union(v2).groupBy(col("doc_id"), col("gh"), col("cnt"))
      .agg(count(lit(1)).as("k")).filter(col("k") =!= 2).count()
    println(s"diff rows (want 0) = $diff")
    spark.stop()
  }
}
