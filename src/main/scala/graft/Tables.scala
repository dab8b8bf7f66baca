package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated star schema (see TESTDATA.md /
  * FIXTURES.md). One parquet file per table under the sf dir.
  *
  * Parquet is the canonical columnar input: predicate pushdown, column
  * pruning and partition pruning are free (SURVEY.md §2.2 sources). At
  * cluster scale the same loaders work on a directory of many files —
  * nothing here assumes a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` arrives in three parquet encodings depending on the
    * writer generation; normalize all of them to a session-zone
    * `TimestampType` so downstream queries (`unix_micros`, timestamp
    * comparisons, window ranges) see one type:
    *
    *  - TIMESTAMP(NANOS): Spark has no native type for it and reads a
    *    nanos-since-epoch LONG under
    *    `spark.sql.legacy.parquet.nanosAsLong` (set by our session
    *    builders). `div` keeps the arithmetic in LongType; a double
    *    division would lose precision above 2^53 ns. DuckDB's
    *    `CAST(ts AS TIMESTAMP)` truncates ns→us the same way.
    *  - timestamp[us] without timezone: Spark reads TIMESTAMP_NTZ,
    *    which `unix_micros` and TimestampType comparisons reject at
    *    analysis time. Our sessions pin the session timezone to UTC,
    *    so casting NTZ→TimestampType is a lossless relabel and DuckDB
    *    (which treats the column as plain TIMESTAMP) stays in parity.
    *  - timestamp[us] with timezone: already TimestampType; pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
