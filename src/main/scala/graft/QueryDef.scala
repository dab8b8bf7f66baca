package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator/query: the Spark implementation plus (when
  * SQL-expressible) the DuckDB oracle twin run by the driver harness.
  *
  * Determinism contract (SURVEY.md §5): every query ends in an ORDER BY
  * on a unique key, and floating aggregates are rounded identically on
  * both sides so hash comparison is stable across execution orders.
  */
final case class QueryDef(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, doc: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, doc, fn, Some(oracle))

  /** Query with no SQL-expressible oracle (streaming, LSH, sketches):
    * the driver records a weaker rows-only check.
    */
  def noOracle(name: String, doc: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, doc, fn, None)
}
