package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Degenerate-input parity helpers.
  *
  * SQL's ROLLUP/CUBE/GROUPING SETS emit the `()` grouping-set row even
  * over ZERO input rows (a global aggregate always yields one row:
  * count 0, sums NULL). Spark's grouping-sets implementation expands
  * rows BEFORE aggregating, so the `()` set behaves like a keyed
  * aggregate and an empty input yields an empty result — the one
  * value-level divergence from the SQL standard surfaced by the
  * differential fuzzer's `empty` variant (SURVEY §5, class C).
  */
object Degenerate {

  /** The missing `()` row, produced ONLY when `base` is empty: a
    * zero-column count scan of `base` (parquet answers it from row
    * group metadata — no data pages at any corpus size) gated to
    * zero, projected onto the caller's literal grand-total `row`
    * (count columns 0, sum columns NULL — exactly what the SQL `()`
    * set yields over no rows). Union it under the rollup/cube result:
    * on non-empty input this branch is empty and the rollup's own
    * `()` row stands; on empty input this branch IS the `()` row.
    */
  def emptyGrandTotal(base: DataFrame, row: Seq[Column]): DataFrame =
    base.select(lit(1).as("__one"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") === 0)
      .select(row: _*)
}
