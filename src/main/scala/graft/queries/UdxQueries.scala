package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Remaining UDx + collection-function surface (SURVEY.md §2.2
  * "array/map fns" and "scalar UDF" rows): higher-order array
  * functions over per-group collected arrays, and a Scala `udf` (the
  * arbitrary-map user hook — kept OUT of other hot paths on purpose;
  * a udf is the fallback, built-ins/custom expressions the default).
  */
object UdxQueries {

  /** Array HOFs (transform/filter/aggregate) over deterministic
    * per-order quantity arrays. `collect_list` order is
    * nondeterministic, so the array is built from
    * sort_array(collect_list(struct(...))) — same trick as DuckDB's
    * `list(x ORDER BY y)`.
    */
  val q49ArrayFuncs = QueryDef(
    "q49_array_funcs",
    "array HOFs: per-order quantity vectors → filter/transform/aggregate",
    """SELECT o_orderkey, n_lines,
      |  CAST(list_reduce(qs, (a, b) -> a + b) AS DOUBLE) AS qty_sum,
      |  list_max(qs) AS qty_max,
      |  len(list_filter(qs, q -> q > 25)) AS n_large,
      |  CAST(list_reduce(list_transform(qs, q -> q * 2), (a, b) -> a + b) AS DOUBLE) AS doubled_sum
      |FROM (
      |  SELECT l_orderkey AS o_orderkey, count(*) AS n_lines,
      |         list(l_quantity ORDER BY l_linenumber) AS qs
      |  FROM lineitem GROUP BY l_orderkey)
      |WHERE o_orderkey < 300
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 300)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        transform(sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity")))),
          x => x.getField("l_quantity")).as("qs"))
      .select(col("o_orderkey"), col("n_lines"),
        aggregate(col("qs"), lit(0.0), (a, q) => a + q).as("qty_sum"),
        array_max(col("qs")).as("qty_max"),
        size(filter(col("qs"), q => q > 25)).as("n_large"),
        aggregate(transform(col("qs"), q => q * 2), lit(0.0), (a, q) => a + q)
          .as("doubled_sum"))
      .orderBy(col("o_orderkey"))
  }

  /** Scala scalar UDF — the reference's arbitrary `map()` hook at
    * expression granularity. Parses the numeric rank off
    * `o_orderpriority` ("1-URGENT" → 1); the oracle does the same
    * with string functions, proving the UDF's contract.
    */
  val q50ScalarUdf = QueryDef(
    "q50_scalar_udf",
    "Scala scalar udf(): parse priority rank, aggregate per rank",
    """SELECT CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_rank,
      |  count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY prio_rank
      |ORDER BY prio_rank""".stripMargin) { (s, d) =>
    // Option-valued: a String-typed Scala UDF receives NULLs (ref
    // types are not null-skipped like primitives) — the SQL twin's
    // string_split(NULL) is NULL, so null priorities map to null rank
    val rankOf = udf((p: String) => Option(p).map(_.split("-")(0).toInt))
    Tables.orders(s, d)
      .select(rankOf(col("o_orderpriority")).as("prio_rank"), col("o_totalprice"))
      .groupBy(col("prio_rank"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("prio_rank"))
  }

  /** External-process pipe (the reference's spawned-worker contract,
    * worker_manager.c:96-105, re-expressed per-partition — see
    * `graft.api.Pipe`). Order keys stream as text lines through an
    * `awk` child that reduces them mod 97; the engine re-aggregates
    * the child's output. The oracle computes the same congruence in
    * SQL, proving the round trip through the external process is
    * lossless and exact.
    */
  val q59Pipe = QueryDef(
    "q59_pipe",
    "external-process pipe: order keys through awk mod 97, re-aggregated",
    """SELECT o_orderkey % 97 AS r, count(*) AS cnt
      |FROM orders
      |GROUP BY r
      |ORDER BY r""".stripMargin) { (s, d) =>
    import s.implicits._
    val lines = Tables.orders(s, d)
      .select(col("o_orderkey").cast("string")).as[String]
    graft.api.Pipe.through(lines, Seq("awk", "{ print $1 % 97 }"))
      .toDF("line")
      .select(col("line").cast("long").as("r"))
      .groupBy(col("r"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("r"))
  }

  /** Map functions over a real MapType column (SURVEY.md §2.2
    * "array / map fns" row, map half — previously spec-only because a
    * DuckDB MAP hash-compare isn't viable). The query builds a
    * per-order map linenumber→quantity with `map_from_entries`, drives
    * map_keys/map_values/map_filter/transform_values/map_concat/
    * element_at through it, then projects every map-derived result to
    * scalars/strings so the oracle can recompute them relationally —
    * the MAP never needs to cross the comparison boundary.
    */
  val q71MapFuncs = QueryDef(
    "q71_map_funcs",
    "map fns: map_from_entries → filter/transform/concat/lookup, projected to scalars",
    """WITH line AS (
      |  SELECT l_orderkey, l_linenumber, CAST(sum(CAST(l_quantity AS INT)) AS INT) AS v
      |  FROM lineitem
      |  WHERE l_orderkey < 200
      |  GROUP BY l_orderkey, l_linenumber)
      |SELECT l_orderkey AS o_orderkey,
      |  CAST(count(*) AS INT) AS n_keys,
      |  CAST(sum(v) AS BIGINT) AS qty_total,
      |  CAST(max(CASE WHEN l_linenumber = 1 THEN v END) AS INT) AS first_qty,
      |  CAST(max(CASE WHEN l_linenumber = 2 THEN 2 * v END) AS INT) AS second_doubled,
      |  coalesce(string_agg(CASE WHEN v > 25
      |      THEN l_linenumber || ':' || v END, ',' ORDER BY l_linenumber), '') AS large_entries,
      |  CAST(count(*) + 1 AS INT) AS n_after_concat
      |FROM line
      |GROUP BY l_orderkey
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    // the synthetic lineitem duplicates (orderkey, linenumber) pairs
    // (unlike real TPC-H), so quantities pre-aggregate per linenumber —
    // map keys must be unique or map_from_entries raises
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 200)
      .groupBy(col("l_orderkey").as("o_orderkey"), col("l_linenumber").as("key"))
      .agg(sum(col("l_quantity").cast("int")).cast("int").as("value"))
      .groupBy(col("o_orderkey"))
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("key"), col("value"))))).as("m"))
      .select(
        col("o_orderkey"),
        size(col("m")).as("n_keys"),
        aggregate(map_values(col("m")), lit(0), (a, v) => a + v)
          .cast("long").as("qty_total"),
        element_at(col("m"), 1).as("first_qty"),
        element_at(transform_values(col("m"), (_, v) => v * 2), 2).as("second_doubled"),
        concat_ws(",",
          transform(sort_array(map_entries(map_filter(col("m"), (_, v) => v > 25))),
            e => concat(e.getField("key").cast("string"), lit(":"),
              e.getField("value").cast("string")))).as("large_entries"),
        size(map_concat(col("m"), map(lit(0), lit(-1)))).as("n_after_concat"))
      .orderBy(col("o_orderkey"))
  }

  val all: Seq[QueryDef] = Seq(q49ArrayFuncs, q50ScalarUdf, q59Pipe, q71MapFuncs)
}
