package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Multi-dimensional aggregation (SURVEY.md §2.2: grouping sets /
  * rollup / cube — "key expansion in map" in the reference's algebra)
  * and set operators (tagged shuffle in MapReduce terms).
  *
  * NULLS FIRST is spelled explicitly in every oracle ORDER BY because
  * rollup/cube emit NULL group keys and DuckDB defaults to NULLS LAST
  * while Spark defaults to NULLS FIRST.
  */
object GroupingQueries {

  /** Rollup over (year, status): count + exact integer-valued sums.
    * l_quantity values are integral doubles, so their sum is exact in
    * IEEE double regardless of order — no rounding needed.
    */
  val q17Rollup = QueryDef(
    "q17_rollup",
    "rollup (order year, status) with subtotals + grand total",
    """SELECT order_year, o_orderstatus,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
      |FROM (SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderstatus, o_totalprice
      |      FROM orders)
      |GROUP BY ROLLUP (order_year, o_orderstatus)
      |ORDER BY order_year NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
    base
      .withColumn("order_year", year(col("o_orderdate")).cast("int"))
      .rollup(col("order_year"), col("o_orderstatus"))
      // per-row integer cents (q01 convention): the () grand total sums
      // the WHOLE table, the first place raw-double order drift shows
      .agg(count(lit(1)).as("n_orders"),
        (sum(round(col("o_totalprice") * 100).cast("long")).cast("double")
          / 100.0).as("total_price"))
      // SQL emits the () grand-total row even over empty input
      .unionByName(graft.api.Degenerate.emptyGrandTotal(base, Seq(
        lit(null).cast("int").as("order_year"),
        lit(null).cast("string").as("o_orderstatus"),
        lit(0L).as("n_orders"),
        lit(null).cast("double").as("total_price"))))
      .orderBy(col("order_year").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
  }

  /** Cube over (returnflag, linestatus): all 4 grouping combinations. */
  val q18Cube = QueryDef(
    "q18_cube",
    "cube (returnflag, linestatus): every grouping combination",
    """SELECT l_returnflag, l_linestatus,
      |  count(*) AS n_items, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    val base = Tables.lineitem(s, d)
    base
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
      // SQL emits the () grand-total row even over empty input
      .unionByName(graft.api.Degenerate.emptyGrandTotal(base, Seq(
        lit(null).cast("string").as("l_returnflag"),
        lit(null).cast("string").as("l_linestatus"),
        lit(0L).as("n_items"),
        lit(null).cast("double").as("sum_qty"))))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Explicit GROUPING SETS via the SQL entry point (spark.sql over
    * temp views) — the engine's SQL surface, not just the DSL.
    */
  val q19GroupingSets = QueryDef(
    "q19_grouping_sets",
    "GROUPING SETS ((mktsegment), (nation), ()) via spark.sql",
    """SELECT c_mktsegment, CAST(c_nationkey AS INT) AS nationkey,
      |  count(*) AS n_customers,
      |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_bal
      |FROM customer
      |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
      |ORDER BY c_mktsegment NULLS FIRST, nationkey NULLS FIRST""".stripMargin) { (s, d) =>
    val base = Tables.customer(s, d)
    base.createOrReplaceTempView("customer")
    s.sql(
      """SELECT c_mktsegment, CAST(c_nationkey AS INT) AS nationkey,
        |  count(*) AS n_customers,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_bal
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())""".stripMargin)
      // SQL emits the () grouping-set row even over empty input
      .unionByName(graft.api.Degenerate.emptyGrandTotal(base, Seq(
        lit(null).cast("string").as("c_mktsegment"),
        lit(null).cast("int").as("nationkey"),
        lit(0L).as("n_customers"),
        lit(null).cast("double").as("total_bal"))))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("nationkey").asc_nulls_first)
  }

  /** Set operators: customers active in 1998 vs 1999 — INTERSECT /
    * EXCEPT / UNION branches tagged and unioned into one result.
    */
  val q20SetOps = QueryDef(
    "q20_set_ops",
    "intersect / except / union over yearly active customer sets",
    """WITH y98 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998),
      |     y99 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1999)
      |SELECT 'both' AS op, o_custkey FROM (SELECT o_custkey FROM y98 INTERSECT SELECT o_custkey FROM y99)
      |UNION ALL
      |SELECT 'only98' AS op, o_custkey FROM (SELECT o_custkey FROM y98 EXCEPT SELECT o_custkey FROM y99)
      |UNION ALL
      |SELECT 'only99' AS op, o_custkey FROM (SELECT o_custkey FROM y99 EXCEPT SELECT o_custkey FROM y98)
      |ORDER BY op, o_custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    def activeIn(y: Int) = o.filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct()
    val y98 = activeIn(1998)
    val y99 = activeIn(1999)
    y98.intersect(y99).select(lit("both").as("op"), col("o_custkey"))
      .union(y98.except(y99).select(lit("only98").as("op"), col("o_custkey")))
      .union(y99.except(y98).select(lit("only99").as("op"), col("o_custkey")))
      .orderBy(col("op"), col("o_custkey"))
  }

  /** UNION ALL with bag semantics preserved (no dedup), plus a
    * distinct-union contrast on the same inputs.
    */
  val q21UnionAll = QueryDef(
    "q21_union_all",
    "union all (bag) vs union distinct (set) cardinality per source",
    """SELECT src, count(*) AS n FROM (
      |  SELECT 'hi' AS src, o_custkey FROM orders WHERE o_totalprice > 200000
      |  UNION ALL
      |  SELECT 'pri' AS src, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |) GROUP BY src
      |ORDER BY src""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_totalprice") > 200000).select(lit("hi").as("src"), col("o_custkey"))
      .union(o.filter(col("o_orderpriority") === "1-URGENT")
        .select(lit("pri").as("src"), col("o_custkey")))
      .groupBy(col("src")).agg(count(lit(1)).as("n"))
      .orderBy(col("src"))
  }

  /** Pivot (wide aggregation): one output column per pivot value —
    * the relational transpose `groupBy().pivot()` plans as a single
    * conditional aggregate (no extra shuffle vs the plain groupBy),
    * which is exactly how the oracle spells it.
    */
  val q52Pivot = QueryDef(
    "q52_pivot",
    "pivot linestatus into columns: quantity totals per returnflag × status",
    """SELECT l_returnflag,
      |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS F,
      |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS O
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.functions.{col, round, sum}
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(col("l_quantity")), 2))
      .na.fill(0.0, Seq("F", "O"))
      .orderBy(col("l_returnflag"))
  }

  /** Unpivot (long form — the inverse reshaping of q52's pivot):
    * wide measure columns melt into (name, value) rows.
    * `Dataset.unpivot` plans as a single `Expand` (row → one output
    * row per measure) — no shuffle, no join; the oracle is DuckDB's
    * UNPIVOT of the same projection.
    */
  val q64Unpivot = QueryDef(
    "q64_unpivot",
    "unpivot order measures into (measure, val) long form",
    """SELECT o_orderkey, measure, val FROM (
      |  UNPIVOT (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total_price,
      |                  CAST(o_custkey AS DOUBLE) AS cust_key
      |           FROM orders WHERE o_orderkey < 200)
      |  ON total_price, cust_key INTO NAME measure VALUE val)
      |ORDER BY o_orderkey, measure""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.functions.col
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 200)
      .select(col("o_orderkey"),
        col("o_totalprice").cast("double").as("total_price"),
        col("o_custkey").cast("double").as("cust_key"))
      .unpivot(Array(col("o_orderkey")),
        Array(col("total_price"), col("cust_key")), "measure", "val")
      .orderBy(col("o_orderkey"), col("measure"))
  }

  /** Ordered string aggregation (SQL `string_agg(x ORDER BY ...)` /
    * `group_concat`) — the reporting-layer collect-to-string
    * operator. Spark has no ordered string_agg, but
    * `array_sort(collect_list(...))` + `array_join` is the exact
    * equivalent: collect_list is a partial-aggregable buffer, the
    * per-group sort happens once on the FINISHED group (bounded by
    * the LIMIT-like nature of group content, not table size), and
    * determinism comes from sorting on the aggregated values
    * themselves rather than trusting input order — the only safe
    * contract under parallel aggregation in any engine.
    */
  val q105StringAgg = QueryDef(
    "q105_string_agg",
    "ordered string_agg per group: supplier roster per nation",
    """SELECT n.n_name,
      |  CAST(count(DISTINCT s.s_name) AS BIGINT) AS n_suppliers,
      |  string_agg(DISTINCT s.s_name, ',' ORDER BY s.s_name) AS roster
      |FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
      |WHERE s.s_suppkey % 7 = 0
      |GROUP BY n.n_name
      |ORDER BY n.n_name""".stripMargin) { (s, d) =>
    Tables.supplier(s, d)
      .filter(col("s_suppkey") % 7 === 0)
      .join(broadcast(Tables.nation(s, d)),
        col("n_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        countDistinct(col("s_name")).as("n_suppliers"),
        array_join(array_sort(collect_set(col("s_name"))), ",").as("roster"))
      .orderBy(col("n_name"))
  }

  val all: Seq[QueryDef] = Seq(
    q17Rollup, q18Cube, q19GroupingSets, q20SetOps, q21UnionAll, q52Pivot,
    q64Unpivot, q105StringAgg)
}
