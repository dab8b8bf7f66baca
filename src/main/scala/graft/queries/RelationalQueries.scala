package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Reference-parity relational algebra (SURVEY.md §2.1 R5-R10 and §2.2
  * ALG rows): projection, filter, aggregation, joins of every flavor,
  * sort/limit. Everything is declarative DataFrame DSL so Catalyst
  * plans partial aggregation, pushdown, and join strategies — the same
  * rewrites the reference hand-codes (map-side combine, mapper.c:75-88)
  * or lacks entirely.
  *
  * Scale notes (100 TB design point):
  *  - dimension joins (`region nation customer supplier part`) are
  *    explicitly `broadcast()` — no shuffle of the fact table for them;
  *  - fact-fact joins (lineitem⋈orders) shuffle on the join key once —
  *    at cluster scale, bucketing both tables by orderkey removes it;
  *  - all aggregates are algebraic (sum/count/min/max/avg) so Spark
  *    plans partial+final HashAggregate around a single exchange.
  */
object RelationalQueries {

  /** TPC-H Q1 style pricing summary: groupBy + 8 algebraic aggregates.
    * The direct generalization of the reference's reduce-side sum
    * (reducer.c:23-38). Money sums ride PER-ROW integer cents
    * (`round(expr·100)` then an exact BIGINT sum) — `round(sum(...))`
    * over raw doubles is summation-order-dependent, and at sf1 even
    * the ORACLE's parallel sum flipped sum_charge's 2nd decimal
    * between runs. Quantity is integral (exact in any order); the
    * averages divide exact integer sums once at output.
    */
  val q01PricingSummary = QueryDef(
    "q01_pricing_summary",
    "groupBy(returnflag,linestatus) with sum/avg/count aggregates, partial+final HashAggregate",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
      |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc_price,
      |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_charge,
      |  round(CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*), 4) AS avg_qty,
      |  round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / (100.0 * count(*)), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    def cents(c: org.apache.spark.sql.Column) =
      sum(round(c * 100).cast("long"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        (cents(col("l_extendedprice")).cast("double") / 100.0)
          .as("sum_base_price"),
        (cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("double") / 100.0).as("sum_disc_price"),
        (cents(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).cast("double") / 100.0).as("sum_charge"),
        round(sum(col("l_quantity").cast("long")).cast("double")
          / count(lit(1)), 4).as("avg_qty"),
        round(cents(col("l_discount")).cast("double")
          / (lit(100.0) * count(lit(1))), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Filter + computed projection; predicates and column pruning reach
    * the parquet scan (PushedFilters in .explain).
    */
  val q02FilterProject = QueryDef(
    "q02_filter_project",
    "selective filter + computed projection, full parquet pushdown",
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1 - l_discount) AS net_price
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1999-01-01'
      |  AND l_shipdate < TIMESTAMP '1999-04-01'
      |  AND l_discount >= 0.05 AND l_quantity < 25
      |ORDER BY l_orderkey, l_linenumber, net_price""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-04-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_quantity") < 25)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
      // net_price completes the total order: the synthetic corpus has
      // duplicate (l_orderkey, l_linenumber) pairs (11785 at sf0.01),
      // so a two-key sort left the dup block's internal order
      // engine-dependent — first observed as a hash flip at sf1
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("net_price"))
  }

  /** Global sort + limit → Spark plans TakeOrderedAndProject (top-k
    * without a full sort of every partition's output).
    */
  val q03TopRevenueOrders = QueryDef(
    "q03_top_revenue_orders",
    "agg + global top-k, TakeOrderedAndProject physical operator",
    """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 100""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(100)
  }

  /** Broadcast hash join: customer (small) is broadcast, orders never
    * shuffles. The map-side replicated join of classic MapReduce.
    */
  val q04JoinBroadcast = QueryDef(
    "q04_join_broadcast",
    "fact⋈dim broadcast hash join + agg on dim attribute",
    """SELECT c.c_mktsegment,
      |  CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price,
      |  count(*) AS n_orders
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    // money sums ride per-row integer cents (the q01 convention):
    // round(sum(raw doubles)) is summation-order-dependent, and the
    // sf10 gate measured q05's last ulps drifting at 6M-row groups
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg((sum(round(col("o_totalprice") * 100).cast("long")).cast("double")
          / 100.0).as("total_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** Fact⋈fact equi join (lineitem⋈orders): shuffles both sides on the
    * key → SortMergeJoin (or shuffled hash under AQE). At cluster scale
    * this is the join to co-locate via bucketing on orderkey.
    */
  val q05JoinFactFact = QueryDef(
    "q05_join_fact_fact",
    "lineitem⋈orders shuffle join, revenue by order priority",
    """SELECT o.o_orderpriority,
      |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
      |  count(*) AS n_items
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY o.o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    // per-row integer cents (q01 convention): the sf10 gate caught
    // this exact query's raw-double sum drifting in the last ulps
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).cast("double") / 100.0).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  /** Left semi join = EXISTS (reduce-side join with early-out). */
  val q06SemiJoin = QueryDef(
    "q06_semi_join",
    "left semi join (EXISTS): customers having at least one high-value order",
    """SELECT c.c_mktsegment, count(*) AS n_customers
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      |GROUP BY c.c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Left anti join = NOT EXISTS. */
  val q07AntiJoin = QueryDef(
    "q07_anti_join",
    "left anti join (NOT EXISTS): customers with no orders at all",
    """SELECT c.c_custkey, c.c_name
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Five-way star join: the full dimension chain is broadcast; only
    * the lineitem⋈orders edge shuffles. Catalyst reorders nothing here
    * because the join tree is already optimal — dims first would
    * inflate the fact table.
    */
  val q08StarSchema = QueryDef(
    "q08_star_schema",
    "5-way star join (2 broadcast dims + chained dim lookups), revenue by region/nation",
    """SELECT r.r_name, n.n_name,
      |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name, n.n_name
      |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).cast("double") / 100.0).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** The band-bounds dimension for the range join: half-open
    * [lo, hi) intervals covering the p_size domain (1..50). Tiny by
    * construction → always broadcast.
    */
  private[queries] def sizeBands(s: org.apache.spark.sql.SparkSession) =
    s.createDataFrame(Seq(
      (0, 10, 0), (10, 20, 1), (20, 30, 2),
      (30, 40, 3), (40, 50, 4), (50, 60, 5)))
      .toDF("lo", "hi", "size_band")

  /** Non-equi (range/theta) join: two tables joined on
    * `lo <= p_size AND p_size < hi` — a genuine interval predicate,
    * no equi conjunct, so Spark plans BroadcastNestedLoopJoin with
    * the 6-row bounds side broadcast. That is the scalable shape for
    * banded range joins: one pass over the fact table, no shuffle
    * for the join itself. The equivalent equi rewrite on a computed
    * bucket key (`floor(p_size/10)`) is asserted to produce the
    * identical result in PlanSpec ("range join equals its equi
    * rewrite"); at 100 TB you'd pick the rewrite when the bands are
    * regular, the BNLJ when they are arbitrary intervals.
    */
  val q09RangeJoin = QueryDef(
    "q09_range_join",
    "two-table non-equi range join (lo <= p_size < hi) via BroadcastNestedLoopJoin",
    """SELECT b.size_band, count(*) AS n_parts,
      |  round(avg(p.p_retailprice), 4) AS avg_price
      |FROM part p
      |JOIN (VALUES (0,10,0),(10,20,1),(20,30,2),(30,40,3),(40,50,4),(50,60,5))
      |  AS b(lo, hi, size_band)
      |  ON p.p_size >= b.lo AND p.p_size < b.hi
      |GROUP BY b.size_band
      |ORDER BY size_band""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .join(broadcast(sizeBands(s)),
        col("p_size") >= col("lo") && col("p_size") < col("hi"))
      .groupBy(col("size_band"))
      .agg(count(lit(1)).as("n_parts"),
        round(avg(col("p_retailprice")), 4).as("avg_price"))
      .orderBy(col("size_band"))
  }

  /** The equi-join rewrite of q09 for the regular-band special case:
    * compute the bucket key on the fact side and equi-join the bounds
    * table on it. Same result, broadcast hash join instead of BNLJ —
    * PlanSpec asserts both agree row-for-row.
    */
  private[graft] def q09EquiRewrite(
      s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.part(s, d)
      .withColumn("size_band", floor(col("p_size") / 10).cast("int"))
      .join(broadcast(sizeBands(s)), Seq("size_band"))
      .groupBy(col("size_band"))
      .agg(count(lit(1)).as("n_parts"),
        round(avg(col("p_retailprice")), 4).as("avg_price"))
      .orderBy(col("size_band"))

  /** distinct + countDistinct (exact). The reference expresses distinct
    * as key=value, null payload (SURVEY §2.2); here it is a first-class
    * HashAggregate without aggregate functions.
    */
  val q10Distinct = QueryDef(
    "q10_distinct",
    "distinct + exact count distinct per group",
    """SELECT o_orderstatus,
      |  count(DISTINCT o_custkey) AS n_customers,
      |  count(DISTINCT o_orderpriority) AS n_priorities
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))
      .orderBy(col("o_orderstatus"))
  }

  /** Left outer join with null-absorbing aggregation: customers with
    * zero orders keep a row (count of a null key column is 0 in both
    * engines — the outer-join null contract).
    */
  val q53LeftOuter = QueryDef(
    "q53_left_outer",
    "left outer join: all customers with their order counts (0 for orderless)",
    """SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
      |  round(coalesce(sum(o.o_totalprice), 0), 2) AS total
      |FROM customer c
      |LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_custkey
      |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).alias("c")
      .join(Tables.orders(s, d).alias("o"),
        col("c.c_custkey") === col("o.o_custkey"), "left_outer")
      .groupBy(col("c.c_custkey"))
      .agg(count(col("o.o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o.o_totalprice")), lit(0)), 2).as("total"))
      .orderBy(col("c.c_custkey"))
  }

  /** Full outer join: per-customer counts of finished vs open orders,
    * null where a customer appears on only one side.
    */
  val q54FullOuter = QueryDef(
    "q54_full_outer",
    "full outer join of two per-customer aggregates (nulls on either side)",
    """WITH f AS (SELECT o_custkey, count(*) AS nf FROM orders
      |           WHERE o_orderstatus = 'F' GROUP BY o_custkey),
      |     o AS (SELECT o_custkey, count(*) AS no FROM orders
      |           WHERE o_orderstatus = 'O' GROUP BY o_custkey)
      |SELECT coalesce(f.o_custkey, o.o_custkey) AS custkey, f.nf, o.no
      |FROM f FULL JOIN o ON f.o_custkey = o.o_custkey
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("fk")).agg(count(lit(1)).as("nf"))
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("ok")).agg(count(lit(1)).as("no"))
    f.join(o, col("fk") === col("ok"), "full_outer")
      .select(coalesce(col("fk"), col("ok")).as("custkey"), col("nf"), col("no"))
      .orderBy(col("custkey"))
  }

  /** Right outer join (mirror of q53 with orders on the LEFT): every
    * customer keeps a row even with zero orders — closes the §2.2
    * "equi inner/left/right/full" inventory row.
    */
  val q58RightOuter = QueryDef(
    "q58_right_outer",
    "right outer join: orders ⟖ customer, all customers preserved",
    """SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
      |  round(coalesce(sum(o.o_totalprice), 0), 2) AS total
      |FROM orders o
      |RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_custkey
      |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d).alias("o")
      .join(Tables.customer(s, d).alias("c"),
        col("o.o_custkey") === col("c.c_custkey"), "right_outer")
      .groupBy(col("c.c_custkey"))
      .agg(count(col("o.o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o.o_totalprice")), lit(0)), 2).as("total"))
      .orderBy(col("c.c_custkey"))
  }

  /** Per-brand SKYLINE (Pareto frontier): parts not dominated on
    * (cheaper-or-equal price, larger-or-equal size, strictly better
    * in one) by any same-brand part — the classic `SKYLINE OF price
    * MIN, size MAX` operator, absent from both engines' SQL.
    *
    * One [[graft.api.MapReduce.runSorted]] pass: shuffle on brand,
    * values sorted (price asc, size desc, key) inside the shuffle,
    * then an O(1)-state streaming sweep — a row is dominated iff the
    * running max size M beats it, or equals it with a strictly
    * cheaper price (pM tracks the cheapest price achieving M; both
    * orders of the sort make every earlier row price-≤, so the
    * two-variable state decides dominance exactly). The oracle is
    * the textbook NOT EXISTS dominance anti-join — quadratic per
    * brand, fine for DuckDB at oracle scale; the Spark plan is
    * n log n per brand at any scale. Prices compare as exact integer
    * cents (floor(×100), same expression both engines).
    */
  val q102Skyline = QueryDef(
    "q102_skyline",
    "per-brand Pareto skyline (min price, max size) via one sorted streaming sweep",
    """WITH p AS (
      |  SELECT p_brand, p_partkey,
      |    CAST(floor(p_retailprice * 100) AS BIGINT) AS price_c, p_size
      |  FROM part)
      |SELECT p_brand, p_partkey, price_c, CAST(p_size AS INT) AS p_size
      |FROM p a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM p b
      |  -- null-safe brand match: the skyline GROUPS by brand, and a
      |  -- NULL brand is one group (= the engine's groupBy semantics);
      |  -- a bare `=` would exempt every NULL-brand row from dominance
      |  WHERE b.p_brand IS NOT DISTINCT FROM a.p_brand
      |    AND b.price_c <= a.price_c AND b.p_size >= a.p_size
      |    AND (b.price_c < a.price_c OR b.p_size > a.p_size))
      |ORDER BY p_brand, p_partkey""".stripMargin) { (s, d) =>
    import s.implicits._
    val pairs = Tables.part(s, d)
      .select(col("p_brand"),
        struct(
          floor(col("p_retailprice") * 100).cast("long").as("price_c"),
          (-col("p_size")).as("neg_size"),
          col("p_partkey"), col("p_size")).as("v"))
      .as[(String, (Long, Int, Long, Int))]
    graft.api.MapReduce.runSorted(pairs) { (brand, vs) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Int)]
      var m = Int.MinValue       // max size seen
      var pm = Long.MaxValue     // cheapest price achieving m
      for ((priceC, _, partkey, size) <- vs) {
        val dominated = m > size || (m == size && pm < priceC)
        if (!dominated) out += ((brand, partkey, priceC, size))
        if (size > m) { m = size; pm = priceC }
        else if (size == m && priceC < pm) pm = priceC
      }
      out.toSeq
    }.flatMap(identity _)
      .toDF("p_brand", "p_partkey", "price_c", "p_size")
      .orderBy(col("p_brand"), col("p_partkey"))
  }

  val all: Seq[QueryDef] = Seq(
    q01PricingSummary, q02FilterProject, q03TopRevenueOrders,
    q04JoinBroadcast, q05JoinFactFact, q06SemiJoin, q07AntiJoin,
    q08StarSchema, q09RangeJoin, q10Distinct, q53LeftOuter, q54FullOuter,
    q58RightOuter, q102Skyline)
}
