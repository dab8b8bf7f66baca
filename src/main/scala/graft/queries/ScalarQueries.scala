package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Scalar function library coverage (SURVEY.md §2.2 "Scalar fns"):
  * string, date/time, JSON extraction, math, conditional logic. All
  * per-row (narrow) operations — no shuffle at all; the whole plan is
  * scan → project → sort, and every function here is a codegen'd
  * Catalyst built-in.
  *
  * Oracle-parity notes: per-row double arithmetic is IEEE-exact in
  * both engines so results compare bit-equal; transcendental functions
  * are restricted to sqrt/abs/floor/ceil/power (exactly-rounded or
  * integral) to avoid libm last-ulp divergence between JVM and C.
  */
object ScalarQueries {

  val q22StringFuncs = QueryDef(
    "q22_string_funcs",
    "lower/upper/substring/concat/replace/regexp_extract/length over part names",
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_uc,
      |  length(p_name) AS name_len,
      |  substring(p_name, 1, 8) AS name_prefix,
      |  p_brand || ':' || p_type AS brand_type,
      |  replace(p_type, ' ', '_') AS type_snake,
      |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
      |  CAST(contains(p_type, 'BRASS') AS BOOLEAN) AS is_brass
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        col("p_type").contains("BRASS").as("is_brass"))
      .orderBy(col("p_partkey"))
  }

  val q23DateFuncs = QueryDef(
    "q23_date_funcs",
    "date_trunc/year/month/quarter/dayofweek + date arithmetic over orders",
    """SELECT CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  count(*) AS n_orders,
      |  min(CAST(o_orderdate AS DATE)) AS first_day,
      |  CAST(count(DISTINCT date_trunc('week', o_orderdate)) AS BIGINT) AS n_weeks
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY y, m""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("int").as("y"),
        month(col("o_orderdate")).cast("int").as("m"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_orderdate").cast("date")).as("first_day"),
        countDistinct(date_trunc("week", col("o_orderdate"))).as("n_weeks"))
      .orderBy(col("y"), col("m"))
  }

  /** JSON extraction from events.props (`{"k": 87}`). Spark
    * get_json_object ≙ DuckDB json_extract_string, compared as BIGINT.
    */
  val q24JsonFuncs = QueryDef(
    "q24_json_funcs",
    "get_json_object / from_json over events.props + agg on extracted key",
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      |FROM events
      |GROUP BY 1
      |ORDER BY k_bucket""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("k_bucket",
        get_json_object(col("props"), "$.k").cast("bigint") % 10)
      .groupBy(col("k_bucket"))
      // per-row integer cents (q01 convention) — order-independent sums
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")).cast("double")
          / 100.0).as("sum_value"))
      .orderBy(col("k_bucket"))
  }

  val q25MathFuncs = QueryDef(
    "q25_math_funcs",
    "sqrt/abs/floor/ceil/power/mod — exactly-rounded math only",
    """SELECT s_suppkey,
      |  abs(s_acctbal) AS abs_bal,
      |  CAST(floor(s_acctbal) AS BIGINT) AS floor_bal,
      |  CAST(ceil(s_acctbal) AS BIGINT) AS ceil_bal,
      |  sqrt(abs(s_acctbal)) AS sqrt_bal,
      |  power(CAST(s_suppkey AS DOUBLE), 2) AS key_sq,
      |  s_suppkey % 7 AS key_mod
      |FROM supplier
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    Tables.supplier(s, d)
      .select(col("s_suppkey"),
        abs(col("s_acctbal")).as("abs_bal"),
        floor(col("s_acctbal")).as("floor_bal"),
        ceil(col("s_acctbal")).as("ceil_bal"),
        sqrt(abs(col("s_acctbal"))).as("sqrt_bal"),
        pow(col("s_suppkey").cast("double"), 2).as("key_sq"),
        (col("s_suppkey") % 7).as("key_mod"))
      .orderBy(col("s_suppkey"))
  }

  val q26CaseWhen = QueryDef(
    "q26_case_when",
    "CASE WHEN / coalesce / nullif conditional logic + conditional aggregation",
    """SELECT
      |  CASE WHEN o_totalprice >= 300000 THEN 'high'
      |       WHEN o_totalprice >= 100000 THEN 'mid'
      |       ELSE 'low' END AS price_class,
      |  count(*) AS n_orders,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
      |  CAST(count(nullif(o_orderstatus, 'F')) AS BIGINT) AS n_not_finished
      |FROM orders
      |GROUP BY 1
      |ORDER BY price_class""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .withColumn("price_class",
        when(col("o_totalprice") >= 300000, "high")
          .when(col("o_totalprice") >= 100000, "mid")
          .otherwise("low"))
      .groupBy(col("price_class"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("bigint").as("n_finished"),
        count(nullif(col("o_orderstatus"), lit("F"))).cast("bigint").as("n_not_finished"))
      .orderBy(col("price_class"))
  }

  /** Null handling — the data-cleaning stage (`DataFrameNaFunctions`):
    * nulls are synthesized deterministically (nullif on a status
    * value, a key-modulus hole in price), then `na.fill` imputes the
    * categorical default and `na.drop` removes rows missing the
    * required measure. The oracle spells the same cleaning with
    * COALESCE + IS NOT NULL — proving fill/drop are exactly those
    * relational forms.
    */
  val q67NullHandling = QueryDef(
    "q67_null_handling",
    "na.fill / na.drop cleaning over synthesized nulls, audited per status",
    """WITH t AS (
      |  SELECT o_orderkey,
      |         nullif(o_orderstatus, 'O') AS st,
      |         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS price
      |  FROM orders),
      |cleaned AS (
      |  SELECT o_orderkey, coalesce(st, 'UNKNOWN') AS st, price
      |  FROM t WHERE price IS NOT NULL)
      |SELECT st, count(*) AS n,
      |       CAST(sum(CAST(round(price * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
      |FROM cleaned
      |GROUP BY st
      |ORDER BY st""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("st"),
        when(pmod(col("o_orderkey"), lit(7)) === 0, lit(null))
          .otherwise(col("o_totalprice")).as("price"))
      .na.fill(Map("st" -> "UNKNOWN"))
      .na.drop(Seq("price"))
      .groupBy(col("st"))
      // per-row integer cents (q01 convention): 3 status groups span
      // the whole orders table — data-scaled money sums stay exact
      .agg(count(lit(1)).as("n"),
        (sum(round(col("price") * 100).cast("long")).cast("double") / 100.0)
          .as("total"))
      .orderBy(col("st"))
  }

  val all: Seq[QueryDef] = Seq(
    q22StringFuncs, q23DateFuncs, q24JsonFuncs, q25MathFuncs, q26CaseWhen,
    q67NullHandling)
}
