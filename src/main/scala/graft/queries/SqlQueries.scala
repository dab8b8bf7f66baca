package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** The `spark.sql` entry path — every other query declares its plan
  * through the DataFrame DSL; this one runs ANSI SQL text against
  * registered temp views, exercising the parser/analyzer route a SQL
  * user of the library takes, plus the subquery forms only the SQL
  * surface exposes: a correlated scalar subquery in SELECT (rewritten
  * by Catalyst to an aggregate + left outer join), a correlated
  * aggregate threshold in WHERE (rewritten to aggregate + inner
  * join), and EXISTS (rewritten to left semi join). Same text
  * (modulo nothing) runs on DuckDB as the oracle. The +5 margin over
  * the brand average keeps the filter selective at every scale
  * factor (sf0.001's 200-part table deviates at most ~10.7 from its
  * brand means) while every qualifying row sits ≥0.003 from the
  * threshold — 10 orders of magnitude above cross-engine
  * avg() summation noise, so the hash compare can't flip.
  */
object SqlQueries {

  /** The query text, parameterized on the two table names so each
    * invocation can bind its own uniquely-named temp views (temp
    * views are session-global — fixed names would race when two
    * queries run concurrently on one shared SparkSession, the normal
    * deployment for a query library; `ConcurrencySpec` pins this).
    */
  private def sqlFor(part: String, lineitem: String): String =
    s"""SELECT p_brand, p_partkey, p_retailprice,
       |  (SELECT count(*) FROM $lineitem l WHERE l.l_partkey = p.p_partkey) AS n_li
       |FROM $part p
       |WHERE p_retailprice > 5 + (SELECT avg(p2.p_retailprice) FROM $part p2
       |                           WHERE p2.p_brand = p.p_brand)
       |  AND EXISTS (SELECT 1 FROM $lineitem l WHERE l.l_partkey = p.p_partkey)
       |ORDER BY p_brand, p_partkey""".stripMargin

  val q63SqlSubqueries = QueryDef(
    "q63_sql_subqueries",
    "spark.sql text with correlated scalar / aggregate / EXISTS subqueries",
    sqlFor("part", "lineitem")) { (s, d) =>
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val (pv, lv) = (s"part_$tag", s"lineitem_$tag")
    Tables.part(s, d).createOrReplaceTempView(pv)
    Tables.lineitem(s, d).createOrReplaceTempView(lv)
    try s.sql(sqlFor(pv, lv))
    finally {
      // the returned plan is already analyzed (views resolved) — the
      // temp catalog entries can drop immediately
      s.catalog.dropTempView(pv)
      s.catalog.dropTempView(lv)
      ()
    }
  }

  val all: Seq[QueryDef] = Seq(q63SqlSubqueries)
}
