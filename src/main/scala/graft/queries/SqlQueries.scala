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

  private val Sql =
    """SELECT p_brand, p_partkey, p_retailprice,
      |  (SELECT count(*) FROM lineitem l WHERE l.l_partkey = p.p_partkey) AS n_li
      |FROM part p
      |WHERE p_retailprice > 5 + (SELECT avg(p2.p_retailprice) FROM part p2
      |                           WHERE p2.p_brand = p.p_brand)
      |  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
      |ORDER BY p_brand, p_partkey""".stripMargin

  val q63SqlSubqueries = QueryDef(
    "q63_sql_subqueries",
    "spark.sql text with correlated scalar / aggregate / EXISTS subqueries",
    Sql) { (s, d) =>
    Tables.part(s, d).createOrReplaceTempView("part")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(Sql)
  }

  val all: Seq[QueryDef] = Seq(q63SqlSubqueries)
}
