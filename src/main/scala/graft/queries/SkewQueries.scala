package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Skew-handling surface: the salting idiom for joins on heavily
  * skewed keys (SURVEY.md "salting for skew, AQE"). `l_returnflag`
  * has 3 values over ~600k rows at sf0.1 — a worst-case skew key. A
  * plain shuffle join on it puts each value on one reducer; salting
  * splits every hot key across `Salt` partitions: the fact side gets
  * a deterministic salt from its row key, the (small) dim side is
  * replicated once per salt value, and the join key becomes
  * (key, salt). Result is provably identical to the unsalted join —
  * the oracle IS the unsalted join.
  */
object SkewQueries {

  private val Salt = 16

  val q51SaltedJoin = QueryDef(
    "q51_salted_join",
    "salted join on a 3-value skew key == plain join (oracle is the unsalted join)",
    """SELECT f.flag, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
      |       count(*) AS n
      |FROM lineitem l
      |JOIN (VALUES ('A', 0.10), ('N', 0.05), ('R', 0.25)) AS f(flag, penalty)
      |  ON l.l_returnflag = f.flag
      |GROUP BY f.flag
      |ORDER BY f.flag""".stripMargin) { (s, d) =>
    import s.implicits._
    // dim side: tiny in-memory rate table keyed by the skewed column,
    // replicated once per salt bucket
    val dim = Seq(("A", 0.10), ("N", 0.05), ("R", 0.25)).toDF("flag", "penalty")
      .withColumn("salt", explode(sequence(lit(0), lit(Salt - 1))))
    // fact side: deterministic salt derived from the row's unique key
    val fact = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_discount"),
        pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(Salt)).as("salt"))
    fact
      .join(dim, fact("l_returnflag") === dim("flag") && fact("salt") === dim("salt"))
      .groupBy(col("flag"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("flag"))
  }

  val all: Seq[QueryDef] = Seq(q51SaltedJoin)
}
