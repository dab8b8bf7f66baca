package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions

/** Round-18 native kernels: lcp_tokens (token-level LCP over
  * space-joined strings) must equal the interpreted zip_with fold it
  * replaced in the ExactSubstr family, vec_qmilli must equal the
  * interpreted transform lambda it replaced in the IVF family, and
  * the vec_dot/vec_distsq length/null semantics must match the
  * aggregate(zip_with(...)) forms they stand in for (round-17 ADVICE:
  * a shorter right or a null element yields NULL, never a crash).
  */
class VecKernelSpec extends SparkSpec {

  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  /** The replaced interpreted spelling of token-array LCP. */
  private def lcpHof(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val fp = array_position(zip_with(a, b, (x, y) => x === y), lit(false))
    when(b.isNull, lit(0L))
      .when(fp > 0, fp - 1)
      .otherwise(least(size(a), size(b)).cast("long"))
  }

  test("lcp_tokens equals the zip_with fold on joined token arrays") {
    val cases = Seq(
      (Seq("a", "b", "c"), Seq("a", "b", "c")), // identical
      (Seq("a", "b"), Seq("a", "b", "c")), // whole-token prefix
      (Seq("a", "b", "c"), Seq("a", "b")), // reversed prefix
      (Seq("ab", "c"), Seq("abc")), // byte prefix, token mismatch
      (Seq("ab"), Seq("ab", "cd")), // single-token prefix
      (Seq("ab", "c"), Seq("ab", "cd")), // mismatch inside token 2
      (Seq("x"), Seq("y")), // immediate mismatch
      (Seq("héllo", "wörld"), Seq("héllo", "wörld", "z")), // multi-byte
      (Seq("héllo", "wörld"), Seq("héllo", "wörl")), // multi-byte mismatch
      (Seq("a", "bb", "ccc", "dddd"), Seq("a", "bb", "ccc", "dddx")))
    val df = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        lcpHof(col("a"), col("b")).as("want"),
        GraftFunctions.lcpTokens(
          array_join(col("a"), " "), array_join(col("b"), " ")).as("got"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("got") == r.getAs[Long]("want"),
        s"lcp mismatch on ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}: " +
          s"got ${r.getAs[Long]("got")}, want ${r.getAs[Long]("want")}")
    }
  }

  test("lcp_tokens: null side is null (callers coalesce to 0); empty string is 0 tokens") {
    val r = spark.sql(
      "SELECT lcp_tokens('a b', CAST(NULL AS STRING)) AS n, " +
        "lcp_tokens('', 'a') AS e, lcp_tokens('a', '') AS e2").head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
  }

  test("vec_qmilli equals the interpreted transform lambda bit-for-bit") {
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(50)(Seq.fill(1 + rnd.nextInt(24))(rnd.nextGaussian()))
    val df = vecs.toDF("v")
      .withColumn("nrm2", GraftFunctions.vecDot(col("v"), col("v")))
      .filter(col("nrm2") > 0)
      .select(
        transform(col("v"),
          x => floor(lit(1000.0) * x / sqrt(col("nrm2")) + lit(0.5))
            .cast("long")).as("want"),
        GraftFunctions.vecQMilli(col("v"), col("nrm2")).as("got"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"qmilli mismatch: ${r.getSeq[Long](1)} vs ${r.getSeq[Long](0)}")
    }
  }

  test("vec_dot/vec_distsq: shorter right yields NULL like the zip_with fold") {
    val r = spark.sql(
      "SELECT vec_dot(array(1L,2L,3L), array(1L,2L)) AS d, " +
        "vec_distsq(array(1L,2L,3L), array(1L,2L)) AS q, " +
        "vec_dot(array(1L,2L), array(3L,4L,5L)) AS ok").head()
    assert(r.isNullAt(0) && r.isNullAt(1),
      "shorter right must yield NULL (the padded-fold semantics)")
    assert(r.getLong(2) == 11L, "longer right still dots over left length")
  }

  test("topk_by_score_str equals row_number (score DESC, id ASC) per group") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      (s"g${i % 4}", s"t${rnd.nextInt(40)}_${i % 7}", rnd.nextInt(20).toLong)
    }
    val df = rows.toDF("g", "term", "score")
      .groupBy(col("g"), col("term")).agg(max(col("score")).as("score"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("term"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("g"), col("rn").cast("long").as("rn"), col("term"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val got = df.groupBy(col("g"))
      .agg(GraftFunctions.topkByScoreStr(
        col("score").cast("double"), col("term"), 5).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1L).as("rn"), col("e.id").as("term"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want)
  }

  test("vec_dot: null element in range yields NULL (fold semantics)") {
    val r = spark.sql(
      "SELECT vec_dot(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)) AS d, " +
        "vec_dot(array(1.0D, 2.0D), array(1.0D, CAST(NULL AS DOUBLE))) AS e").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
