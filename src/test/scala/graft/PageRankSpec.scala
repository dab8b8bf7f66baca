package graft

import graft.api.PageRank
import org.apache.spark.sql.functions._

/** Structural invariants of the integer fixed-point PageRank. */
class PageRankSpec extends SparkSpec {

  test("on a regular ring every node gets the identical score") {
    import spark.implicits._
    val n = 12
    val ring = (0 until n).flatMap(i =>
      Seq((i.toLong, ((i + 1) % n).toLong, 1L),
        (((i + 1) % n).toLong, i.toLong, 1L)))
      .toDF("src", "dst", "w")
    val scores = PageRank.weighted(ring, 5)
    assert(scores.select(col("score")).distinct().count() == 1)
    assert(scores.count() == n)
  }

  test("a hub out-scores leaves and total mass stays near n * Scale") {
    import spark.implicits._
    // star: hub 0 <-> leaves 1..8
    val star = (1 to 8).flatMap(i =>
      Seq((0L, i.toLong, 1L), (i.toLong, 0L, 1L))).toDF("src", "dst", "w")
    val s = PageRank.weighted(star, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1 to 8).forall(i => s(0L) > s(i.toLong)))
    val total = s.values.sum
    // integer floors only lose mass, never create it
    assert(total <= 9L * PageRank.Scale)
    assert(total > (9L * PageRank.Scale * 9) / 10)
  }

  test("scores are invariant under repartitioning (integer sums commute)") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L, 3L), (2L, 1L, 3L), (2L, 3L, 1L), (3L, 2L, 1L),
      (3L, 1L, 2L), (1L, 3L, 2L)).toDF("src", "dst", "w")
    val a = PageRank.weighted(edges, 4).orderBy("node").collect().toSeq
    val b = PageRank.weighted(edges.repartition(7), 4)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }
}
