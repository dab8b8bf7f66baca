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

  test("q192 LPA matches an exact driver-side 4-round sync recompute") {
    val got = Registry.byName("q192_label_propagation").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // independent reimplementation: same graph, same deterministic
    // contract (majority label, ties to min, 4 synchronous rounds,
    // isolated nodes keep their own label)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // NB: keys/filter, NOT `Map.collect { ... => pair }` — collect
    // rebuilding pairs from a Map resolves to a Map builder and
    // silently dedups by first element (lost 2324 → 188 edges here)
    val ed = li.groupBy(_._1).values
      .flatMap { grp =>
        val ps = grp.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length)
          yield (ps(i), ps(j))
      }
      .groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = (ed ++ ed.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val nodes = li.map(_._2).distinct.sorted
    var lbl = nodes.map(n => n -> n).toMap
    (1 to 4).foreach { _ =>
      lbl = nodes.map { n =>
        val nb = adj.getOrElse(n, Seq())
        if (nb.isEmpty) n -> lbl(n)
        else {
          val counts = nb.map(lbl).groupBy(identity).view
            .mapValues(_.size).toSeq
          n -> counts.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    val sizes = lbl.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = nodes.map(n => (n, lbl(n), sizes(lbl(n))))
    assert(got.toSeq == expected.toSeq)

    // structure: communities never span disconnected nodes — every
    // community's label is one of its members
    val members = got.groupBy(_._2)
    members.foreach { case (community, ms) =>
      assert(ms.exists(_._1 == community) ||
        ms.forall(m => adj.contains(m._1)),
        s"community $community label should originate from the graph")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("q192 LPA separates planted cliques (non-degenerate fixture)") {
    import spark.implicits._
    // two disjoint 3-cliques, each basket repeated twice so every
    // in-clique pair clears the support >= 2 floor; LPA must converge
    // each clique to its own min-label community and never bridge them
    val rows = for {
      (oBase, parts) <- Seq((100L, Seq(1L, 2L, 3L)), (200L, Seq(10L, 11L, 12L)))
      o <- Seq(oBase, oBase + 1)
      p <- parts
    } yield (o, p)
    val dir = java.nio.file.Files.createTempDirectory("graft_lpa")
      .toFile.getAbsolutePath
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Registry.byName("q192_label_propagation").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L)),
      s"got $got")
    spark.sharedState.cacheManager.clearCache()
  }
}
