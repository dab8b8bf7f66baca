package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster
  * step every near-dup dedup pipeline needs after pair generation:
  * MinHash/SimHash/LSH emit *pairs*, but the keep/drop decision is
  * per *component* (one canonical document survives per duplicate
  * cluster, cf. the reference's dedup tooling which stops at pairs).
  *
  * Algorithm: hash-to-min label propagation. Every node starts
  * labeled with itself; each round every node takes the min label
  * across itself and its neighbors. The component minimum travels one
  * hop per round, so the loop converges in `diameter(G)` rounds —
  * for duplicate clusters (near-cliques by construction: members are
  * pairwise similar) that is 1–2 rounds plus one to observe the
  * fixpoint. Each round is one shuffle join (labels onto edge
  * endpoints) + one partial-aggregated groupBy min — both plain
  * hash-partitioned exchanges that scale out; nothing is ever
  * collected to the driver.
  *
  * Scale notes for 100 TB corpora:
  *  - `localCheckpoint()` after every round truncates the logical
  *    plan — without it the lineage (and Catalyst analysis time)
  *    grows linearly with rounds, the classic iterative-algorithm
  *    trap.
  *  - Convergence is detected via the SUM of labels: labels only
  *    ever decrease, so the sum is strictly monotone while anything
  *    changes and equal exactly at the fixpoint — one cheap scalar
  *    action per round instead of a change-count join.
  *  - For adversarial long-path graphs (diameter ≫ log n) the
  *    textbook upgrade is alternating large-star/small-star
  *    contraction (O(log² n) rounds; Kiveris et al., "Connected
  *    Components in MapReduce and Beyond", SoCC 2014 — public
  *    literature). Duplicate graphs never look like that, so simple
  *    propagation stays the default — but when the round cap is hit
  *    without a fixpoint, [[label]] now FALLS BACK to
  *    [[starContract]] instead of failing, so a path-shaped graph of
  *    length ≫ maxRounds still labels correctly (pinned by the
  *    `ScaleSpec` chain fixture). Pass `fallbackToStar = false` to
  *    restore the hard failure.
  */
object ConnectedComponents {

  /** Labels every node with the minimum node id of its component.
    *
    * @param nodes single-column DataFrame `id` (one row per node;
    *              isolated nodes come out as their own component)
    * @param edges two-column DataFrame `u`, `v` (undirected; may
    *              contain duplicates, either orientation)
    * @param maxRounds safety cap on propagation rounds
    * @param fallbackToStar on cap-hit without a fixpoint, rerun via
    *                       [[starContract]] (O(log² n) rounds regardless
    *                       of diameter) instead of throwing
    * @return DataFrame (`id`, `component`) where `component` is the
    *         min id reachable from `id`
    */
  def label(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 50,
      fallbackToStar: Boolean = true): DataFrame = {
    // integral ids only: the min-label algebra and the decimal
    // convergence checksum are exact for integers; strings would
    // propagate lexicographic minima but checksum as null (silently
    // "converged"), and doubles would truncate in the checksum
    import org.apache.spark.sql.types._
    val idType = nodes.schema("id").dataType
    require(Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"ConnectedComponents needs an integral id column, got ${idType.sql}")
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("lbl")).localCheckpoint()
    var prevSum: BigDecimal = null
    var curSum = checksum(labels)
    var round = 0
    while ((prevSum == null || curSum < prevSum) && round < maxRounds) {
      val nbrMin = sym
        .join(labels.select(col("id").as("v"), col("lbl").as("vlbl")), "v")
        .groupBy(col("u"))
        .agg(min(col("vlbl")).as("nbr"))
        .select(col("u").as("id"), col("nbr"))
      val next = labels
        .join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbr"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      labels = next
      prevSum = curSum
      curSum = checksum(labels)
      round += 1
    }
    if (round >= maxRounds && prevSum != null && curSum < prevSum) {
      // exiting via the cap, not the fixpoint: labels are NOT final.
      // A silent return would hand the caller wrong components — so
      // either fail loudly or switch to the diameter-independent
      // star-contraction algorithm.
      if (fallbackToStar) return starContract(nodes, edges)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge within $maxRounds rounds " +
          "(graph diameter exceeds the cap); raise maxRounds")
    }
    labels.select(col("id"), col("lbl").as("component"))
  }

  /** Alternating large-star/small-star edge contraction (Kiveris et
    * al., SoCC 2014): each round rewires every node's strictly-larger
    * (large-star) then smaller-or-equal (small-star) neighbors to its
    * neighborhood minimum. Distances to the component minimum shrink
    * multiplicatively, so a path of length L needs O(log² L) rounds
    * where hash-to-min propagation needs L — the escape hatch for
    * diameter ≫ maxRounds graphs. At the fixpoint the edge set is a
    * star forest (every edge points at its component's min id); labels
    * read straight off the edges. Each half-round is one groupBy +
    * one keyed join — the same shuffle class as propagation — and the
    * edge set never grows beyond the input edge count.
    */
  def starContract(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    val idType = nodes.schema("id").dataType
    import org.apache.spark.sql.types._
    require(Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"ConnectedComponents needs an integral id column, got ${idType.sql}")
    // canonical undirected edges, no self-loops
    var e = edges
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    def largeStar(ed: DataFrame): DataFrame = {
      val sym = ed.union(ed.select(col("v").as("u"), col("u").as("v")))
      val mn = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mnv"))
        .select(col("u"), least(col("u"), col("mnv")).as("m"))
      sym.join(mn, "u")
        .filter(col("v") > col("u"))
        .select(col("m").as("u"), col("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(ed: DataFrame): DataFrame = {
      // orient to (big, small); every node's smaller neighbors plus
      // itself rewire to the minimum of that set
      val or = ed.select(greatest(col("u"), col("v")).as("b"),
        least(col("u"), col("v")).as("s"))
      val mn = or.groupBy(col("b")).agg(min(col("s")).as("m"))
      or.join(mn, "b")
        .select(col("m").as("u"), col("s").as("v"))
        .union(mn.select(col("m").as("u"), col("b").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var prev: (Long, BigDecimal) = null
    var cur = edgeChecksum(e)
    var round = 0
    while ((prev == null || cur != prev) && round < maxRounds) {
      e = smallStar(largeStar(e)).localCheckpoint()
      prev = cur
      cur = edgeChecksum(e)
      round += 1
    }
    if (round >= maxRounds && cur != prev)
      throw new IllegalStateException(
        s"starContract did not converge within $maxRounds rounds")
    // fixpoint: edges are (root, member) stars; isolated nodes label
    // themselves
    nodes
      .join(e.select(col("v").as("id"), col("u").as("root")), Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("root"), col("id")).as("component"))
  }

  /** Set-identity checksum for the contraction fixpoint test: (edge
    * count, sum of per-edge xxhash64) — cheap, order-independent, and
    * a collision would need two edge SETS with equal count and equal
    * 64-bit hash sum within one run.
    */
  private def edgeChecksum(e: DataFrame): (Long, BigDecimal) = {
    val r = e.agg(
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")), lit(0))
        .cast("decimal(38,0)").as("h")).first()
    (r.getLong(0), BigDecimal(r.getDecimal(1)))
  }

  /** Convergence checksum: labels only ever decrease, so the label sum
    * is strictly monotone until the fixpoint. Summed as decimal(38,0)
    * — a Long sum could wrap at extreme scale and fake convergence.
    * The coalesce covers exactly ONE legitimate null (the empty node
    * set); a null-producing label cast would silently read 0 every
    * round and fake convergence, so it is checked and rejected (the
    * integral-id gate in `label` should make that unreachable).
    */
  private def checksum(labels: DataFrame): BigDecimal = {
    val r = labels.agg(
      count(lit(1)).as("n"),
      count(col("lbl").cast("decimal(38,0)")).as("castable"),
      coalesce(sum(col("lbl").cast("decimal(38,0)")), lit(0))
        .cast("decimal(38,0)").as("s")).first()
    require(r.getLong(0) == r.getLong(1),
      "ConnectedComponents labels stopped being numeric — checksum would be meaningless")
    BigDecimal(r.getDecimal(2))
  }
}
