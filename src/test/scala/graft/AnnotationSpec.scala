package graft

import graft.queries.AnnotationQueries

/** Label-consolidation and preference-aggregation semantics, pinned
  * against driver-side recomputation from first principles (the
  * StatisticsSpec convention): the DuckDB oracle proves engine parity,
  * these prove the MATH is the one the scaladoc claims.
  */
class AnnotationSpec extends SparkSpec {

  test("q155 matches a driver-side majority/agreement recompute") {
    val got = AnnotationQueries.q155LabelConsolidation.fn(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> r).toMap

    val votes = Tables.events(spark, sfDir)
      .select("user_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1)
      .map { case (u, evs) => u -> evs.map(_._2) }

    assert(got.keySet == votes.keySet, "one output row per annotated item")
    votes.foreach { case (u, labels) =>
      val counts = labels.groupBy(identity).map { case (l, ls) => l -> ls.size.toLong }
      val n = labels.size.toLong
      val topVotes = counts.values.max
      val topLabel = counts.filter(_._2 == topVotes).keys.min
      val samePairs = counts.values.map(c => c * (c - 1)).sum
      val r = got(u)
      assert(r.getAs[Long]("n_votes") == n)
      assert(r.getAs[String]("top_label") == topLabel, s"item $u majority label")
      assert(r.getAs[Long]("top_votes") == topVotes)
      assert(r.getAs[Long]("consensus_bp") == 10000 * topVotes / n)
      if (n < 2) assert(r.isNullAt(r.fieldIndex("pair_agree_bp")))
      else assert(r.getAs[Long]("pair_agree_bp") == 10000 * samePairs / (n * (n - 1)))
    }
  }

  test("q155 agreement bounds: consensus within [10000/k, 10000], pair agreement <= consensus") {
    AnnotationQueries.q155LabelConsolidation.fn(spark, sfDir).collect().foreach { r =>
      val consensus = r.getAs[Long]("consensus_bp")
      assert(consensus > 0 && consensus <= 10000)
      assert(r.getAs[Long]("top_votes") <= r.getAs[Long]("n_votes"))
      if (!r.isNullAt(r.fieldIndex("pair_agree_bp"))) {
        val pair = r.getAs[Long]("pair_agree_bp")
        // P_o is maximized when all votes agree; unanimous items hit both at 10000
        assert(pair >= 0 && pair <= 10000)
      }
    }
  }

  test("q156 Copeland points conserve: every pair awards exactly 2, matchup totals close") {
    val rows = AnnotationQueries.q156PreferenceCopeland.fn(spark, sfDir).collect()
    val k = rows.length
    assert(k >= 2, "needs at least two labels to rank")
    assert(rows.map(_.getAs[Long]("copeland_2x")).sum == k.toLong * (k - 1),
      "sum of copeland_2x must equal 2 * C(k,2)")
    val nItems = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("matchups") == k - 1)
      assert(r.getAs[Long]("wins") + r.getAs[Long]("losses") +
        r.getAs[Long]("ties") == (k - 1) * nItems,
        "every item votes on every matchup (dense grid fills absent labels with 0)")
      assert(r.getAs[Long]("copeland_2x") <= 2L * (k - 1))
    }
  }

  test("q156 matches a driver-side matchup recompute") {
    val got = AnnotationQueries.q156PreferenceCopeland.fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val labels = Seq("click", "error", "purchase", "signup", "view")

    val cents = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "value")
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1)
      .map { case (key, vs) => key -> vs.map(_._2).sum }
      .withDefaultValue(0L)
    val users = cents.keys.map(_._1).toSeq.distinct

    val wins = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    val ties = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    for (u <- users; a <- labels; b <- labels if a < b) {
      val (sa, sb) = (cents((u, a)), cents((u, b)))
      if (sa > sb) wins((a, b)) += 1
      else if (sb > sa) wins((b, a)) += 1
      else ties((a, b)) += 1
    }
    labels.foreach { t =>
      val w = labels.filter(_ != t).map(o => wins((t, o))).sum
      val l = labels.filter(_ != t).map(o => wins((o, t))).sum
      val cop = labels.filter(_ != t).map { o =>
        val (wt, wo) = (wins((t, o)), wins((o, t)))
        if (wt > wo) 2L else if (wt == wo) 1L else 0L
      }.sum
      val r = got(t)
      assert(r.getAs[Long]("wins") == w, s"$t wins")
      assert(r.getAs[Long]("losses") == l, s"$t losses")
      assert(r.getAs[Long]("copeland_2x") == cop, s"$t copeland")
    }
  }

  test("q186 Bradley-Terry matches an exact driver-side MM recompute") {
    val got = AnnotationQueries.q186BradleyTerry.fn(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("games"), r.getAs[Long]("wins"), r.getAs[Long]("strength_ppm")))
      .toMap

    // replay the exact integer MM arithmetic from the collected
    // matchup matrix: BigInt mirrors DECIMAL(38,0), / on positive
    // BigInts mirrors `div`/`//`
    val m = AnnotationQueries.labelMatchups(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("wa"), r.getAs[Long]("wb")))
    val items = m.flatMap(x => Seq(x._1, x._2)).distinct.sorted
    val n = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    val w = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    m.foreach { case (a, b, wa, wb) =>
      n((a, b)) = wa + wb; n((b, a)) = wa + wb
      w(a) += wa; w(b) += wb
    }
    val scale = BigInt("1000000000000")
    def step(s: Map[String, BigInt]): Map[String, BigInt] = {
      val raw = items.map { i =>
        val den = items.filter(_ != i).map { j =>
          val nij = BigInt(n((i, j)))
          if (nij == 0) BigInt(0) else nij * scale / (s(i) + s(j))
        }.sum
        i -> (if (den > 0) BigInt(w(i)) * scale / den else BigInt(1000000))
      }.toMap
      val tot = raw.values.sum
      val k = BigInt(items.size)
      raw.map { case (i, r) => i -> (r * k * 1000000 / tot).max(BigInt(1)) }
    }
    val s0 = items.map(_ -> BigInt(1000000)).toMap
    val expected = step(step(s0))

    assert(got.keySet == items.toSet, "one row per label")
    items.foreach { i =>
      val (games, wins, strength) = got(i)
      val g = items.filter(_ != i).map(j => n((i, j))).sum
      assert(games == g, s"$i decisive games")
      assert(wins == w(i), s"$i wins")
      assert(strength == expected(i).toLong, s"$i MM strength")
      assert(strength >= 1, s"$i strength positive")
    }
  }
}
