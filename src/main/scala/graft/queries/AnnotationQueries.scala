package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Human-feedback / annotation aggregation operators — the label-
  * consolidation layer an RLHF or supervised-data pipeline runs after
  * raw judgments are collected (reference analogue: a reduce over
  * per-key vote lists, `reducer.c`'s merge loop; re-expressed as
  * partial-aggregable keyed shuffles).
  *
  * The fixture treats `events` as a judgment log: `user_id` is the
  * annotated item, each event is one vote whose label is `event_type`
  * and whose strength is the integer-cents `value` — the shapes (many
  * votes per item, small label enum) match a production annotation
  * table exactly.
  *
  * Determinism contract: counts and integer cents only across every
  * exchange; ties break lexicographically on the label (computed via
  * a max-count join-back, NOT an enum-index trick, so the queries
  * work on any label set); `div` flooring only at output.
  */
object AnnotationQueries {

  /** Majority-vote label consolidation + inter-annotator agreement.
    * Per item: total votes, the winning label (most votes, ties to
    * the lexicographically smallest — the only deterministic contract
    * under parallel aggregation), consensus share in basis points,
    * and the pairwise observed agreement `Σ n_c(n_c−1) / (n(n−1))`
    * (the per-item numerator of Fleiss' kappa's P̄ₒ) — the signal
    * annotation-QA dashboards threshold to route items to re-review.
    *
    * Scale shape: ONE (item, label) partial-aggregable shuffle, then
    * two same-key aggregates and a join-back on the already-grouped
    * relation — every exchange is keyed by item, no windows, no
    * driver state. NULL pair agreement on single-vote items (0/0)
    * rather than a fabricated 10000.
    */
  val q155LabelConsolidation = QueryDef(
    "q155_label_consolidation",
    "majority-vote label consolidation + pairwise annotator agreement (Fleiss P_o numerator) per item",
    """WITH v AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      |           FROM events GROUP BY user_id, event_type),
      |a AS (SELECT user_id, CAST(max(c) AS BIGINT) AS top_votes,
      |             CAST(sum(c) AS BIGINT) AS n_votes,
      |             CAST(sum(c * (c - 1)) AS BIGINT) AS same_pairs
      |      FROM v GROUP BY user_id),
      |t AS (SELECT v.user_id, min(v.event_type) AS top_label
      |      FROM v JOIN a ON a.user_id = v.user_id AND v.c = a.top_votes
      |      GROUP BY v.user_id)
      |SELECT a.user_id, a.n_votes, t.top_label, a.top_votes,
      |  (10000 * a.top_votes) // a.n_votes AS consensus_bp,
      |  CASE WHEN a.n_votes < 2 THEN NULL
      |       ELSE (10000 * a.same_pairs) // (a.n_votes * (a.n_votes - 1)) END AS pair_agree_bp
      |FROM a JOIN t ON t.user_id = a.user_id
      |ORDER BY a.user_id""".stripMargin) { (s, d) =>
    val v = Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val a = v.groupBy(col("user_id"))
      .agg(max(col("c")).as("top_votes"),
        sum(col("c")).as("n_votes"),
        sum(col("c") * (col("c") - 1)).as("same_pairs"))
    // join-back through RENAMED columns: `a` is an aggregate OF `v`, so
    // a same-name condition would be an ambiguous self-join reference
    val ar = a.select(col("user_id").as("uid"), col("top_votes").as("tv"))
    val t = v.join(ar, col("user_id") === col("uid") && col("c") === col("tv"))
      .groupBy(col("user_id"))
      .agg(min(col("event_type")).as("top_label"))
    a.join(t, "user_id")
      .select(col("user_id"), col("n_votes"), col("top_label"),
        col("top_votes"),
        expr("(10000 * top_votes) div n_votes").as("consensus_bp"),
        when(col("n_votes") < 2, lit(null).cast("long"))
          .otherwise(expr("(10000 * same_pairs) div (n_votes * (n_votes - 1))"))
          .as("pair_agree_bp"))
      .orderBy(col("user_id"))
  }

  /** Pairwise-preference aggregation via Copeland scoring — the
    * deterministic integer alternative to a Bradley–Terry MLE (whose
    * iterative float fit has no engine-stable replay): each item
    * (user) casts one comparison per unordered label pair, a label
    * "beats" another for that item when its total integer-cents
    * strength is strictly larger, and a label's Copeland score earns
    * 2 per opponent it beats on aggregate wins and 1 per exact tie —
    * so Σ copeland_2x = 2·C(|labels|,2) always. This is the
    * preference-consolidation step of an RLHF reward-data pipeline
    * (which label do raters prefer, marginalizing over raters).
    *
    * Scale shape: one (item, label) partial-aggregable shuffle, a
    * dense item×label grid via a BROADCAST constant label relation
    * (absent labels count as 0-strength, so every item votes on every
    * pair), then an item-keyed self-join whose fan-out is bounded by
    * |labels|² — q142's bounded-enum join idiom — collapsing straight
    * to a |labels|²-row matchup matrix. The corpus never moves twice.
    */
  val q156PreferenceCopeland = QueryDef(
    "q156_preference_copeland",
    "pairwise preference aggregation: per-item label matchups -> Copeland ranking (integer-exact RLHF vote consolidation)",
    """WITH s0 AS (SELECT user_id, event_type,
      |                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |            FROM events GROUP BY user_id, event_type),
      |u AS (SELECT DISTINCT user_id FROM events),
      |ty AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
      |dense AS (SELECT u.user_id, ty.event_type, coalesce(s0.cents, 0) AS cents
      |          FROM u CROSS JOIN ty
      |          LEFT JOIN s0 ON s0.user_id = u.user_id AND s0.event_type = ty.event_type),
      |m AS (SELECT a.event_type AS ta, b.event_type AS tb,
      |             CAST(sum(CASE WHEN a.cents > b.cents THEN 1 ELSE 0 END) AS BIGINT) AS wa,
      |             CAST(sum(CASE WHEN b.cents > a.cents THEN 1 ELSE 0 END) AS BIGINT) AS wb,
      |             CAST(sum(CASE WHEN a.cents = b.cents THEN 1 ELSE 0 END) AS BIGINT) AS ties
      |      FROM dense a JOIN dense b ON a.user_id = b.user_id AND a.event_type < b.event_type
      |      GROUP BY a.event_type, b.event_type),
      |d AS (SELECT ta AS event_type, wa AS w, wb AS l, ties FROM m
      |      UNION ALL SELECT tb, wb, wa, ties FROM m)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS matchups,
      |  CAST(sum(w) AS BIGINT) AS wins, CAST(sum(l) AS BIGINT) AS losses,
      |  CAST(sum(ties) AS BIGINT) AS ties,
      |  CAST(sum(CASE WHEN w > l THEN 2 WHEN w = l THEN 1 ELSE 0 END) AS BIGINT) AS copeland_2x
      |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val labels = Seq("click", "error", "purchase", "signup", "view")
    val s0 = Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
    val u = Tables.events(s, d).select(col("user_id")).distinct()
    val ty = s.createDataFrame(
      s.sparkContext.parallelize(labels.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType, nullable = false))))
    val dense = u.crossJoin(broadcast(ty))
      .join(s0, Seq("user_id", "event_type"), "left_outer")
      .select(col("user_id"), col("event_type"),
        coalesce(col("cents"), lit(0L)).as("cents"))
    val a = dense.alias("a")
    val b = dense.alias("b")
    val m = a.join(b,
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(sum(when(col("a.cents") > col("b.cents"), 1L).otherwise(0L)).as("wa"),
        sum(when(col("b.cents") > col("a.cents"), 1L).otherwise(0L)).as("wb"),
        sum(when(col("a.cents") === col("b.cents"), 1L).otherwise(0L)).as("ties"))
    val dir = m.select(col("ta").as("event_type"), col("wa").as("w"),
        col("wb").as("l"), col("ties"))
      .unionAll(m.select(col("tb").as("event_type"), col("wb").as("w"),
        col("wa").as("l"), col("ties")))
    dir.groupBy(col("event_type"))
      .agg(count(lit(1)).as("matchups"),
        sum(col("w")).as("wins"),
        sum(col("l")).as("losses"),
        sum(col("ties")).as("ties"),
        sum(when(col("w") > col("l"), 2L)
          .when(col("w") === col("l"), 1L).otherwise(0L)).as("copeland_2x"))
      .orderBy(col("event_type"))
  }

  val all: Seq[QueryDef] = Seq(q155LabelConsolidation, q156PreferenceCopeland)
}
