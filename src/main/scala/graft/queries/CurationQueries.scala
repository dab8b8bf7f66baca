package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.api.SequencePacker

/** End-to-end corpus-curation pipeline — the composition story the
  * individual LLM-pipeline operators exist for, as ONE declarative
  * plan: tokenize → minimum-length gate → quality filter (type-token
  * ratio in integer basis points, same arithmetic as q29) → exact
  * content dedup (sha-256 group, min doc_id survives, as q33) →
  * deterministic per-language mixing (key-modulus rates, as q57) →
  * per-(lang, source) audit summary.
  *
  * Every stage is engine-independent (integer bp arithmetic, content
  * hash, key modulus) so the full five-stage pipeline is replayed
  * exactly by the DuckDB oracle — correctness of the COMPOSITION is
  * oracle-checked, not just each stage alone.
  *
  * Scale shape: one scan; the quality gate is a per-row project +
  * filter (pushable, no shuffle); dedup is one hash shuffle on the
  * digest + a key semi join; the final summary is a partial+final
  * aggregate. No window, no all-pairs, no driver loop — at 100 TB
  * this runs as three shuffles end to end.
  */
object CurationQueries {

  private def toks(c: org.apache.spark.sql.Column) =
    filter(split(c, " "), t => length(t) > 0)

  val q61CurationPipeline = QueryDef(
    "q61_curation_pipeline",
    "curation pipeline: quality gate → exact dedup → deterministic mix → audit summary",
    """WITH tok AS (
      |  SELECT doc_id, text, lang, source,
      |         list_filter(string_split(text, ' '), t -> length(t) > 0) AS w
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, text, lang, source, len(w) AS n_tokens,
      |         CAST(floor(10000.0 * len(list_distinct(w)) / len(w)) AS BIGINT) AS ttr_bp
      |  FROM tok WHERE len(w) >= 10),
      |f AS (SELECT * FROM q WHERE ttr_bp >= 3000),
      |keep AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY sha256(text)),
      |dedup AS (SELECT f.* FROM f JOIN keep USING (doc_id)),
      |mixed AS (
      |  SELECT * FROM dedup
      |  WHERE (lang = 'en' AND doc_id % 10 < 5)
      |     OR (lang <> 'en' AND doc_id % 10 < 2))
      |SELECT lang, source, count(*) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |       CAST(floor(avg(ttr_bp)) AS BIGINT) AS avg_ttr_bp
      |FROM mixed
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin) { (s, d) =>
    val gated = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        toks(col("text")).as("w"))
      .filter(size(col("w")) >= 10)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        size(col("w")).cast("long").as("n_tokens"),
        floor(lit(10000.0) * size(array_distinct(col("w"))) / size(col("w")))
          .cast("long").as("ttr_bp"))
      .filter(col("ttr_bp") >= 3000)
    val keepers = gated
      .groupBy(sha2(col("text"), 256))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    gated.join(keepers, Seq("doc_id"), "left_semi")
      .filter(
        (col("lang") === "en" && pmod(col("doc_id"), lit(10)) < 5) ||
          (col("lang") =!= "en" && pmod(col("doc_id"), lit(10)) < 2))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        floor(avg(col("ttr_bp"))).cast("long").as("avg_ttr_bp"))
      .orderBy(col("lang"), col("source"))
  }

  /** Sequence packing — the last step before training: documents are
    * concatenated in deterministic doc_id order and chunked into
    * 2048-token sequences (standard concat-then-chunk; a doc may span
    * a boundary). Emits per-document placement metadata (`seq_id`,
    * `seq_offset`, `end_seq`) — what a loader needs to materialize
    * sequence k without scanning neighbors. The global running token
    * total comes from `api.SequencePacker`'s two-pass cumsum (range
    * repartition + per-partition window + K-row broadcast of prefix
    * offsets), NOT a single-reducer `sum OVER (ORDER BY ...)` — the
    * oracle's global window IS that single-reducer plan, which is
    * exactly what this operator avoids at scale.
    */
  val q80SequencePack = QueryDef(
    "q80_sequence_pack",
    "sequence packing: concat-then-chunk placement of docs into 2048-token training sequences",
    """WITH tok AS (
      |  SELECT doc_id,
      |         len(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |         sum(n_tokens) OVER (ORDER BY doc_id) AS cum
      |  FROM tok WHERE n_tokens > 0)
      |SELECT doc_id,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(cum AS BIGINT) AS cum,
      |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_id,
      |  CAST((cum - 1) // 2048 AS BIGINT) AS end_seq,
      |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS seq_offset
      |FROM c
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    SequencePacker.pack(docs, "doc_id", "n_tokens", 2048L)
      .select(col("doc_id"), col("n_tokens"), col("cum"),
        col("seq_id"), col("end_seq"), col("seq_offset"))
      .orderBy(col("doc_id"))
  }

  /** The loader-side half of q80: every (document × sequence) slice a
    * training loader fetches to assemble each 2048-token sequence —
    * docs spanning a boundary contribute one row per overlapped
    * sequence. The oracle replays pack's global cumsum and expands
    * spans with `generate_series` (inclusive, like Spark `sequence`);
    * all arithmetic stays in BIGINT.
    */
  val q83PackSlices = QueryDef(
    "q83_pack_slices",
    "sequence-pack slice materialization: per-(doc x sequence) fetch plan rows",
    """WITH tok AS (
      |  SELECT doc_id,
      |         len(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n,
      |         CAST(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum
      |  FROM tok WHERE n_tokens > 0),
      |s AS (
      |  SELECT doc_id, n, cum,
      |         unnest(generate_series((cum - n) // 2048, (cum - 1) // 2048)) AS seq
      |  FROM c)
      |SELECT doc_id, CAST(seq AS BIGINT) AS seq,
      |  CAST(greatest(cum - n, seq * 2048) - (cum - n) AS BIGINT) AS tok_start,
      |  CAST(greatest(cum - n, seq * 2048) - seq * 2048 AS BIGINT) AS seq_off,
      |  CAST(least(cum, (seq + 1) * 2048)
      |       - greatest(cum - n, seq * 2048) AS BIGINT) AS slice_len
      |FROM s
      |ORDER BY doc_id, seq""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val packed = SequencePacker.pack(docs, "doc_id", "n_tokens", 2048L)
    SequencePacker.slices(packed, "n_tokens", 2048L)
      .select(col("doc_id"), col("seq"), col("tok_start"),
        col("seq_off"), col("slice_len"))
      .orderBy(col("doc_id"), col("seq"))
  }

  /** RAG-style overlap chunking — the retrieval-side twin of q80's
    * training packer: each document is cut into 64-token windows with
    * stride 48 (16-token overlap), the unit an embedding/retrieval
    * index actually stores. Emits the chunk fetch plan (doc, index,
    * start, length) plus an md5 content fingerprint of each chunk so
    * the oracle hash-checks the chunk TEXT, not just the arithmetic.
    *
    * Scale shape: a single scan with a per-row explode (fan-out
    * ≤ n_tokens/48 per doc, no shuffle at all except the determinism
    * ORDER BY) — chunking is embarrassingly parallel and stays inside
    * whole-stage codegen. Spark `slice(w, start, 64)` and DuckDB
    * `list_slice(w, start, start+63)` share 1-based inclusive clamped
    * semantics, and both engines' `md5` emit lowercase hex, so the
    * fingerprint matches bit-for-bit.
    */
  val q86ChunkOverlap = QueryDef(
    "q86_chunk_overlap",
    "sliding-window chunking: 64-token chunks at stride 48 with md5 content fingerprints",
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS w
      |  FROM documents),
      |tb AS (SELECT doc_id, w, len(w) AS n FROM t WHERE len(w) > 0),
      |st AS (SELECT doc_id, n, w, unnest(range(1, n + 1, 48)) AS tok_start FROM tb)
      |SELECT doc_id,
      |  CAST((tok_start - 1) // 48 AS INT) AS chunk_idx,
      |  CAST(tok_start AS BIGINT) AS tok_start,
      |  CAST(least(64, n - tok_start + 1) AS BIGINT) AS chunk_len,
      |  md5(array_to_string(list_slice(w, tok_start, tok_start + 63), ' ')) AS chunk_md5
      |FROM st
      |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("n"))
      .select(col("doc_id"), col("n"), col("w"),
        posexplode(sequence(lit(1L), col("n"), lit(48L)))
          .as(Seq("chunk_idx", "tok_start")))
      .select(col("doc_id"),
        col("chunk_idx"),
        col("tok_start"),
        least(lit(64L), col("n") - col("tok_start") + 1).as("chunk_len"),
        md5(concat_ws(" ", slice(col("w"), col("tok_start"), lit(64))))
          .as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Per-source top-fraction selection — the "keep the best 30% of
    * every source by quality" stage of a curation pipeline. The rank
    * is a TRUE global order per source (not a sampled approximation),
    * built by [[graft.api.Ranking.withRank]]: `documents.source` has
    * a handful of distinct values, so the naive
    * `row_number() OVER (PARTITION BY source ORDER BY quality)`
    * would funnel the whole corpus through that many reducer tasks;
    * the two-pass grouped ranking keeps all K tasks busy at any
    * scale (PropertySpec pins it equal to the built-in window form).
    * Quality is the q61 type-token-ratio integer-bp arithmetic, so
    * both engines rank identical integers; doc_id breaks ties
    * deterministically.
    */
  val q99SourceTopFraction = QueryDef(
    "q99_source_top_fraction",
    "per-source top-30% by quality via scale-safe grouped global ranking",
    """WITH q AS (
      |  SELECT doc_id, source,
      |    CAST(floor(10000.0 * len(list_distinct(w)) / len(w)) AS BIGINT) AS ttr_bp
      |  FROM (SELECT doc_id, source,
      |          list_filter(string_split(text, ' '), t -> length(t) > 0) AS w
      |        FROM documents)
      |  WHERE len(w) > 0),
      |r AS (
      |  SELECT doc_id, source, ttr_bp,
      |    CAST(row_number() OVER (PARTITION BY source
      |                            ORDER BY ttr_bp DESC, doc_id) AS BIGINT) AS rn,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM q)
      |SELECT source, doc_id, ttr_bp, rn
      |FROM r
      |WHERE rn <= CAST(ceil(0.3 * n) AS BIGINT)
      |ORDER BY source, doc_id""".stripMargin) { (s, d) =>
    val q = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), toks(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), col("source"),
        floor(lit(10000.0) * size(array_distinct(col("w"))) / size(col("w")))
          .cast("long").as("ttr_bp"))
    graft.api.Ranking.withRank(q, Seq("source"),
      Seq(col("ttr_bp").desc, col("doc_id")))
      .filter(col("rn") <= ceil(lit(0.3) * col("grp_n")).cast("long"))
      .select(col("source"), col("doc_id"), col("ttr_bp"), col("rn"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Deterministic epoch shuffle — the training-loader requirement
    * that every epoch visits the corpus in a pseudorandom order that
    * is REPRODUCIBLE across reruns, resumable mid-epoch, and
    * engine-independent (no `rand()`, whose draw depends on
    * partitioning). Position = dense global rank of
    * `mix64(doc_id + seed)`: the native mixer gives a different but
    * fixed permutation per seed, and [[graft.api.Ranking.withRank]]
    * turns it into contiguous 0-based positions without a
    * single-reducer global window. A new epoch is just a new seed.
    * The oracle replays the mixer in HUGEINT (converting back to
    * signed so both engines order the same domain) and ranks with a
    * plain window — DuckDB's scale is oracle scale.
    */
  val q103CorpusShuffle = QueryDef(
    "q103_corpus_shuffle",
    "deterministic epoch shuffle: reproducible global pseudorandom order, scale-safe rank",
    """WITH z0 AS (SELECT doc_id, CAST(doc_id + 2654435769 AS HUGEINT) AS z FROM documents),
      |m1 AS (SELECT doc_id, (xor(z, z >> 30) * 2685821657736338717) % 18446744073709551616 AS z FROM z0),
      |m2 AS (SELECT doc_id, (xor(z, z >> 27) * 1181783497276652981) % 18446744073709551616 AS z FROM m1),
      |h AS (SELECT doc_id,
      |        CAST(CASE WHEN xor(z, z >> 31) >= 9223372036854775808
      |             THEN xor(z, z >> 31) - 18446744073709551616
      |             ELSE xor(z, z >> 31) END AS BIGINT) AS mx
      |      FROM m2)
      |SELECT doc_id,
      |  CAST(row_number() OVER (ORDER BY mx, doc_id) - 1 AS BIGINT) AS pos
      |FROM h
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.plans.GraftFunctions.register(s)
    val seeded = Tables.documents(s, d).select(col("doc_id"),
      graft.plans.GraftFunctions.mix64(col("doc_id") + lit(2654435769L)).as("mx"))
    graft.api.Ranking.withRank(seeded, Nil,
        Seq(col("mx"), col("doc_id")), rankCol = "pos")
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
      .orderBy(col("doc_id"))
  }

  /** Curriculum staging: order the corpus easy→hard (shorter
    * documents first — the classic length curriculum) and cut it into
    * 4 stages of EQUAL CHARACTER BUDGET, not equal doc count, so
    * every stage feeds the trainer the same volume. The global
    * running total comes from [[SequencePacker.pack]]'s two-pass
    * range-partitioned cumsum — the corpus is never funneled through
    * a single `ORDER BY` reducer — and the stage is integer
    * arithmetic on (cum, total), so the assignment is engine-exact.
    * The composite order key packs (n_chars, doc_id) into one long
    * (n_chars ≤ ~1e5 here; at larger id spaces pass a wider
    * composite), giving the total order the cumsum contract needs.
    */
  val q111CurriculumStages = QueryDef(
    "q111_curriculum_stages",
    "length-curriculum staging: 4 equal-character-budget stages, shortest docs first",
    """WITH c AS (
      |  SELECT doc_id, n_chars,
      |    sum(n_chars) OVER (ORDER BY n_chars, doc_id) AS cum,
      |    sum(n_chars) OVER () AS total
      |  FROM documents)
      |SELECT doc_id, n_chars,
      |  CAST(least(3, ((cum - n_chars) * 4) // total) AS INT) AS stage
      |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
    // NULL n_chars rows (fuzz class): they contribute nothing to cum
    // or total in the oracle's window sums (SQL sum skips NULLs) and
    // their own stage is NULL — packing them would crash the packer's
    // non-null tuple encoder, so they bypass it and rejoin with a
    // NULL stage
    val base = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
    val docs = base.filter(col("n_chars").isNotNull)
      .withColumn("ord", col("n_chars") * lit(1000000000L) + col("doc_id"))
    val packed = SequencePacker.pack(docs, "ord", "n_chars", 1L)
      .select(col("doc_id"), col("n_chars"), col("cum"))
    val total = base.agg(sum(col("n_chars")).as("total"))
    packed.crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_chars"),
        least(lit(3L), expr("((cum - n_chars) * 4) div total"))
          .cast("int").as("stage"))
      .unionByName(base.filter(col("n_chars").isNull)
        .select(col("doc_id"), col("n_chars"),
          // least(3, NULL div total) = 3 in BOTH engines (least skips
          // NULLs), and a NULL-length doc sorts after every sized doc
          // in the twin's NULLS-LAST cum window — so its stage is the
          // final one
          lit(3).cast("int").as("stage")))
      .orderBy(col("doc_id"))
  }

  /** BALANCED shard assignment — the straggler-prevention layout step
    * between packing (q80) and shard manifests (q77): assign every
    * doc to one of W=8 training shards so TOKEN totals (not doc
    * counts) balance. Docs rank globally by size descending and place
    * in SNAKE order (0..W−1 then W−1..0, repeating) — the
    * deterministic one-pass approximation of LPT bin packing: each
    * 2W-document wave contributes exactly one large+small pair to
    * every shard, so imbalance is bounded by one wave's spread
    * instead of growing with the corpus (round-robin by rank alone
    * systematically starves the last shard).
    *
    * Output: per shard, doc count, token total, token share in exact
    * integer bp, and signed deviation from the ideal 10000/W — the
    * number an operator alerts on.
    *
    * Scale shape: the global size rank is [[graft.api.Ranking
    * .withRank]] (range repartition + per-partition ranks + K-row
    * offset metadata — never a single-reducer window); everything
    * after is one partial-aggregable groupBy on the W-valued shard
    * key and a broadcast 1-row total. The DuckDB twin replays the
    * same rank/snake arithmetic.
    */
  val q214ShardBalance = QueryDef(
    "q214_shard_balance",
    "snake-balanced shard assignment: global size rank -> LPT-style snake placement over 8 shards, per-shard token share + deviation bp",
    """WITH tk AS (SELECT doc_id,
      |             CAST(len(list_filter(string_split(text, ' '),
      |               t -> length(t) > 0)) AS BIGINT) AS n
      |           FROM documents),
      |rk AS (SELECT doc_id, n,
      |         row_number() OVER (ORDER BY n DESC, doc_id) AS rn FROM tk),
      |sh AS (SELECT doc_id, n,
      |         CAST(CASE WHEN (rn - 1) % 16 < 8 THEN (rn - 1) % 16
      |              ELSE 15 - (rn - 1) % 16 END AS BIGINT) AS shard
      |       FROM rk),
      |g AS (SELECT CAST(sum(n) AS BIGINT) AS gt FROM tk)
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n) AS BIGINT) AS total_tokens,
      |  CAST((10000 * sum(n)) // gt AS BIGINT) AS share_bp,
      |  CAST((10000 * sum(n)) // gt - 1250 AS BIGINT) AS dev_bp
      |FROM sh CROSS JOIN g
      |GROUP BY shard, gt
      |ORDER BY shard""".stripMargin) { (s, d) =>
    val tk = Tables.documents(s, d)
      .select(col("doc_id"), size(toks(col("text"))).cast("long").as("n"))
    val rk = graft.api.Ranking.withRank(tk, Seq.empty,
      Seq(col("n").desc, col("doc_id")))
    val sh = rk.withColumn("k", (col("rn") - 1) % 16)
      .withColumn("shard",
        when(col("k") < 8, col("k")).otherwise(lit(15L) - col("k"))
          .cast("long"))
    val g = tk.agg(sum(col("n")).as("gt"))
    sh.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_tokens"))
      .crossJoin(broadcast(g))
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        expr("(10000 * total_tokens) div gt").as("share_bp"),
        (expr("(10000 * total_tokens) div gt") - lit(1250L)).as("dev_bp"))
      .orderBy(col("shard"))
  }

  /** Blocklist / phrase-list filter audit — the unsafe-content and
    * compliance pre-flight every curation pipeline runs before
    * training: given a term list and a phrase list, per source: how
    * many documents match, how many total hits, and the flagged
    * share. The lists ride as broadcast LITERALS into a fully
    * MAP-SIDE scan (token membership + adjacent-bigram membership via
    * array HOFs — no explode, no join, zero shuffles before the
    * per-source aggregate), which is exactly how a 100 TB blocklist
    * pass must run: O(corpus tokens) work, one small aggregate out.
    * Case-folded tokens; phrases match ADJACENT token pairs, so
    * "group by" never fires across a document boundary or a shuffled
    * word bag — the FlashText-style contract, expressed in Spark HOFs.
    */
  val q245BlocklistFilter = QueryDef(
    "q245_blocklist_filter",
    "blocklist term + adjacent-bigram phrase filter audit per source: map-side HOF matching, flagged share in bp",
    """WITH toks AS (
      |  SELECT source,
      |         list_filter(string_split(lower(text), ' '), t -> length(t) > 0) AS t
      |  FROM documents),
      |h AS (SELECT source,
      |        len(list_filter(t, x -> list_contains(['merge', 'drop', 'vacuum'], x))) AS th,
      |        len(list_filter(
      |          list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]),
      |          b -> list_contains(['order fast', 'stream column'], b))) AS ph
      |      FROM toks)
      |SELECT coalesce(source, '*') AS source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN th + ph > 0 THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs,
      |  CAST(sum(th) AS BIGINT) AS term_hits,
      |  CAST(sum(ph) AS BIGINT) AS phrase_hits,
      |  (10000 * CAST(sum(CASE WHEN th + ph > 0 THEN 1 ELSE 0 END) AS BIGINT))
      |    // count(*) AS flag_bp
      |FROM h
      |GROUP BY ROLLUP (source)
      |ORDER BY source""".stripMargin) { (s, d) =>
    val terms = array(Seq("merge", "drop", "vacuum").map(lit): _*)
    val phrases = array(Seq("order fast", "stream column").map(lit): _*)
    val toks = Tables.documents(s, d)
      .select(col("source"),
        filter(split(lower(col("text")), " "), t => length(t) > 0).as("t"))
    val h = toks.select(col("source"),
      size(filter(col("t"), x => array_contains(terms, x))).cast("long").as("th"),
      // guard: Spark's sequence(1, n-1) DESCENDS for n < 2 (DuckDB's
      // range is empty there), so short docs skip the bigram pass
      when(size(col("t")) < 2, lit(0L)).otherwise(
        size(filter(
          transform(sequence(lit(1), size(col("t")) - 1),
            i => concat(element_at(col("t"), i), lit(" "),
              element_at(col("t"), i + 1))),
          b => array_contains(phrases, b))).cast("long")).as("ph"))
    h.rollup(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("th") + col("ph") > 0, 1L).otherwise(0L)).as("flagged_docs"),
        sum(col("th")).as("term_hits"),
        sum(col("ph")).as("phrase_hits"))
      .select(coalesce(col("source"), lit("*")).as("source"),
        col("n_docs"), col("flagged_docs"), col("term_hits"),
        col("phrase_hits"),
        expr("(10000 * flagged_docs) div n_docs").as("flag_bp"))
      // SQL emits the () grand-total row even over empty input
      .unionByName(graft.api.Degenerate.emptyGrandTotal(
        Tables.documents(s, d), Seq(
          lit("*").as("source"), lit(0L).as("n_docs"),
          lit(null).cast("long").as("flagged_docs"),
          lit(null).cast("long").as("term_hits"),
          lit(null).cast("long").as("phrase_hits"),
          lit(null).cast("long").as("flag_bp"))))
      .orderBy(col("source"))
  }

  /** Prefix-sharing audit — the SERVING-side twin of q80's training
    * packer: modern inference servers (paged/prefix KV caching) reuse
    * the KV cache of any request whose token prefix matches an
    * already-cached one, so the planning question before sizing a
    * cache is "at prefix depth k, how much of this corpus shares?".
    * Per depth ∈ {8, 16, 32}: distinct prefix groups, documents in a
    * shared group (≥2 members), the shared share in bp, and
    * `cache_hits` = n_docs − n_groups (each group pays one cold fill;
    * every other member is a hit) — the upper bound on prefix-cache
    * reuse at that depth. Docs shorter than k share on their full
    * token list (exact-duplicate shorts still share, the cache
    * semantics). Depth monotonicity is structural: deepening a prefix
    * only splits groups, so cache_hits is non-increasing in k (the
    * spec pins it).
    *
    * Scale shape: one corpus scan exploding 3 (depth, prefix-hash)
    * rows per doc — Spark groups on xxhash64 of the joined prefix
    * (8-byte shuffle keys; the oracle groups the raw prefix string,
    * equal up to the documented 64-bit collision class) — then one
    * keyed aggregate and a 3-row depth rollup.
    */
  val q250PrefixSharing = QueryDef(
    "q250_prefix_sharing",
    "prefix-cache sharing audit: per depth k, prefix groups / shared docs / upper-bound cache hits",
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS w
      |  FROM documents),
      |t AS (SELECT doc_id, w FROM tok WHERE len(w) > 0),
      |d AS (SELECT unnest([8, 16, 32]) AS depth),
      |p AS (SELECT CAST(d.depth AS BIGINT) AS depth,
      |        array_to_string(t.w[1:d.depth], ' ') AS pfx
      |      FROM t CROSS JOIN d),
      |g AS (SELECT depth, pfx, CAST(count(*) AS BIGINT) AS c
      |      FROM p GROUP BY depth, pfx)
      |SELECT depth,
      |  CAST(sum(c) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS docs_sharing,
      |  CAST((10000 * sum(CASE WHEN c >= 2 THEN c ELSE 0 END)) // sum(c) AS BIGINT) AS shared_bp,
      |  CAST(sum(c) - count(*) AS BIGINT) AS cache_hits
      |FROM g GROUP BY depth
      |ORDER BY depth""".stripMargin) { (s, d) =>
    val depths = Seq(8, 16, 32)
    val t = Tables.documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("w"))
      .filter(size(col("w")) > 0)
    val p = t.select(explode(array(depths.map(k =>
        struct(lit(k.toLong).as("depth"),
          xxhash64(concat_ws(" ", slice(col("w"), 1, k))).as("ph"))): _*))
        .as("x"))
      .select(col("x.depth").as("depth"), col("x.ph").as("ph"))
    val g = p.groupBy(col("depth"), col("ph")).agg(count(lit(1)).as("c"))
    g.groupBy(col("depth"))
      .agg(sum(col("c")).as("n_docs"),
        count(lit(1)).as("n_groups"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("docs_sharing"))
      .select(col("depth"), col("n_docs"), col("n_groups"),
        col("docs_sharing"),
        expr("(10000 * docs_sharing) div n_docs").as("shared_bp"),
        (col("n_docs") - col("n_groups")).as("cache_hits"))
      .orderBy(col("depth"))
  }

  val all: Seq[QueryDef] =
    Seq(q61CurationPipeline, q80SequencePack, q83PackSlices, q86ChunkOverlap,
      q99SourceTopFraction, q103CorpusShuffle, q111CurriculumStages,
      q214ShardBalance, q245BlocklistFilter, q250PrefixSharing)
}
