package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.UrlFunctions

/** Web-crawl URL curation (round-9 verdict task 5): canonical-URL
  * dedup keys and the per-domain mix audit — the first dedup pass and
  * the first mixing report a crawl pipeline runs, BEFORE any content
  * hashing. The testdata has no URL column, so a deterministic messy
  * raw URL is synthesized from doc_id by a formula both engines
  * replay (the q48/q157 convention); the canonicalizer itself
  * ([[UrlFunctions.canonicalizeUrl]]) is generic and fixture-tested
  * on hand-written URLs in UrlSpec.
  */
object UrlQueries {

  /** Shared oracle prefix: synthesize the raw URL, then canonicalize
    * it with DuckDB's OWN string functions (string_split / list HOFs
    * / regexp_replace) — a genuinely independent implementation of
    * the same canonical form, not a replay of Spark's output.
    */
  private val CanonCte =
    """WITH raw AS (
      |  SELECT doc_id, source, text,
      |    (CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'https' ELSE 'http' END)
      |    || '://'
      |    || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
      |    || (CASE WHEN doc_id % 4 = 0
      |             THEN 'Domain' || CAST(doc_id % 3 AS VARCHAR) || '.COM'
      |             ELSE 'domain' || CAST(doc_id % 3 AS VARCHAR) ||
      |                  (CASE doc_id % 4 WHEN 1 THEN '.org' WHEN 2 THEN '.net' ELSE '.io' END)
      |        END)
      |    || (CASE WHEN doc_id % 5 = 0
      |             THEN (CASE WHEN doc_id % 3 = 2 THEN ':80' ELSE ':443' END)
      |             WHEN doc_id % 13 = 0 THEN ':8080' ELSE '' END)
      |    || '/docs/page' || CAST(doc_id % 5 AS VARCHAR)
      |    || (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END)
      |    || '?'
      |    || (CASE WHEN doc_id % 2 = 1
      |             THEN 'utm_source=feed&utm_campaign=c' || CAST(doc_id % 4 AS VARCHAR) || '&'
      |             ELSE '' END)
      |    || 'id=' || CAST(doc_id % 7 AS VARCHAR)
      |    || (CASE WHEN doc_id % 3 = 0 THEN '&lang=en' ELSE '' END)
      |    || (CASE WHEN doc_id % 5 = 1 THEN '&fbclid=f' || CAST(doc_id % 9 AS VARCHAR) ELSE '' END)
      |    || (CASE WHEN doc_id % 7 = 2 THEN '&ref=tw' ELSE '' END)
      |    || (CASE WHEN doc_id % 4 = 2 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END)
      |    AS url
      |  FROM documents),
      |c1 AS (SELECT *, string_split(url, '#')[1] AS nofrag FROM raw),
      |c2 AS (SELECT *, string_split(nofrag, '?')[1] AS base,
      |         CASE WHEN contains(nofrag, '?')
      |              THEN string_split(nofrag, '?')[2] ELSE '' END AS qs
      |       FROM c1),
      |c3 AS (SELECT *, lower(string_split(base, '://')[1]) AS scheme,
      |         string_split(base, '://')[2] AS rest FROM c2),
      |c4 AS (SELECT *, string_split(rest, '/')[1] AS hostport,
      |         regexp_replace(rest, '^[^/]*', '') AS path0 FROM c3),
      |c5 AS (SELECT *,
      |         regexp_replace(lower(string_split(hostport, ':')[1]), '^www\.', '') AS host,
      |         CASE WHEN contains(hostport, ':')
      |              THEN string_split(hostport, ':')[2] ELSE '' END AS port
      |       FROM c4),
      |c6 AS (SELECT *,
      |         CASE WHEN port = '' THEN ''
      |              WHEN scheme = 'http' AND port = '80' THEN ''
      |              WHEN scheme = 'https' AND port = '443' THEN ''
      |              ELSE ':' || port END AS cport,
      |         CASE WHEN regexp_replace(CASE WHEN path0 = '' THEN '/' ELSE path0 END, '/+$', '') = ''
      |              THEN '/'
      |              ELSE regexp_replace(CASE WHEN path0 = '' THEN '/' ELSE path0 END, '/+$', '') END AS cpath,
      |         list_sort(list_filter(string_split(qs, '&'),
      |           p -> p <> '' AND NOT (starts_with(p, 'utm_')
      |                OR string_split(p, '=')[1] IN ('gclid', 'fbclid', 'ref')))) AS params
      |       FROM c5),
      |canon AS (SELECT doc_id, source, text,
      |            scheme || '://' || host || cport || cpath ||
      |            (CASE WHEN len(params) > 0
      |                  THEN '?' || array_to_string(params, '&') ELSE '' END) AS canon_url,
      |            host AS domain
      |          FROM c6)""".stripMargin

  /** Per-doc canonical relation the two queries share: doc_id,
    * source, text, canon_url, domain — all map-side expressions, no
    * shuffle until a consumer aggregates.
    */
  private def canonDocs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val raw = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"),
        UrlFunctions.syntheticRawUrl(col("doc_id")).as("url"))
    raw.select(col("doc_id"), col("source"), col("text"),
      UrlFunctions.canonicalizeUrl(col("url")).as("canon_url"),
      UrlFunctions.urlHost(col("url")).as("domain"))
  }

  /** Canonical-URL dedup key: case-folded scheme/host, www- and
    * default-port-stripped, tracking params removed, surviving params
    * sorted, fragment dropped, trailing slash normalized. Per doc:
    * its canonical URL, domain, the surviving representative
    * (min doc_id in the canonical family) and family size —
    * raw-distinct URLs collapse into real duplicate families (period
    * 420 in the synthetic id space).
    *
    * Scale shape: canonicalization is pure map-side codegen'd string
    * work; the family stats ride ONE exchange — a window partitioned
    * by the high-cardinality canonical URL (no groupBy+join-back
    * second shuffle, no low-cardinality serialization risk: family
    * sizes are bounded by the dup rate, not the corpus).
    */
  val q177UrlCanonicalDedup = QueryDef(
    "q177_url_canonical_dedup",
    "canonical-URL dedup key: fold case, strip www/default port/tracking params/fragment, sort params; min-id survivor per family",
    CanonCte +
      """
        |SELECT doc_id, canon_url, domain,
        |  min(doc_id) OVER (PARTITION BY canon_url) AS keep_id,
        |  CAST(count(*) OVER (PARTITION BY canon_url) AS BIGINT) AS n_copies,
        |  doc_id = min(doc_id) OVER (PARTITION BY canon_url) AS is_kept
        |FROM canon
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("canon_url"))
    canonDocs(s, d)
      .select(col("doc_id"), col("canon_url"), col("domain"),
        min(col("doc_id")).over(w).as("keep_id"),
        count(lit(1)).over(w).as("n_copies"))
      .withColumn("is_kept", col("doc_id") === col("keep_id"))
      .orderBy(col("doc_id"))
  }

  /** Per-domain mix audit — the crawl-side sibling of q88's
    * temperature mix: for each canonical domain, its document count,
    * distinct canonical URLs, token mass, and its share of the corpus
    * in basis points (docs AND tokens — the two denominators a
    * sampling policy weighs). A domain whose token share dwarfs its
    * doc share is long-form content; the reverse is boilerplate
    * farms. Integer basis points (floor), so the hash gate is safe.
    *
    * Scale shape: one partial-aggregable groupBy on domain; the
    * corpus totals are a 1-row broadcast (the q88 idiom) — domain
    * cardinality is web-scale-bounded (~10^8) and the aggregate is
    * count/sum only, so the shuffle stays tiny.
    */
  val q178DomainMixAudit = QueryDef(
    "q178_domain_mix_audit",
    "per-domain mix audit over canonical URLs: doc/url/token mass and basis-point corpus shares",
    CanonCte +
      """,
        |t AS (SELECT domain, canon_url,
        |        len(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS ntok
        |      FROM canon),
        |a AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(count(DISTINCT canon_url) AS BIGINT) AS n_urls,
        |        CAST(sum(ntok) AS BIGINT) AS n_tokens
        |      FROM t GROUP BY domain)
        |SELECT domain, n_docs, n_urls, n_tokens,
        |  CAST((10000 * n_tokens) // (SELECT sum(n_tokens) FROM a) AS BIGINT) AS token_share_bp,
        |  CAST((10000 * n_docs) // (SELECT sum(n_docs) FROM a) AS BIGINT) AS doc_share_bp
        |FROM a ORDER BY domain""".stripMargin) { (s, d) =>
    val perDomain = canonDocs(s, d)
      .select(col("domain"), col("canon_url"),
        size(filter(split(col("text"), " "), t => length(t) > lit(0)))
          .cast("long").as("ntok"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canon_url")).as("n_urls"),
        sum(col("ntok")).as("n_tokens"))
    val totals = perDomain
      .agg(sum(col("n_docs")).as("tot_docs"), sum(col("n_tokens")).as("tot_toks"))
    perDomain.crossJoin(broadcast(totals))
      .select(col("domain"), col("n_docs"), col("n_urls"), col("n_tokens"),
        expr("(10000 * n_tokens) DIV tot_toks").as("token_share_bp"),
        expr("(10000 * n_docs) DIV tot_docs").as("doc_share_bp"))
      .orderBy(col("domain"))
  }

  /** End-to-end crawl curation: canonical-URL dedup THEN
    * temperature-quota domain mixing — the composition a crawl
    * pipeline actually runs (dedup first, or duplicate-heavy domains
    * steal quota from the mix). Survivors are q177's min-id
    * representatives; per-domain quotas are q88's α=0.5 temperature
    * rule (∝ √n of KEPT docs, 100-doc target); within-domain
    * selection is doc_id order via the scale-safe grouped ranking
    * API (never a `PARTITION BY domain` row_number — 12 domains
    * would serialize into 12 tasks).
    *
    * Scale shape: canonicalization map-side; survivorship one
    * window exchange on the high-cardinality canonical URL; quota
    * table is domain-cardinality metadata crossed with a 1-row
    * broadcast total; ranking rides `Ranking.withRank`.
    */
  val q181CrawlCurationMix = QueryDef(
    "q181_crawl_curation_mix",
    "crawl pipeline composition: canonical-URL dedup survivors, then sqrt-temperature per-domain quotas (100-doc target)",
    CanonCte +
      """,
        |keep AS (SELECT domain, doc_id FROM (
        |    SELECT domain, doc_id,
        |      min(doc_id) OVER (PARTITION BY canon_url) AS keep_id
        |    FROM canon)
        |  WHERE doc_id = keep_id),
        |c AS (SELECT domain, CAST(count(*) AS BIGINT) AS n FROM keep GROUP BY domain),
        |w AS (SELECT domain, n,
        |        CAST(floor(sqrt(CAST(n AS DOUBLE)) * 10000) AS BIGINT) AS weight
        |      FROM c),
        |q AS (SELECT domain, weight,
        |        CAST((100 * weight) // (SELECT sum(weight) FROM w) AS BIGINT) AS quota
        |      FROM w),
        |r AS (SELECT doc_id, domain,
        |        CAST(row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS BIGINT) AS rank
        |      FROM keep)
        |SELECT r.doc_id, r.domain, r.rank, q.quota, q.weight
        |FROM r JOIN q USING (domain)
        |WHERE r.rank <= q.quota
        |ORDER BY r.doc_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("canon_url"))
    val keep = canonDocs(s, d)
      .select(col("domain"), col("doc_id"),
        min(col("doc_id")).over(w).as("keep_id"))
      .filter(col("doc_id") === col("keep_id"))
      .select(col("domain"), col("doc_id"))
    val weights = keep.groupBy(col("domain"))
      .agg(count(lit(1)).as("n"))
      .select(col("domain"),
        floor(sqrt(col("n").cast("double")) * 10000).cast("long").as("weight"))
    val quotas = weights
      .crossJoin(broadcast(weights.agg(sum(col("weight")).as("wsum"))))
      .select(col("domain"), col("weight"),
        expr("(100 * weight) DIV wsum").as("quota"))
    graft.api.Ranking.withRank(keep, Seq("domain"), Seq(col("doc_id")),
        "rank", "dom_n")
      .join(broadcast(quotas), "domain")
      .filter(col("rank") <= col("quota"))
      .select(col("doc_id"), col("domain"), col("rank"),
        col("quota"), col("weight"))
      .orderBy(col("doc_id"))
  }

  /** Re-crawl diff — q92's snapshot CDC re-keyed the way a crawl
    * actually works: doc_ids are transient between crawls, the STABLE
    * key is the canonical URL. Crawl 2 is a deterministic mutation of
    * crawl 1 (docs ≡7 mod 10 vanish and re-appear under NEW ids ⇒ new
    * URLs; docs ≡3 mod 10 change content); each crawl reduces to one
    * row per canonical URL carrying the SURVIVOR's (min doc_id)
    * content digest, and a full-outer join on the URL classifies
    * added / deleted / changed / unchanged per domain. Note the
    * URL-keyed semantics this buys: a family whose survivor was
    * removed reports 'changed' (its representative content changed)
    * even though no single doc was edited — exactly what a re-crawl
    * monitor should say.
    *
    * Scale shape: canonicalization map-side; one groupBy exchange
    * per crawl on the high-cardinality canonical URL; the diff is a
    * same-key full-outer join (no re-shuffle under AQE) and a tiny
    * domain aggregate. The ORACLE derives canonical URLs
    * SYMBOLICALLY from the id formula (the q48/q157 convention) —
    * an independent derivation the string canonicalizer must agree
    * with, on BOTH the original and the shifted ids.
    */
  val q182RecrawlDiff = QueryDef(
    "q182_recrawl_diff",
    "canonical-URL-keyed re-crawl CDC: per-domain added/deleted/changed/unchanged URL counts via survivor digests",
    """WITH c1 AS (SELECT doc_id, text FROM documents),
      |c2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 3 THEN text || ' upd' ELSE text END AS text
      |  FROM documents WHERE doc_id % 10 <> 7
      |  UNION ALL
      |  SELECT doc_id + 1000000000, text || ' new'
      |  FROM documents WHERE doc_id % 10 = 7),
      |u1 AS (SELECT
      |  (CASE WHEN doc_id % 3 = 2 THEN 'http' ELSE 'https' END) || '://domain'
      |    || CAST(doc_id % 3 AS VARCHAR)
      |    || (CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.org' WHEN 2 THEN '.net' ELSE '.io' END)
      |    || (CASE WHEN doc_id % 13 = 0 AND doc_id % 5 <> 0 THEN ':8080' ELSE '' END)
      |    || '/docs/page' || CAST(doc_id % 5 AS VARCHAR)
      |    || '?id=' || CAST(doc_id % 7 AS VARCHAR)
      |    || (CASE WHEN doc_id % 3 = 0 THEN '&lang=en' ELSE '' END) AS canon_url,
      |  'domain' || CAST(doc_id % 3 AS VARCHAR)
      |    || (CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.org' WHEN 2 THEN '.net' ELSE '.io' END) AS domain,
      |  doc_id, text FROM c1),
      |u2 AS (SELECT
      |  (CASE WHEN doc_id % 3 = 2 THEN 'http' ELSE 'https' END) || '://domain'
      |    || CAST(doc_id % 3 AS VARCHAR)
      |    || (CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.org' WHEN 2 THEN '.net' ELSE '.io' END)
      |    || (CASE WHEN doc_id % 13 = 0 AND doc_id % 5 <> 0 THEN ':8080' ELSE '' END)
      |    || '/docs/page' || CAST(doc_id % 5 AS VARCHAR)
      |    || '?id=' || CAST(doc_id % 7 AS VARCHAR)
      |    || (CASE WHEN doc_id % 3 = 0 THEN '&lang=en' ELSE '' END) AS canon_url,
      |  'domain' || CAST(doc_id % 3 AS VARCHAR)
      |    || (CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.org' WHEN 2 THEN '.net' ELSE '.io' END) AS domain,
      |  doc_id, text FROM c2),
      |s1 AS (SELECT canon_url, min(domain) AS domain,
      |         arg_min(md5(text), doc_id) AS digest
      |       FROM u1 GROUP BY canon_url),
      |s2 AS (SELECT canon_url, min(domain) AS domain,
      |         arg_min(md5(text), doc_id) AS digest
      |       FROM u2 GROUP BY canon_url),
      |diff AS (SELECT coalesce(s1.domain, s2.domain) AS domain,
      |    CASE WHEN s1.canon_url IS NULL THEN 'added'
      |         WHEN s2.canon_url IS NULL THEN 'deleted'
      |         WHEN s1.digest <> s2.digest THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM s1 FULL OUTER JOIN s2 ON s1.canon_url = s2.canon_url)
      |SELECT domain, status, CAST(count(*) AS BIGINT) AS n_urls
      |FROM diff GROUP BY domain, status
      |ORDER BY domain, status""".stripMargin) { (s, d) =>
    val v1 = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val v2 = v1.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 3, concat(col("text"), lit(" upd")))
          .otherwise(col("text")).as("text"))
      .unionAll(v1.filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 1000000000L).as("doc_id"),
          concat(col("text"), lit(" new")).as("text")))
    // raw URL synthesized in its OWN projection: it feeds both the
    // canonicalizer and the host extractor, and CollapseProject won't
    // inline a non-trivial expression referenced twice — one build
    // instead of two copies of the concat tree per row
    def urlView(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("text"),
          UrlFunctions.syntheticRawUrl(col("doc_id")).as("url"))
        .select(col("doc_id"), col("text"),
          UrlFunctions.canonicalizeUrl(col("url")).as("canon_url"),
          UrlFunctions.urlHost(col("url")).as("domain"))
        .groupBy(col("canon_url"))
        .agg(min(col("domain")).as("domain"),
          // q122's arg_min parity pin: DuckDB skips NULL digests
          // (null text), Spark min_by would return them
          min_by(md5(col("text")),
            when(col("text").isNotNull, col("doc_id"))).as("digest"))
    val a = urlView(v1).select(col("canon_url"),
      col("domain").as("dom_a"), col("digest").as("dig_a"))
    val b = urlView(v2).select(col("canon_url"),
      col("domain").as("dom_b"), col("digest").as("dig_b"))
    a.join(b, Seq("canon_url"), "full_outer")
      .select(coalesce(col("dom_a"), col("dom_b")).as("domain"),
        // presence is tested on the never-null DOMAIN, not the digest:
        // a URL whose surviving text is NULL has a NULL digest while
        // still existing on that side (the oracle tests canon_url)
        when(col("dom_a").isNull, "added")
          .when(col("dom_b").isNull, "deleted")
          .when(col("dig_a") =!= col("dig_b"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("domain"), col("status"))
      .agg(count(lit(1)).as("n_urls"))
      .orderBy(col("domain"), col("status"))
  }

  val all: Seq[QueryDef] =
    Seq(q177UrlCanonicalDedup, q178DomainMixAudit, q181CrawlCurationMix,
      q182RecrawlDiff)
}
