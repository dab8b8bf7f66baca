package graft

import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions

/** URL canonicalization (q177/q178): hand-written fixture URLs with
  * KNOWN canonical forms — the independent check the DuckDB twin
  * can't give (the twin re-derives the canonical form, these pin what
  * "canonical" MEANS) — plus family/share invariants on the synthetic
  * corpus relation.
  */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalizer: case fold, www/default-port strip, fragment drop") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/A/B#frag",
      "http://www.example.com:80/",
      "HTTP://EXAMPLE.com/A/B",
      "https://example.com:8443/x") == Seq(
      "https://example.com/A/B", // path case PRESERVED, :443 dropped
      "http://example.com/",     // root slash kept
      "http://example.com/A/B",
      "https://example.com:8443/x")) // non-default port kept
  }

  test("canonicalizer: tracking params drop, survivors sort, trailing slash strips") {
    assert(canon(
      "https://a.com/p/?z=2&utm_source=tw&id=1&fbclid=xyz",
      "https://a.com/p?id=1&z=2",
      "https://a.com/p?utm_campaign=x&gclid=1&ref=feed",
      "https://a.com/p///") == Seq(
      "https://a.com/p?id=1&z=2",
      "https://a.com/p?id=1&z=2", // param order irrelevant
      "https://a.com/p",          // all params were tracking noise
      "https://a.com/p"))         // slash runs stripped
  }

  test("canonicalizer: empty path, bare host, query-only variants agree") {
    assert(canon(
      "https://A.com",
      "https://a.com/",
      "https://www.a.com#top",
      "https://a.com?utm_source=x") ==
      Seq.fill(4)("https://a.com/"))
  }

  test("urlHost extracts the canonical domain") {
    val hosts = Seq("HTTPS://WWW.Sub.Example.COM:443/a?b=1#c",
        "http://plain.org/x")
      .toDF("url").select(UrlFunctions.urlHost(col("url")).as("h"))
      .collect().map(_.getString(0)).toSeq
    assert(hosts == Seq("sub.example.com", "plain.org"))
  }

  test("q177 families: keep_id is the min member, n_copies consistent, dups exist") {
    val rows = Registry.byName("q177_url_canonical_dedup").fn(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val byCanon = rows.groupBy(_.getString(1))
    byCanon.foreach { case (cu, rs) =>
      val ids = rs.map(_.getLong(0))
      assert(rs.forall(_.getLong(3) == ids.min), s"$cu: keep_id != min id")
      assert(rs.forall(_.getLong(4) == rs.length.toLong),
        s"$cu: n_copies mismatch")
      assert(rs.count(_.getBoolean(5)) == 1, s"$cu: exactly one survivor")
    }
    // the synthetic id space (period 420) must produce real families
    assert(byCanon.exists(_._2.length > 1),
      "expected duplicate canonical families in the corpus")
    // canonical URLs carry no tracking params, fragments, www, or
    // default ports
    rows.map(_.getString(1)).foreach { cu =>
      assert(!cu.contains("utm_") && !cu.contains("fbclid") &&
        !cu.contains("#") && !cu.contains("://www.") &&
        !cu.contains(":443") && !cu.contains(":80/") && !cu.endsWith(":80"),
        s"non-canonical survivor: $cu")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("q181 curation mix: selects only dedup survivors, honors quotas per domain") {
    val sel = Registry.byName("q181_crawl_curation_mix").fn(spark, sfDir)
      .collect()
    assert(sel.nonEmpty)
    // every selected row respects its domain quota and rank order
    sel.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3),
        s"rank ${r.getLong(2)} exceeds quota ${r.getLong(3)}")
    }
    // dedup-awareness: every selected doc is a q177 survivor
    val survivors = Registry.byName("q177_url_canonical_dedup").fn(spark, sfDir)
      .filter(col("is_kept")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val picked = sel.map(_.getLong(0)).toSet
    assert(picked.subsetOf(survivors),
      s"non-survivor selected: ${picked -- survivors}")
    // per-domain selected count = min(quota, survivors in domain)
    val byDom = sel.groupBy(_.getString(1))
    byDom.foreach { case (dom, rs) =>
      val quota = rs.head.getLong(3)
      val kept = Registry.byName("q177_url_canonical_dedup").fn(spark, sfDir)
        .filter(col("is_kept") && col("domain") === dom).count()
      assert(rs.length.toLong == math.min(quota, kept),
        s"$dom: selected ${rs.length}, quota $quota, kept $kept")
    }
    // target discipline: floored quotas never over-select the target
    assert(sel.length <= 100, s"selected ${sel.length} > 100-doc target")
    spark.sharedState.cacheManager.clearCache()
  }

  test("q182 re-crawl diff matches a driver-side symbolic recompute") {
    val got = Registry.byName("q182_recrawl_diff").fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    // independent driver-side replay: symbolic canonical URL from the
    // id formula, the same crawl-2 mutation, survivor digests
    def canon(d: Long): (String, String) = {
      val scheme = if (d % 3 == 2) "http" else "https"
      val tld = (d % 4) match {
        case 0 => ".com"; case 1 => ".org"; case 2 => ".net"; case _ => ".io"
      }
      val dom = s"domain${d % 3}$tld"
      val port = if (d % 13 == 0 && d % 5 != 0) ":8080" else ""
      val lang = if (d % 3 == 0) "&lang=en" else ""
      (s"$scheme://$dom$port/docs/page${d % 5}?id=${d % 7}$lang", dom)
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val crawl2 = docs.filter(_._1 % 10 != 7).map { case (id, t) =>
      id -> (if (id % 10 == 3) t + " upd" else t)
    } ++ docs.filter(_._1 % 10 == 7).map { case (id, t) =>
      (id + 1000000000L) -> (t + " new")
    }
    def view(c: Seq[(Long, String)]): Map[String, (String, String)] =
      c.groupBy { case (id, _) => canon(id)._1 }.map { case (cu, rs) =>
        val (minId, txt) = rs.minBy(_._1)
        cu -> (canon(minId)._2, txt)
      }
    val (v1, v2) = (view(docs.toSeq), view(crawl2.toSeq))
    val want = (v1.keySet ++ v2.keySet).toSeq.map { cu =>
      val dom = v1.get(cu).orElse(v2.get(cu)).get._1
      val status = (v1.get(cu), v2.get(cu)) match {
        case (None, _) => "added"
        case (_, None) => "deleted"
        case (Some((_, a)), Some((_, b))) =>
          if (a != b) "changed" else "unchanged"
      }
      (dom, status)
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    assert(got == want, s"diff mismatch:\n got=$got\n want=$want")
    // the mutation must exercise every status somewhere in the corpus
    Seq("added", "deleted", "changed", "unchanged").foreach { st =>
      assert(got.keys.exists(_._2 == st), s"status '$st' never produced")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("q178 shares: basis points bounded, masses conserve vs documents table") {
    val rows = Registry.byName("q178_domain_mix_audit").fn(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val docTotal = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == docTotal,
      "per-domain doc counts must partition the corpus")
    val tokBp = rows.map(_.getLong(4))
    val docBp = rows.map(_.getLong(5))
    // floor shares: each < 10000, sum within one ulp-per-domain of 10000
    assert(tokBp.forall(b => b >= 0 && b < 10000L))
    assert(docBp.forall(b => b >= 0 && b < 10000L))
    assert(tokBp.sum > 10000L - rows.length && tokBp.sum <= 10000L)
    assert(docBp.sum > 10000L - rows.length && docBp.sum <= 10000L)
    // n_urls never exceeds n_docs
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    spark.sharedState.cacheManager.clearCache()
  }
}
