package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-crawl curation — the FIRST dedup key
  * a crawl pipeline applies (before any content hashing): two fetches
  * of `HTTPS://WWW.Site.COM:443/a/?id=1&utm_source=x#top` and
  * `https://site.com/a?id=1` are the same page. Pure composed
  * Catalyst built-ins (substring_index / regexp_replace / array HOFs)
  * — no UDF, so the whole canonicalizer inlines into whole-stage
  * codegen and runs map-side at crawl scale.
  *
  * Canonical form (the standard crawl-dedup normalization):
  *   - scheme and host case-folded to lowercase
  *   - leading `www.` stripped from the host
  *   - default ports dropped (`:80` for http, `:443` for https);
  *     non-default ports kept
  *   - fragment dropped (never sent to the server)
  *   - tracking params removed: any key starting `utm_`, plus
  *     `gclid` / `fbclid` / `ref`
  *   - surviving query params sorted bytewise (param order is
  *     semantically irrelevant but breaks byte-equality)
  *   - trailing slashes stripped from the path (root `/` kept);
  *     empty path normalized to `/`
  *
  * Contract: input has at most one `?` and one `#` (true of any
  * syntactically valid URL); the path's case is PRESERVED (paths are
  * case-sensitive per RFC 3986 — only scheme/host fold).
  */
object UrlFunctions {

  private def str(c: Column): Column = c.cast("string")

  /** Everything before the fragment. */
  private def noFrag(url: Column): Column = substring_index(url, "#", 1)

  /** Canonical lowercased, `www.`-stripped host of a URL. */
  def urlHost(url: Column): Column = {
    val rest = substring_index(substring_index(noFrag(url), "?", 1), "://", -1)
    val hostPort = substring_index(rest, "/", 1)
    regexp_replace(lower(substring_index(hostPort, ":", 1)), "^www\\.", "")
  }

  /** Canonical URL string per the rules above. */
  def canonicalizeUrl(url: Column): Column = {
    val nf = noFrag(url)
    val base = substring_index(nf, "?", 1)
    val qs = when(instr(nf, "?") > 0, substring_index(nf, "?", -1))
      .otherwise(lit(""))
    val scheme = lower(substring_index(base, "://", 1))
    val rest = substring_index(base, "://", -1)
    val hostPort = substring_index(rest, "/", 1)
    val host = regexp_replace(lower(substring_index(hostPort, ":", 1)),
      "^www\\.", "")
    val port = when(instr(hostPort, ":") > 0,
      substring_index(hostPort, ":", -1)).otherwise(lit(""))
    val cport = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_replace(rest, "^[^/]*", "")
    val path1 = when(path0 === "", lit("/")).otherwise(path0)
    val stripped = regexp_replace(path1, "/+$", "")
    val cpath = when(stripped === "", lit("/")).otherwise(stripped)
    // a param is dropped iff its KEY is tracking noise; `p` starts
    // with its key, so startsWith on the raw param equals the
    // key-prefix test (keys contain no '=')
    val params = array_sort(filter(split(qs, "&"), p =>
      p =!= "" && !(p.startsWith("utm_") ||
        substring_index(p, "=", 1).isin("gclid", "fbclid", "ref"))))
    concat(scheme, lit("://"), host, cport, cpath,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** Deterministic messy raw URL derived from a numeric id — the
    * testdata carries no URL column, so (the q48/q157 convention) the
    * fixture column is SYNTHESIZED by a formula both engines replay:
    * mixed-case scheme/host, `www.` on evens, default AND non-default
    * ports, trailing slashes, tracking params interleaved with real
    * ones, fragments. Distinct raw URLs collapse onto a canonical
    * space of period lcm(3,4,5,7)=420 ids (×13 for the `:8080`
    * survivors), so real duplicate families exist at every SF.
    */
  def syntheticRawUrl(d: Column): Column = {
    val m3 = d % 3
    val m4 = d % 4
    val scheme = when(m3 === 0, "HTTPS").when(m3 === 1, "https")
      .otherwise("http")
    val www = when(d % 2 === 0, "WWW.").otherwise("")
    val host = when(m4 === 0, concat(lit("Domain"), str(m3), lit(".COM")))
      .otherwise(concat(lit("domain"), str(m3),
        when(m4 === 1, ".org").when(m4 === 2, ".net").otherwise(".io")))
    val port = when(d % 5 === 0, when(m3 === 2, ":80").otherwise(":443"))
      .when(d % 13 === 0, ":8080").otherwise("")
    val path = concat(lit("/docs/page"), str(d % 5),
      when(d % 2 === 1, "/").otherwise(""))
    val qs = concat(
      when(d % 2 === 1,
        concat(lit("utm_source=feed&utm_campaign=c"), str(m4), lit("&")))
        .otherwise(""),
      lit("id="), str(d % 7),
      when(m3 === 0, "&lang=en").otherwise(""),
      when(d % 5 === 1, concat(lit("&fbclid=f"), str(d % 9))).otherwise(""),
      when(d % 7 === 2, "&ref=tw").otherwise(""))
    val frag = when(m4 === 2, concat(lit("#sec"), str(m3))).otherwise("")
    concat(scheme, lit("://"), www, host, port, path, lit("?"), qs, frag)
  }
}
