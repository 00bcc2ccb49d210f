package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the step every web-scale curation pipeline
  * runs BEFORE URL dedup, per-domain caps ([[graft.operators.GroupOps]]
  * headPerKey), and blocklist joins: without it, `http://Example.com/a`
  * and `https://example.com:443/a?utm_source=x` count as different
  * pages and every downstream frequency is wrong.
  *
  * Rules (the common core of public canonicalizers — cf. pandas has no
  * URL type; this is north-star pipeline surface, not reference
  * surface):
  *   1. strip the fragment (`#...`);
  *   2. lowercase scheme and host; DROP userinfo (credentials never
  *      belong in a corpus key);
  *   3. drop default ports (http:80, https:443); keep explicit others;
  *   4. empty path → "/";
  *   5. drop tracking parameters (`utm_*`, `gclid`, `fbclid`), keeping
  *      the remaining params in original order (no re-sort: param order
  *      is occasionally semantic, and stability beats aggressiveness in
  *      a dedup key);
  *   6. drop the `?` when the query empties.
  *
  * Pure scan-local codegen'd expressions (`parse_url` + regex + array
  * HOFs) — zero shuffle at any scale; URLs that don't parse (no
  * scheme/host) yield NULL so callers can route them, never a throw.
  */
object UrlOps {

  /** Tracking parameter predicate, exposed for the oracle/spec: a query
    * param (as "k" or "k=v") is tracking iff its key is utm_* / gclid /
    * fbclid. */
  val TrackingParamRe = "^(utm_[^=&]*|gclid|fbclid)(=.*)?$"

  def normalizeUrl(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*", "")
    val scheme = lower(try_parse_url(u, lit("PROTOCOL")))
    val host = lower(try_parse_url(u, lit("HOST")))
    val auth = try_parse_url(u, lit("AUTHORITY"))
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val portSeg = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath = try_parse_url(u, lit("PATH"))
    val path = when(rawPath.isNull || rawPath === "", lit("/"))
      .otherwise(rawPath)
    val q = try_parse_url(u, lit("QUERY"))
    val kept = filter(split(q, "&"),
      p => !p.rlike(TrackingParamRe) && p =!= "")
    val qSeg = when(q.isNull || size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    when(scheme.isNull || host.isNull || host === "", lit(null))
      .otherwise(concat(scheme, lit("://"), host, portSeg, path, qSeg))
  }

  /** Every dot-suffix of a host, most-specific first:
    * `a.b.example.com` → [a.b.example.com, b.example.com, example.com,
    * com]. Suffix semantics — NEVER substring — so a blocklist entry
    * `example.com` matches `cdn.example.com` but not
    * `badexample.com`. */
  def domainSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts) - i + 1), "."))
  }

  /** Literal-tier domain-blocklist predicate (the UT1/RefinedWeb
    * adult/ads/malware list step): true iff ANY dot-suffix of the
    * URL's host appears in `domains` (entries lowercased, leading dots
    * stripped). The list rides the plan as one array literal probed by
    * an `exists` HOF over ≤label-count suffixes — row-local, zero
    * shuffle at any scale. Unparseable URLs are NOT blocked (route
    * them separately; silently dropping them would bias the corpus).
    * For lists too large for a plan literal (UT1 ships millions of
    * domains) use [[filterBlockedDomains]]. */
  def blockedDomain(url: Column, domains: Seq[String]): Column = {
    val cleaned = domains.map(_.trim.toLowerCase.stripPrefix("."))
      .filter(_.nonEmpty).distinct
    require(cleaned.nonEmpty, "blockedDomain: empty blocklist")
    val host = lower(try_parse_url(trim(url), lit("HOST")))
    val set = typedLit(cleaned)
    when(host.isNull || host === "", lit(false))
      .otherwise(exists(domainSuffixes(host),
        sfx => array_contains(set, sfx)))
  }

  /** Join-tier blocklist filter for production-size lists: explode
    * each row's host dot-suffixes (≤labels per row, bounded by
    * hostname grammar), BROADCAST semi-join against the blocklist to
    * find blocked ids, anti-join survivors. The blocklist is the small
    * side by construction (even UT1's millions of rows broadcast in
    * tens of MB); the corpus is never collected or exploded into a
    * shuffle wider than its suffix count. */
  def filterBlockedDomains(df: org.apache.spark.sql.DataFrame,
      idCol: String, urlCol: String,
      blocklist: org.apache.spark.sql.DataFrame,
      domainCol: String = "domain"): org.apache.spark.sql.DataFrame = {
    val host = lower(try_parse_url(trim(col(urlCol)), lit("HOST")))
    val sfx = df.select(col(idCol),
      explode(domainSuffixes(host)).as("__sfx"))
    val blockedIds = sfx.join(
      broadcast(blocklist.select(
        lower(trim(col(domainCol))).as("__sfx")).distinct()),
      Seq("__sfx"), "left_semi")
      .select(col(idCol)).distinct()
    df.join(blockedIds, Seq(idCol), "left_anti")
  }
}
