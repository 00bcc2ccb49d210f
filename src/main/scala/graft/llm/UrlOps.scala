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
}
