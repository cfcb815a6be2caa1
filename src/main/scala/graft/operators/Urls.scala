package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation.
  *
  * A crawl sees the same page under many spellings — scheme/host case,
  * explicit default ports, `www.` prefixes, tracking parameters, param
  * order, fragments, trailing slashes — so URL-level dedup, per-domain
  * caps, and provenance joins all need a canonical form first (the step
  * every CommonCrawl-derived pipeline runs before exact URL dedup).
  *
  * Everything here is row-local builtin expressions (regexp + higher-order
  * array functions — whole-stage codegen, no UDF), and every rule is
  * engine-portable arithmetic/regex, so the t11 gate mirrors the full
  * canonicalization in DuckDB verbatim.
  *
  * Rules (deliberately conservative — reversible-risk rewrites like
  * percent-decoding or IDN mapping are out of scope):
  *  1. scheme and host lowercase;
  *  2. fragment dropped;
  *  3. explicit default port dropped (http:80, https:443); other ports kept;
  *  4. leading `www.` dropped from the host;
  *  5. tracking params dropped (`utm_*`, `gclid`, `fbclid`, `ref`),
  *     remaining params sorted bytewise (order never distinguishes
  *     resources in practice, and sorting makes param-permuted spellings
  *     collide); empty query drops the `?`;
  *  6. trailing slashes stripped from the path; empty path becomes `/`.
  */
object Urls {

  /** Java/RE2-portable pattern for a tracking param at the start of one
    * `k=v` segment. Shared verbatim with the DuckDB oracle. */
  val TrackingParam = "^(utm_[a-z0-9_]*|gclid|fbclid|ref)="

  /** Canonical form of an absolute `scheme://...` URL (see object doc).
    * Non-URL input (no `scheme://`) canonicalizes to `://` + normalized
    * empty parts — callers should pre-filter with [[looksLikeUrl]]. */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val host = regexp_replace(regexp_replace(hostPort, ":[0-9]+$", ""),
      "^www\\.", "")
    val keepPort = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val trimmed = regexp_replace(rawPath, "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    // anchor before the fragment: a '?' that first appears after '#' is
    // fragment content, not a query (e.g. /path#frag?x=1 has no query)
    val query = regexp_extract(u, "^[^#?]*\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParam))
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, keepPort, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Cheap absolute-URL test for pre-filtering crawl fields. */
  def looksLikeUrl(u: Column): Column =
    u.rlike("^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]")
}
