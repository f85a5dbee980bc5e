package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first operator of a web-corpus ingest
  * (WARC→text pipelines dedup by canonical URL before any content pass;
  * cf. the URL-normalization steps of CommonCrawl-derived corpora such as
  * C4/CCNet). Deterministic, purely declarative (string built-ins +
  * regexp — no UDF, codegen-friendly), so an oracle engine reproduces the
  * exact bytes.
  *
  * Canonical form, applied in this fixed order:
  *   1. %-encoding case: hex digits of every percent-escape upper-cased
  *      (%2f → %2F) across the whole URL;
  *   2. scheme lower-cased;
  *   3. userinfo (`user:pw@`) stripped from the authority;
  *   4. host lower-cased;
  *   5. default ports dropped (http:80, https:443); other ports kept;
  *   6. fragment (`#...`) dropped;
  *   7. path: trailing slashes trimmed; empty path → `/`;
  *   8. query: `&`-separated params sorted bytewise; empty query (and a
  *      bare `?`) dropped.
  * Deliberately NOT done: %-decoding (decoding can change path semantics
  * — `%2F` vs `/` — so conservative canonicalizers leave escapes encoded)
  * and tracking-param stripping (site-policy, not canonicalization).
  *
  * Scale shape: every function here is a scalar Column expression —
  * map-only, whole-stage-codegen, zero shuffles; the dedup consumer adds
  * exactly one exchange keyed by the canonical URL.
  */
object Urls {

  /** Upper-case the hex digits of every %-escape; leaves a trailing
    * malformed `%` or `%x` intact (best-effort on dirty crawl data). */
  private[ext] def pctUpper(c: Column): Column = {
    val parts = split(c, "%", -1)
    when(size(parts) === 1, c).otherwise(
      concat(element_at(parts, 1),
        array_join(transform(slice(parts, lit(2), size(parts) - 1),
          e => concat(lit("%"), upper(e.substr(lit(1), lit(2))),
            e.substr(lit(3), greatest(length(e) - 2, lit(0))))), "")))
  }

  private def restOf(u: Column): Column =
    regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")

  private def hostportOf(u: Column): Column =
    regexp_replace(regexp_extract(restOf(u), "^([^/?#]*)", 1), "^[^@]*@", "")

  /** Lower-cased host: userinfo and port stripped, no %-normalization
    * (hosts are ASCII in crawl data; IDN punycode passes through). */
  def hostOf(url: Column): Column =
    lower(regexp_replace(hostportOf(url), ":[0-9]+$", ""))

  /** The canonical URL string (see object doc for the exact rules). */
  def canonicalUrl(url: Column): Column = {
    val u = pctUpper(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = restOf(u)
    val auth = regexp_extract(rest, "^([^/?#]*)", 1)
    val tail = rest.substr(length(auth) + 1, length(rest))
    val path = regexp_extract(tail, "^([^?#]*)", 1)
    val query = regexp_extract(tail, "^[^?#]*\\?([^#]*)", 1)
    val hostport = regexp_replace(auth, "^[^@]*@", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val host = lower(regexp_replace(hostport, ":[0-9]+$", ""))
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val trimmed = regexp_replace(path, "/+$", "")
    val pathC = when(trimmed === "", lit("/")).otherwise(trimmed)
    val queryC = when(query === "", lit("")).otherwise(
      concat(lit("?"), array_join(array_sort(split(query, "&", -1)), "&")))
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      pathC, queryC)
  }
}
