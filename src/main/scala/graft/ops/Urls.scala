package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL toolkit for crawl-scale corpus pipelines — parse, normalize,
 * registered-domain (eTLD+1), and HTML link extraction. Together with
 * [[graft.files.Warc]] and [[TextAnalysis.htmlToText]] these close the
 * crawl loop: WARC → links/text → per-domain curation
 * ([[Corpus.topKPerGroup]] caps, [[Corpus.mixDomains]] mixing, blocklists)
 * → dedup. The reference treats URLs as opaque strings
 * (src/datachain/lib/file.py stores `source`/`path`); at 100 TB the
 * domain axis is how real corpora are budgeted, so graft parses natively.
 *
 * Scale shape: every function here is a pure Column projection over
 * Spark built-ins (regexp, split/slice, HOF filter/sort) — whole-stage
 * codegen, zero shuffles, no UDFs, no driver state. The public-suffix
 * table is the full vendored Mozilla PSL snapshot evaluated by
 * [[Psl]] through a codegen'd Catalyst expression (wildcard `*.ck`,
 * exception `!www.ck`, and PRIVATE-section rules all honored).
 */
object Urls {

  /**
   * Parse a URL into its RFC 3986 components:
   * `struct(scheme, host, port, path, query, fragment)`. String fields
   * come back `""` when absent (the regexp-extract convention, stable for
   * grouping); `port` is a nullable int. Pure regexp passes — the
   * appendix-B grammar, then host/port split off the authority.
   */
  def urlParts(url: Column): Column = {
    // RFC 3986 appendix B, authority captured whole
    val scheme = regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    val auth = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    // IPv6 literals keep their brackets intact ([2001:db8::1]) — the
    // plain first-colon split would return host "["
    val host = regexp_extract(auth,
      "^(?:[^@]*@)?(\\[[^\\]]*\\]|[^:]*)", 1)
    val portS = regexp_extract(auth, ":([0-9]+)$", 1)
    val port = when(length(portS) > 0, portS.cast("int"))
    val path = regexp_extract(url,
      "^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?(?://[^/?#]*)?([^?#]*)", 1)
    // the query lives BEFORE the fragment: a '?' inside "#/route?tab=2"
    // (SPA routing) is fragment content, not a query
    val query = regexp_extract(
      regexp_extract(url, "^([^#]*)", 1), "\\?(.*)$", 1)
    val fragment = regexp_extract(url, "#(.*)$", 1)
    struct(scheme.as("scheme"), host.as("host"), port.as("port"),
      path.as("path"), query.as("query"), fragment.as("fragment"))
  }

  /**
   * Registered domain (eTLD+1) of a host under the FULL vendored Mozilla
   * Public Suffix List — the label above the public suffix, with
   * wildcard (`*.ck`, `*.nagoya.jp`), exception (`!www.ck`), and
   * PRIVATE-section (`github.io`, `blogspot.com`) rules all evaluated
   * per the published algorithm ([[Psl]]). IPv4/IPv6 literals and single
   * labels pass through unchanged; a host that IS a public suffix
   * returns itself (no registrable part — documented choice).
   * Lower-cases first, so `WWW.Example.CO.UK` → `example.co.uk`.
   * A codegen'd expression (static table lookup, no UDF) — stays inside
   * whole-stage codegen like every other function here.
   */
  def registeredDomain(host: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      org.apache.spark.sql.graft.RegisteredDomainExpr(
        org.apache.spark.sql.graft.bridge.expression(host)))

  /** Query-string parameters dropped by [[urlNormalize]]: click/campaign
    * trackers that fragment dedup keys without changing content. */
  private val TrackingParams = "^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|ref)="

  /**
   * Canonicalize a URL for dedup keys and per-domain grouping:
   * lower-case scheme+host, drop the fragment, drop default ports
   * (http:80 / https:443), root path `/` when empty alongside an
   * authority, strip tracking params ([[TrackingParams]]) and sort the
   * survivors byte-wise. Entirely built-in HOFs (`filter`/`array_sort`)
   * over the split query — stays in codegen, reproducible everywhere.
   */
  def urlNormalize(url: Column): Column = {
    val p = urlParts(url)
    val scheme = lower(p.getField("scheme"))
    val host = lower(p.getField("host"))
    val port = p.getField("port")
    val keepPort = port.isNotNull &&
      !(scheme === "http" && port === 80) &&
      !(scheme === "https" && port === 443)
    val path0 = p.getField("path")
    val path = when(length(path0) === 0 && length(host) > 0, lit("/"))
      .otherwise(path0)
    val params = filter(split(p.getField("query"), "&"),
      kv => length(kv) > 0 && !kv.rlike(TrackingParams))
    val query = array_join(array_sort(params), "&")
    concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port.cast("string"))).otherwise(lit("")),
      path,
      when(length(query) > 0, concat(lit("?"), query)).otherwise(lit("")))
  }

  /**
   * All `<a href="...">` targets in an HTML document, document order,
   * one `regexp_extract_all` pass (double-quoted hrefs; case-insensitive
   * tag/attr). The outlink side of a crawl graph — compose with
   * [[urlParts]]/[[registeredDomain]] + explode for host-level degree,
   * then feed [[Graph.pageRank]] on hashed ids.
   */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)<a\\s[^>]*href=\"([^\"]*)\""), lit(1))
}
