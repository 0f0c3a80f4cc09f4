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
 * table is a small curated Seq compiled into an `isin` literal list
 * (swap point for a full PSL snapshot; the logic is suffix-set-agnostic).
 */
object Urls {

  /**
   * Multi-part public suffixes recognized by [[registeredDomain]] beyond
   * the default single-label rule. A deliberately small, deterministic
   * subset of the Mozilla Public Suffix List (publicsuffix.org — public
   * data): the common ccTLD second-levels plus the big PaaS domains.
   * Documented swap seam: load the full PSL here and nothing else changes.
   */
  val TwoPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.in", "co.kr", "co.za", "co.id", "co.th",
    "github.io", "gitlab.io", "blogspot.com", "appspot.com",
    "herokuapp.com", "cloudfront.net", "amazonaws.com")

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
   * Registered domain (eTLD+1) of a host: the label-pair above the public
   * suffix, or the label-triple when the last two labels are a known
   * multi-part suffix ([[TwoPartSuffixes]]). IPv4 literals and single
   * labels pass through unchanged; a host that IS a public suffix returns
   * itself (no registrable part — documented choice). Lower-cases first,
   * so `WWW.Example.CO.UK` → `example.co.uk`. `slice` keeps every branch
   * ANSI-safe at any label count.
   */
  def registeredDomain(host: Column): Column = {
    val h = lower(host)
    val labels = split(h, "\\.")
    val n = size(labels)
    val last2 = array_join(slice(labels, -2, 2), ".")
    val last3 = array_join(slice(labels, -3, 3), ".")
    when(h.rlike("^[0-9]+(\\.[0-9]+){3}$") || n <= 1, h)
      .when(n >= 3 && last2.isin(TwoPartSuffixes: _*), last3)
      .otherwise(last2)
  }

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
