package graft.ops

import org.apache.spark.unsafe.types.UTF8String

/**
 * The Mozilla Public Suffix List (publicsuffix.org — public data, MPL
 * 2.0), vendored whole as a resource snapshot (ICANN + PRIVATE sections,
 * ~9.5k rules incl. wildcard `*.ck` and exception `!www.ck` forms) and
 * evaluated per the published algorithm:
 *
 *  - among all rules matching a host, an EXCEPTION rule prevails and its
 *    suffix is the rule minus its leftmost label;
 *  - otherwise the longest matching rule wins (`*` matches exactly one
 *    label at the rule's wildcard position);
 *  - no match → the default rule `*` (the bare TLD is the suffix);
 *  - registered domain (eTLD+1) = the public suffix plus one label.
 *
 * Loaded once per JVM into hash sets; lookups run inside whole-stage
 * codegen via [[org.apache.spark.sql.graft.RegisteredDomainExpr]] as a
 * static call — no UDF, no broadcast, no driver state. Unicode rules are
 * kept in their listed (unicode) form; punycode `xn--` spellings of IDN
 * labels fold to unicode (JDK `IDN.toUnicode`, per-label) for MATCHING
 * only, so a crawl carrying `www.example.xn--c1avg.xn--90a3ac` rolls up
 * under the same eTLD+1 depth as its unicode spelling — the returned
 * domain keeps the caller's (punycode) spelling. Hosts with no `xn--`
 * label skip the fold entirely (zero cost on the common path).
 */
object Psl {

  /** (exact rules, wildcard bases — the part after `*.`, exceptions). */
  private lazy val tables: (java.util.HashSet[String],
      java.util.HashSet[String], java.util.HashSet[String]) = {
    val rules = new java.util.HashSet[String](16384)
    val wilds = new java.util.HashSet[String](64)
    val excs = new java.util.HashSet[String](16)
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "vendored public_suffix_list.dat missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().foreach { raw =>
      // a rule is the line up to the first whitespace; comments skipped
      val line = raw.trim.takeWhile(c => !Character.isWhitespace(c))
      if (line.nonEmpty && !line.startsWith("//")) {
        val r = line.toLowerCase(java.util.Locale.ROOT)
        if (r.startsWith("!")) excs.add(r.substring(1))
        else if (r.startsWith("*.")) wilds.add(r.substring(2))
        else rules.add(r)
      }
    } finally src.close()
    (rules, wilds, excs)
  }

  /** Number of labels (from the right) forming the host's public suffix;
    * ≥1 always (default rule). `labels` must be lower-case. */
  private def suffixLabels(labels: Array[String]): Int = {
    val (rules, wilds, excs) = tables
    var excLen = -1
    var ruleLen = -1
    var i = 0
    // longest candidate first → the first rule hit is the longest match
    while (i < labels.length && (excLen < 0 || ruleLen < 0)) {
      val cand = labels.slice(i, labels.length).mkString(".")
      val len = labels.length - i
      if (excLen < 0 && excs.contains(cand)) excLen = len - 1
      if (ruleLen < 0) {
        if (rules.contains(cand)) ruleLen = len
        else if (len >= 2 &&
            wilds.contains(labels.slice(i + 1, labels.length).mkString(".")))
          ruleLen = len
      }
      i += 1
    }
    if (excLen >= 0) excLen else if (ruleLen >= 0) ruleLen else 1
  }

  private val Ipv4 = "^[0-9]+(\\.[0-9]+){3}$".r

  /** PSL rules live in unicode form: fold punycode labels to unicode
    * for MATCHING (label count is preserved, so rule depths index the
    * ORIGINAL labels). IDN.toUnicode is total per spec — an invalid
    * `xn--` label stays as-is (and then matches no unicode rule, the
    * pre-fold behavior). */
  private def matchLabels(labels: Array[String]): Array[String] =
    if (!labels.exists(_.startsWith("xn--"))) labels
    else labels.map { l =>
      if (!l.startsWith("xn--")) l
      else try java.net.IDN.toUnicode(l)
      catch { case _: RuntimeException => l }
    }

  /** Registered domain (eTLD+1), lower-cased. IPv4 literals, bracketed
    * IPv6 literals, single labels, and hosts that ARE a public suffix
    * pass through unchanged (no registrable part — same documented
    * choice as the curated-set predecessor). */
  def registeredDomain(host: String): String = {
    val h = host.toLowerCase(java.util.Locale.ROOT)
    if (h.isEmpty || h.indexOf('.') < 0 || h.charAt(0) == '[' ||
        Ipv4.matches(h)) return h
    // -1 limit keeps trailing empty labels (plain split drops them, so
    // the FQDN form "example.com." would silently normalize instead of
    // passing through like every other malformed shape)
    val labels = h.split("\\.", -1)
    // a trailing/leading dot yields an empty label — not a real host
    // shape; pass through rather than mis-bucket
    if (labels.exists(_.isEmpty)) return h
    val sl = suffixLabels(matchLabels(labels))
    if (labels.length <= sl) h
    else labels.slice(labels.length - sl - 1, labels.length).mkString(".")
  }

  /** The codegen entry point ([[registeredDomain]] over UTF8String). */
  def registeredDomainU(host: UTF8String): UTF8String =
    UTF8String.fromString(registeredDomain(host.toString))

  /** TRUE iff `host` equals a public suffix (exactly — no registrable
    * part). Exposed for curation filters (e.g. drop bare-suffix hosts
    * before per-domain rollups). */
  def isPublicSuffix(host: String): Boolean = {
    val h = host.toLowerCase(java.util.Locale.ROOT)
    if (h.isEmpty || Ipv4.matches(h) || h.charAt(0) == '[') return false
    val labels = h.split("\\.", -1)
    if (labels.isEmpty || labels.exists(_.isEmpty)) return false
    suffixLabels(matchLabels(labels)) == labels.length
  }
}
