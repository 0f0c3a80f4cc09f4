package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: language
 * ID, quality scoring, token counting, fingerprinting. All are pure column
 * expressions (codegen'd, no UDFs), so they run inside whole-stage codegen
 * and scan-prune at 100 TB — a filter on `quality_score` composed of these
 * still pushes the underlying column reads down to parquet.
 */
object TextAnalysis {

  /**
   * HTML → plain text extraction — the WET step of a Common Crawl-style
   * pipeline (crawl WARC body → text for langId/quality/dedup). Rule-based
   * and fully deterministic: drop script/style/comment blocks, strip tags,
   * decode the common entities, collapse whitespace. Every step is an
   * RE2-safe regex or literal replace, so DuckDB reproduces the output
   * bit-for-bit and the whole extractor stays inside whole-stage codegen —
   * no parser object, no UDF, linear passes over the string.
   */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    // decode entities; &amp; LAST so double-escaped text survives one level
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Whitespace-token count. Empty / whitespace-only text counts 0
    * tokens (split of an empty string yields [""] — uncorrected, every
    * `toks === 0` guard downstream would be dead code and empty
    * documents would meter one phantom token). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /**
   * BPE-ish subword proxy count: words + digits + punctuation runs counted
   * separately (a cheap, deterministic stand-in for a real tokenizer's token
   * count, good for length-based quality cuts).
   */
  def subwordCount(text: Column): Column =
    size(split(trim(text), "\\s+")) +
      length(regexp_replace(text, "[^0-9.,;:!?]", "")).cast("int")

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") /
        length(text).cast("double"))

  /** Fraction of characters that are uppercase letters. */
  def upperRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^A-Z]", "")).cast("double") /
        length(text).cast("double"))

  /** Mean word length (characters per whitespace token). */
  def meanWordLen(text: Column): Column = {
    val toks = tokenCount(text)
    when(toks === 0, 0.0).otherwise(
      length(regexp_replace(text, "\\s+", "")).cast("double") / toks.cast("double"))
  }

  val enStop = Seq("the", "and", "of", "to", "in", "is", "that", "for")
  val deStop = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu")
  val frStop = Seq("le", "la", "les", "et", "est", "une", "que", "pour")
  val esStop = Seq("el", "los", "las", "es", "una", "que", "por", "para")

  /** Number of DISTINCT marker words present as whole whitespace tokens.
    * One tokenize + set-intersect instead of |words| regex scans — langId
    * over 32 markers costs one pass of the text, not 32. */
  private def markerHits(text: Column, words: Seq[String]): Column =
    size(array_intersect(split(lower(text), "\\s+"),
      array(words.map(lit): _*)))

  /**
   * Heuristic language ID over stopword markers (n-gram-style heuristic;
   * deterministic and SQL-expressible so it can be oracle-checked). Returns
   * en/de/fr/es or "und" when no marker hits.
   */
  def langId(text: Column): Column = {
    val en = markerHits(text, enStop)
    val de = markerHits(text, deStop)
    val fr = markerHits(text, frStop)
    val es = markerHits(text, esStop)
    val best = greatest(en, de, fr, es)
    when(best === 0, "und")
      .when(en === best, "en")
      .when(de === best, "de")
      .when(fr === best, "fr")
      .otherwise("es")
  }

  /** Fraction of whitespace tokens that are (any-language) stopwords. */
  def stopwordRatio(text: Column): Column = {
    // distinct: 'que' is in BOTH the fr and es lists — a duplicated
    // entry would count every occurrence twice. Membership is counted
    // over the TOKEN array (the split-on-" word "-trick consumed the
    // shared boundary space, undercounting adjacent stopwords).
    val stops = (enStop ++ deStop ++ frStop ++ esStop).distinct
    val toks = tokenCount(text).cast("double")
    val stopArr = array(stops.map(lit): _*)
    val hits = size(filter(split(lower(trim(text)), "\\s+"),
      t => array_contains(stopArr, t))).cast("double")
    when(toks === 0, 0.0).otherwise(least(hits / toks, lit(1.0)))
  }

  /**
   * Composite quality score in [0,1]: rewards stopword presence and sane
   * word lengths, penalizes extreme punctuation/uppercase — the classic
   * C4/Gopher-style cheap filters, all as one codegen'd expression.
   */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val lenOk = when(toks.between(5, 100000), 1.0).otherwise(0.0)
    val stopHit = when(markerHits(text, enStop ++ deStop ++ frStop ++ esStop) > 0, 1.0)
      .otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.3, 1.0).otherwise(0.0)
    val upperOk = when(upperRatio(text) < 0.3, 1.0).otherwise(0.0)
    val wordOk = when(meanWordLen(text).between(2.0, 12.0), 1.0).otherwise(0.0)
    round((lenOk + stopHit + punctOk + upperOk + wordOk) / 5.0, 2)
  }

  /** Distinct stopword markers present (all four languages) — the shared
    * feature between [[qualityScore]] and [[qualityLogistic]]. */
  private def allMarkerHits(text: Column): Column =
    markerHits(text, enStop ++ deStop ++ frStop ++ esStop)

  /**
   * fastText-style linear quality classifier — INFERENCE only, with fixed
   * weights over the cheap SQL features above (a stand-in for externally
   * trained weights; training a real classifier is out of engine scope).
   * This is the "model-based quality filter" stage of a pretraining
   * pipeline (GPT-3 / LLaMA use a linear classifier over web docs), as
   * opposed to [[qualityScore]]'s hand-rule filter:
   *
   *   z = -1 + 2*min(tokens/100,1) + 3*min(markers/8,1)
   *       - 4*punct_ratio - 2*upper_ratio + 0.5*[3 <= mean_word_len <= 10]
   *   score = sigmoid(z), rounded 6 dp
   *
   * One codegen'd expression — no shuffle, no UDF; a filter on the score
   * still scan-prunes at 100 TB.
   */
  def qualityLogistic(text: Column): Column = {
    val z = lit(-1.0) +
      lit(2.0) * least(tokenCount(text).cast("double") / lit(100.0), lit(1.0)) +
      lit(3.0) * least(allMarkerHits(text).cast("double") / lit(8.0), lit(1.0)) +
      lit(-4.0) * punctRatio(text) +
      lit(-2.0) * upperRatio(text) +
      lit(0.5) * when(meanWordLen(text).between(3.0, 10.0), 1.0).otherwise(0.0)
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** Normalized-text md5 fingerprint: lowercase, collapse whitespace. */
  def fingerprintMd5(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** 64-bit content fingerprint via SipHash of the normalized text. */
  def fingerprint64(text: Column): Column =
    graft.functions.GraftFunctions.sip_hash_64(
      lower(regexp_replace(trim(text), "\\s+", " ")))

  /**
   * Fixed-size character chunks with overlap — the LLM-training document
   * chunking primitive (1:N gen shape). Returns an array of
   * struct(chunk_idx, chunk) to explode; chunks start every
   * `size - overlap` chars, the final chunk may be shorter. Pure Catalyst
   * (sequence + transform + substring), so chunking a 100 TB corpus is one
   * codegen'd projection with no shuffle.
   */
  def chunkText(text: Column, size: Int, overlap: Int = 0): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val n = greatest(ceil((length(text) - lit(overlap)).cast("double") / stride)
      .cast("int"), lit(1))
    transform(sequence(lit(0), n - 1), i =>
      struct(i.cast("long").as("chunk_idx"),
        substring(text, (i * stride + 1).cast("int"), lit(size)).as("chunk")))
  }

  /** Strip HTML/XML tags and collapse the whitespace that's left — the
    * cheap boilerplate-removal pass before quality scoring. */
  /** Tracking parameters stripped by [[canonicalUrl]] by default — the
    * common analytics/click-id query keys that vary per visit without
    * changing the resource (the reason raw-URL dedup undercounts
    * duplicates). Deliberately does NOT include `ref`: on many sites
    * (VCS refs, API refs) it selects a genuinely different resource, so
    * stripping it would collapse distinct pages into one dedup key. Pass
    * a custom list to [[canonicalUrl]] for site-specific policies. */
  val defaultTrackingParams: Seq[String] =
    Seq("utm_[^=]*", "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid")

  /**
   * Canonical URL for crawl-frontier and document dedup (the key step
   * before URL-level dedup in CommonCrawl-style pipelines): lowercase
   * scheme+host, default port stripped (:80 http / :443 https), fragment
   * dropped, trailing path slashes trimmed, tracking params removed, and
   * the surviving query params sorted — so every variant spelling of the
   * same resource maps to one key. Pure codegen'd projection (regex +
   * array HOFs), no shuffle; dedup on the result is a plain hash groupBy.
   */
  def canonicalUrl(u: Column,
                   trackingParamPatterns: Seq[String] = defaultTrackingParams)
      : Column = {
    val trackingParams = trackingParamPatterns.mkString("^(", "|", ")=")
    val noFrag = regexp_replace(trim(u), "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val path = regexp_replace(regexp_extract(rest, "^[^/?]*([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingParams))
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  def stripHtml(text: Column): Column =
    trim(regexp_replace(regexp_replace(text, "<[^>]*>", " "), "\\s+", " "))

  /** Remove http(s)/www URLs (replaced by a space, whitespace collapsed). */
  def stripUrls(text: Column): Column =
    trim(regexp_replace(regexp_replace(text,
      "(https?://|www\\.)[^\\s]+", " "), "\\s+", " "))

  /**
   * Gopher-style repetition metric: fraction of non-blank lines that are
   * duplicates of an earlier line (0 = no repetition). High values flag
   * boilerplate/spam documents. Pure array expressions — one pass.
   */
  def dupLineFraction(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val n = size(lines)
    when(n <= 0, 0.0).otherwise(
      (n - size(array_distinct(lines))).cast("double") / n.cast("double"))
  }

  // (top-token-share repetition is deliberately NOT a per-row column
  // function: an array-HOF formulation is O(distinct × tokens) interpreted
  // per document. Compute it relationally — explode tokens, count per
  // (doc, token), max over doc — as in the q_repetition gate.)

  /**
   * PII scrubbing: replaces emails, international/US phone numbers, and
   * SSN-shaped ids with typed placeholders. One pass of chained
   * regexp_replace — codegen'd, no UDF. Patterns use a portable regex
   * subset (character classes + quantifiers) so external SQL engines apply
   * the identical rewrite.
   */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ssn = regexp_replace(email, "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>")
    // the country code is OPTIONAL: a plain US-format 555-123-4567
    // (three segments) must redact too, not only +1-555-123-4567
    regexp_replace(ssn,
      "(\\+?[0-9]{1,3}[-. ])?[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{3,4}",
      "<PHONE>")
  }

  /** Character n-gram set (overlapping shingles) as an array column.
    * Backed by the codegen'd [[graft.functions.Impl.charNgrams]] kernel —
    * the equivalent transform/sequence/array_distinct composition runs
    * interpreted (Spark HOFs don't codegen) and measured ~10× slower. */
  def charNgrams(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.char_ngrams(text, n)

  /**
   * Blocklist scan (the C4 bad-word rule, pattern list caller-supplied):
   * `n_blocked` = total occurrences of any pattern (substring matches,
   * overlapping counted) via ONE Aho–Corasick automaton pass —
   * P patterns cost one text scan, not P regex passes — plus the
   * `blocklist_pass` keep flag. Case-insensitive (text and patterns are
   * lowercased together). Pure codegen'd projection; scan-prunes at
   * 100 TB like every other signal here.
   */
  def blocklistSignals(df: org.apache.spark.sql.DataFrame, textCol: String,
                       patterns: Seq[String]): org.apache.spark.sql.DataFrame = {
    // Locale.ROOT: Spark's lower() is locale-independent; a default-
    // locale toLowerCase under tr_TR would dotless-i the patterns and
    // silently disable the filter
    val n = graft.functions.GraftFunctions.multi_pattern_count(
      lower(col(textCol)),
      patterns.map(_.toLowerCase(java.util.Locale.ROOT)))
    df.withColumn("n_blocked", n)
      .withColumn("blocklist_pass", col("n_blocked") === 0)
  }

  /** Apply the blocklist: keep only documents with zero pattern hits. */
  def blocklistFilter(df: org.apache.spark.sql.DataFrame, textCol: String,
                      patterns: Seq[String]): org.apache.spark.sql.DataFrame =
    blocklistSignals(df, textCol, patterns)
      .filter(col("blocklist_pass"))
      .drop("n_blocked", "blocklist_pass")

  /** The eight Gopher "stop words" (Rae et al. 2021, Appendix A) — NOT a
    * stopword list for removal; a document must contain at least two to
    * pass the rules. */
  val gopherStop = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher quality rules (Rae et al. 2021, Appendix A — the MassiveText
   * filter, reused by many later pretraining corpora): per-document
   * signals plus the per-rule verdicts and the overall pass flag.
   *
   *  1. 50 ≤ word count ≤ 100,000
   *  2. 3 ≤ mean word length ≤ 10
   *  3. symbol-to-word ratio ≤ 0.1 (symbols: '#', '…', literal "...")
   *  4. ≤ 90% of lines start with a bullet ('-', '*', '•')
   *  5. ≤ 30% of lines end with an ellipsis
   *  6. ≥ 80% of words contain at least one alphabetic character
   *  7. at least 2 of the 8 [[gopherStop]] words appear as whole tokens
   *
   * Pure projection — no shuffle, no UDF; ratios are exact integer counts
   * with one final division rounded to 6 dp, so every signal reproduces
   * bit-for-bit in any SQL engine (the q_gopher_rules oracle). Zero-word
   * documents produce degenerate (NaN) word ratios — drop empty docs
   * first (rule 1 fails them anyway).
   */
  /**
   * C4 cleaning rules (Raffel et al. 2020 §2.2): line-level — keep only
   * lines that end in terminal punctuation ('.', '!', '?', '"'), have at
   * least five words, and do not mention "javascript"; document-level —
   * drop pages left with fewer than three kept lines, or containing
   * "lorem ipsum" or a curly brace. (The original also applies a bad-word
   * blocklist; that list is externally licensed and is a caller-supplied
   * filter here, not baked in.) Adds `n_lines`, `n_kept`, `c4_keep`, and
   * the rebuilt `text_clean`; [[c4Clean]] applies the verdict. Pure
   * projection — exact counts, no shuffle, engine-reproducible
   * (q_c4_rules oracle).
   */
  def c4Signals(df: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n", -1)
    val kept = filter(lines, l => {
      val r = rtrim(l)
      (endswith(r, lit(".")) || endswith(r, lit("!")) ||
        endswith(r, lit("?")) || endswith(r, lit("\""))) &&
        size(filter(split(trim(l), "\\s+"), w => length(w) > 0)) >= 5 &&
        !contains(lower(l), lit("javascript"))
    })
    df.withColumn("n_lines", size(lines))
      .withColumn("n_kept", size(kept))
      .withColumn("text_clean", array_join(kept, "\n"))
      .withColumn("c4_keep",
        col("n_kept") >= 3 &&
          !contains(lower(t), lit("lorem ipsum")) &&
          !contains(t, lit("{")))
  }

  /** Apply the C4 verdict: surviving documents with their cleaned text
    * replacing `textCol`. */
  def c4Clean(df: org.apache.spark.sql.DataFrame, idCol: String,
              textCol: String): org.apache.spark.sql.DataFrame =
    c4Signals(df, idCol, textCol)
      .filter(col("c4_keep"))
      .withColumn(textCol, col("text_clean"))
      .drop("n_lines", "n_kept", "text_clean", "c4_keep")

  def gopherSignals(df: org.apache.spark.sql.DataFrame,
                    textCol: String): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val toks = filter(split(trim(t), "\\s+"), x => length(x) > 0)
    val nWords = size(toks)
    val charSum = aggregate(toks, lit(0), (acc, x) => acc + length(x))
    val meanLen = round(charSum.cast("double") / nWords.cast("double"), 6)
    val symCount = (length(t) - length(regexp_replace(t, "#", ""))) +
      (length(t) - length(replace(t, lit("...")))) / lit(3) +
      (length(t) - length(replace(t, lit("…"))))
    val symRatio = round(symCount.cast("double") / nWords.cast("double"), 6)
    val lines = split(t, "\n", -1)
    val nLines = size(lines)
    val bulletFrac = round(
      size(filter(lines, l => substring(ltrim(l), 1, 1).isin("-", "*", "•")))
        .cast("double") / nLines.cast("double"), 6)
    val ellipsisFrac = round(
      size(filter(lines, l =>
        endswith(rtrim(l), lit("...")) || endswith(rtrim(l), lit("…"))))
        .cast("double") / nLines.cast("double"), 6)
    val alphaFrac = round(
      size(filter(toks, x => x.rlike("[A-Za-z]"))).cast("double") /
        nWords.cast("double"), 6)
    val stopHits = size(array_intersect(transform(toks, x => lower(x)),
      array(gopherStop.map(lit): _*)))
    df.withColumn("n_words", nWords)
      .withColumn("mean_word_len", meanLen)
      .withColumn("symbol_ratio", symRatio)
      .withColumn("bullet_frac", bulletFrac)
      .withColumn("ellipsis_frac", ellipsisFrac)
      .withColumn("alpha_frac", alphaFrac)
      .withColumn("stop_hits", stopHits)
      .withColumn("gopher_pass",
        col("n_words").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_frac") <= 0.9 &&
          col("ellipsis_frac") <= 0.3 &&
          col("alpha_frac") >= 0.8 &&
          col("stop_hits") >= 2)
  }
}
