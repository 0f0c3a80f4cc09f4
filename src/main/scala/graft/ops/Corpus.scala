package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-level training-data operators: cross-document line deduplication,
 * domain-mix sampling, and corpus token statistics. These are the ops a
 * 100 TB pretraining pipeline runs between raw ingestion and packing;
 * none exists in the reference (its dedup surface is per-row/document),
 * so they are graft extensions in the spirit of reference
 * src/datachain/toolkit/.
 *
 * Scale notes, per op:
 *  - [[dedupLines]]: the only wide stages are (a) a distinct+count over
 *    (line-hash, doc) pairs — 16 bytes/row, never the line text — and
 *    (b) one anti join of lines against the dup-key set, which AQE
 *    broadcasts when the dup set is small. Reassembly shuffles each doc's
 *    surviving lines once.
 *  - [[mixDomains]]: pure map-side filter — zero shuffles at any scale.
 *  - [[topTokens]]: explode + partial (map-side) count + TakeOrdered;
 *    the full token set never sits on one node.
 */
object Corpus {

  /**
   * CCNet-style cross-document line deduplication: drop every line whose
   * identical text appears in at least `minDocs` distinct documents
   * (boilerplate: navigation, cookie banners, license headers), then
   * reassemble each document from its surviving lines in original order.
   * Documents left with zero lines disappear from the output.
   *
   * Dedup decisions key on `xxhash64(line)` so the count/anti-join stages
   * shuffle 8-byte keys instead of line text.
   */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 minDocs: Int): DataFrame = {
    require(minDocs >= 2, "minDocs must be at least 2")
    val lines = docs.select(col(idCol).as("__doc"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("__pos", "__line")))
    val dupKeys = lines
      .select(xxhash64(col("__line")).as("__k"), col("__doc"))
      .distinct() // count each doc once per line
      .groupBy("__k").agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select("__k")
    lines.withColumn("__k", xxhash64(col("__line")))
      .join(dupKeys, Seq("__k"), "left_anti")
      .groupBy(col("__doc"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line")), "\n").as("__text"))
      .select(col("__doc").as(idCol), col("__text").as(textCol))
  }

  /** Lexicographic md5-prefix threshold for a keep-fraction: a row survives
    * when `substring(md5(id:seed), 1, 8) < thresholdHex(p)`. Hex strings
    * compare the same in every engine, so oracles reproduce the exact
    * sample with their own md5. */
  def thresholdHex(p: Double): String =
    if (p >= 1.0) "zzzzzzzz" // greater than any hex digit: keep all
    else f"${math.max(0L, (p * 4294967296.0).toLong)}%08x"

  /**
   * Deterministic domain-mix sampling: keep each row with the probability
   * configured for its domain (source/subcorpus), default `defaultFraction`
   * for unlisted domains. The coin is `md5(id:seed)` — reproducible across
   * runs, engines, and cluster sizes, and a pure map-side filter (no
   * shuffle, no state). This is how a pretraining pipeline downweights
   * crawl data against curated corpora.
   */
  def mixDomains(df: DataFrame, idCol: String, domainCol: String,
                 fractions: Map[String, Double], defaultFraction: Double = 0.0,
                 seed: String = ""): DataFrame = {
    val u = substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 8)
    val thr: Column = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(thresholdHex(defaultFraction))) { case (acc, (d, p)) =>
        when(col(domainCol) === d, lit(thresholdHex(p))).otherwise(acc)
      }
    df.filter(u < thr)
  }

  /**
   * Corpus token-frequency head: lowercase whitespace tokens with global
   * counts, deterministically ordered (count desc, token asc), top `n`.
   * The plan is explode → hash-aggregate with map-side combine →
   * TakeOrderedAndProject — no global sort of the vocabulary.
   */
  def topTokens(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(n)

  /** Normalized token array for the LM ops: lowercase, non-alphanumerics
    * collapsed to spaces, empty tokens dropped. Pure projection (codegen,
    * no shuffle). */
  private def lmTokens(textCol: String): Column =
    filter(split(trim(regexp_replace(lower(col(textCol)), "[^a-z0-9\\s]", " ")),
      "\\s+"), t => t =!= lit(""))

  /** Word n-grams as space-joined strings, derived map-side inside the
    * array domain (no explode shuffle): slice+transform over the token
    * array. Empty when the document has fewer than n tokens. */
  private def wordNgrams(toksCol: Column, n: Int): Column =
    transform(
      slice(toksCol, lit(1), greatest(size(toksCol) - (n - 1), lit(0))),
      (_, i) => array_join(slice(toksCol, i + 1, lit(n)), " "))

  /**
   * Per-group heavy-hitter word n-grams via the native Misra–Gries
   * aggregate ([[org.apache.spark.sql.graft.MisraGriesTopK]]) — the
   * "characteristic phrases per domain" signal used to audit a corpus mix
   * (boilerplate detection, template farms, source fingerprinting).
   *
   * Scale shape: n-grams derive map-side in the array domain; the MG
   * summary partial-aggregates per partition, so only O(capacity)
   * counters per group cross the shuffle no matter how many grams feed
   * them — the frequent-items answer at 100 TB, where an exact
   * count-every-gram groupBy would shuffle the full gram stream. Counts
   * are exact (and the gate oracle-able) while a group's distinct gram
   * count stays within `capacity`; beyond it they undercount by at most
   * N/(capacity+1) with every true heavy hitter still surfaced.
   *
   * Returns (groupCol, rank, phrase, n) with rank 1..topK per group,
   * ordered deterministically by (count desc, phrase asc).
   */
  def heavyHitterPhrases(df: DataFrame, textCol: String, groupCol: String,
                         n: Int = 2, capacity: Int = 4096, topK: Int = 5)
      : DataFrame = {
    val toks = df.select(col(groupCol), lmTokens(textCol).as("__toks"))
    val grams = toks.select(col(groupCol),
      explode(wordNgrams(col("__toks"), n)).as("__g"))
    grams.groupBy(groupCol)
      .agg(graft.functions.GraftFunctions
        .heavy_hitters(col("__g"), capacity, topK).as("__hh"))
      .select(col(groupCol), posexplode(col("__hh")).as(Seq("__pos", "__e")))
      .select(col(groupCol), (col("__pos") + 1).cast("long").as("rank"),
        col("__e.item").as("phrase"), col("__e.count").as("n"))
  }

  /**
   * Exact per-group top-k rows via the native bounded-heap aggregate
   * ([[org.apache.spark.sql.graft.TopKRows]]) — "best k documents per
   * domain by quality score", the selection step of a curation mix.
   *
   * Scale shape: the heap partial-aggregates map-side, so only O(k)
   * (score, item) pairs per group cross the exchange. (Spark's own
   * rank-limit pushdown gives the window idiom a comparable bound on
   * plain batch top-k — see the TopKRows scaladoc; this form's edge is
   * composing with other aggregates in ONE groupBy pass, and running in
   * streaming aggregations where window functions are illegal.) Result
   * is deterministic under any partitioning: ties break by (score desc,
   * item asc). With `scoreCol` set to a hash of the item, the same
   * aggregate is a deterministic uniform group sampler
   * (bottom-k-by-hash) at the same O(k)-per-group shuffle cost.
   *
   * Returns (groupCol, rank, item, score) with rank 1..k per group.
   */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: Column,
                   itemCol: Column, k: Int): DataFrame =
    df.groupBy(groupCol)
      .agg(graft.functions.GraftFunctions
        .topk_rows(scoreCol, itemCol, k).as("__tk"))
      .select(col(groupCol), posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(col(groupCol), (col("__pos") + 1).cast("long").as("rank"),
        col("__e.item").as("item"), col("__e.score").as("score"))

  /**
   * Count–Min frequency sketch of a corpus column (Spark's native
   * `count_min_sketch` aggregate → spark-sketch serialized bytes): the
   * arbitrary-point-query complement to [[heavyHitterPhrases]]'s
   * Misra–Gries top-k. The grid partial-aggregates map-side (one
   * depth×width array per partition crosses the exchange, never the item
   * stream), merges associatively across batches/versions with matching
   * (eps, confidence, seed), and the result broadcasts: probing a 100 TB
   * corpus's term counts becomes one in-codegen lookup per row via
   * [[estimateFrequencies]]. Estimates never undercount; overcount ≤
   * eps·N with the configured confidence — EXACT while the column's
   * distinct count stays well under width = ceil(e/eps) (the oracle-able
   * regime the gate pins).
   */
  def frequencySketch(df: DataFrame, itemCol: String, eps: Double = 2e-5,
                      confidence: Double = 0.999, seed: Int = 42): Array[Byte] =
    df.agg(count_min_sketch(col(itemCol), lit(eps), lit(confidence),
      lit(seed)).as("__cms")).head().getAs[Array[Byte]]("__cms")

  /** Probe a [[frequencySketch]]: attaches `est_count` to every row of
    * `probe` via one codegen'd lookup against the broadcast sketch. */
  def estimateFrequencies(probe: DataFrame, itemCol: String,
                          sketch: Array[Byte]): DataFrame =
    probe.withColumn("est_count", graft.functions.GraftFunctions
      .cms_estimate_count(col(itemCol), sketch))

  /**
   * Cross-corpus distinct-item overlap via mergeable HLL sketches
   * (DataSketches through Spark's native `hll_sketch_agg`/`hll_union`):
   * |A|, |B|, |A∪B| estimated from one O(2^lgK)-byte sketch per side,
   * |A∩B| by inclusion–exclusion, plus the Jaccard estimate.
   *
   * Scale shape: each side is ONE pass with map-side partial sketch
   * aggregation — only ~16 KB sketches cross the exchange, and the
   * combine is a 1×1 join. The exact alternative (distinct + join or
   * anti-join between two 100 TB gram streams) shuffles both corpora;
   * this is the "how contaminated is the training set, roughly" answer
   * before anyone pays for [[ngramDecontaminate]]'s exact pass.
   * Estimates carry lgK-dependent error (0.41% rse at the default 14);
   * the intersection inherits the sum of the three errors, so treat
   * small overlaps (< a few % of the union) as noise-bounded.
   */
  def distinctOverlap(a: DataFrame, b: DataFrame, itemCol: String,
                      lgK: Int = 14): DataFrame = {
    val sa = a.select(col(itemCol).as("__i"))
      .agg(hll_sketch_agg(col("__i"), lit(lgK)).as("__sk_a"))
    val sb = b.select(col(itemCol).as("__i"))
      .agg(hll_sketch_agg(col("__i"), lit(lgK)).as("__sk_b"))
    sa.crossJoin(sb).select(
        hll_sketch_estimate(col("__sk_a")).as("est_a"),
        hll_sketch_estimate(col("__sk_b")).as("est_b"),
        hll_sketch_estimate(hll_union(col("__sk_a"), col("__sk_b")))
          .as("est_union"))
      .withColumn("est_intersect",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
      .withColumn("jaccard_est",
        col("est_intersect").cast("double") / col("est_union"))
  }

  /** Public surface of the corpus tokenizer's word-n-gram derivation
    * (lowercase, strip non-alphanumerics, whitespace-split, space-joined
    * n-grams) — the shared vocabulary of the decontamination/overlap ops,
    * exposed so callers can build exact cross-checks on the same grams.
    * The token array is LET-BOUND through a single-element `transform`
    * lambda so the regexp+split tokenizer evaluates once per row —
    * inlining it into [[wordNgrams]]'s per-position lambda re-tokenizes
    * the document for every gram (measured 40× slower at sf0.1). */
  def ngramsCol(text: Column, n: Int): Column = {
    val toks = filter(split(trim(regexp_replace(lower(text),
      "[^a-z0-9\\s]", " ")), "\\s+"), t => t =!= lit(""))
    element_at(transform(array(toks), tv => wordNgrams(tv, n)), 1)
  }

  /** Word-n-gram [[distinctOverlap]] between a corpus and a benchmark —
    * the sketch-cheap contamination estimate (same tokenization as
    * [[ngramDecontaminate]]; grams derive map-side in the array domain). */
  def ngramOverlap(corpus: DataFrame, benchmark: DataFrame, textCol: String,
                   n: Int = 13, lgK: Int = 14): DataFrame = {
    def grams(df: DataFrame): DataFrame =
      df.select(col(textCol)).withColumn("__toks", lmTokens(textCol))
        .select(explode(wordNgrams(col("__toks"), n)).as("__g"))
    distinctOverlap(grams(corpus), grams(benchmark), "__g", lgK)
  }

  /**
   * Inverted index (token → postings) over a corpus — the retrieval
   * artifact behind [[bm25]] serving and phrase/contamination lookup.
   * Returns (token, df, tf, postings_csv): document frequency, total
   * term frequency, and the ascending doc-id posting list rendered as
   * CSV (the deterministic string surface — raw array cells don't sort
   * under the driver compare).
   *
   * Scale shape: tokens explode map-side and the (token, doc) counts
   * partial-aggregate before either exchange; the second groupBy keys on
   * token so each posting list builds on one reducer. `maxPostings`
   * bounds the list per token (lowest ids kept via map-side
   * WindowGroupLimit) — at web scale stopword postings are the skew
   * hazard, and a capped index plus the df/tf totals is the standard
   * serving shape.
   */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    maxPostings: Int = 0): DataFrame = {
    val toks = df.select(col(idCol).as("__id"),
      explode(lmTokens(textCol)).as("token"))
    val perDoc = toks.groupBy("token", "__id").agg(count(lit(1)).as("__k"))
    if (maxPostings <= 0)
      perDoc.groupBy("token").agg(
        count(lit(1)).as("df"),
        sum("__k").as("tf"),
        concat_ws(",",
          transform(array_sort(collect_list(col("__id"))), _.cast("string")))
          .as("postings_csv"))
    else {
      // df/tf stay FULL-corpus truths; only the rendered posting list is
      // capped (lowest ids via per-token top-k). Both aggregations key on
      // token, so the final join is co-partitioned — no extra exchange.
      val stats = perDoc.groupBy("token")
        .agg(count(lit(1)).as("df"), sum("__k").as("tf"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("token").orderBy(col("__id").asc)
      val posts = perDoc.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= maxPostings)
        .groupBy("token")
        .agg(concat_ws(",",
          transform(array_sort(collect_list(col("__id"))), _.cast("string")))
          .as("postings_csv"))
      stats.join(posts, Seq("token"))
    }
  }

  /**
   * Reciprocal-rank fusion (Cormack et al. 2009) over N retrieval runs —
   * the standard hybrid-search combiner (BM25 ⊕ dense-embedding ⊕ any
   * other ranker) for query-targeted data selection: no score
   * calibration needed, only ranks. Each run is (id, score); ranks are
   * row_number over (score desc, id asc) within the run, and
   * `rrf = Σ_runs 1/(kRrf + rank)` (12-dp decimal-summed, order-
   * independent, rounded to 9 — engine-exact).
   *
   * Scale shape: runs are CANDIDATE LISTS (top-k retrieval output,
   * thousands of rows), not corpora — the per-run ranking window and the
   * id-keyed fusion groupBy both operate on bounded input; never feed an
   * unranked 100 TB corpus here (rank it first with bm25/ANN top-k).
   */
  def rrfFuse(runs: Seq[DataFrame], idCol: String, scoreCol: String,
              kRrf: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one run")
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val tagged = runs.zipWithIndex.map { case (r, ix) =>
      r.select(col(idCol), col(scoreCol).cast("double").as("__s"),
        lit(ix).as("__run"))
    }.reduce(_ unionAll _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__run").orderBy(col("__s").desc, col(idCol).asc)
    tagged.withColumn("__r", row_number().over(w))
      .groupBy(idCol)
      .agg(round(sum(round(lit(1.0) / (lit(kRrf) + col("__r")), 12).cast(dec))
          .cast("double"), 9).as("rrf_score"),
        count(lit(1)).as("n_runs"))
  }

  /**
   * GPT-3-style n-gram decontamination: score every corpus document by how
   * many of its distinct word `n`-grams also occur in a benchmark/eval set
   * (the standard 13-gram overlap check run before pretraining). Returns
   * one row per corpus doc: distinct n-gram count, contaminated n-gram
   * count, and a `contaminated` flag.
   *
   * Scale shape: n-grams derive map-side; the join runs on 8-byte
   * `xxhash64` gram keys, so corpus text never shuffles and the benchmark
   * side (distinct gram hashes of an eval suite — thousands of docs, not
   * billions) broadcasts under AQE. Collision risk of the 64-bit key is
   * ~(|grams|²/2⁶⁵) — negligible below trillions of distinct grams; at
   * that scale widen to a 128-bit fingerprint.
   */
  def ngramDecontaminate(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 13): DataFrame = {
    // tokens materialize in their own projection BEFORE the n-gram HOF:
    // lambdas re-evaluate captured expression trees per element, so
    // inlining lmTokens here would re-run the tokenizer regex once per
    // gram instead of once per document
    def grams(df: DataFrame) = df
      .withColumn("__toks", lmTokens(textCol))
      .select(col(idCol), explode(wordNgrams(col("__toks"), n)).as("__g"))
      .select(col(idCol), xxhash64(col("__g")).as("__gh"))
      .distinct()
    val docGrams = grams(corpus)
    val benchGrams = grams(benchmark).select("__gh").distinct()
    val totals = docGrams.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"))
    val hits = docGrams.join(benchGrams, Seq("__gh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_contaminated"))
    totals.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /**
   * Intra-corpus duplication measurement (Lee et al., "Deduplicating
   * Training Data Makes Language Models Better"): for every document, the
   * fraction of its distinct word `n`-grams that also occur in at least
   * `minDocs` documents of the corpus (itself included). Docs shorter than
   * `n` tokens contribute no grams and drop out, like
   * [[ngramDecontaminate]]. The standard use is ranking a crawl snapshot
   * by how much of each page is boilerplate shared across the crawl before
   * choosing a dedup threshold.
   *
   * Scale shape: grams derive map-side and immediately collapse to 8-byte
   * `xxhash64` keys, so document text never shuffles. The wide stages are
   * the (id, gram-hash) distinct, the gram-frequency count (partial-agg'd
   * map-side), and one join of gram hashes against the duplicated-key set
   * — AQE broadcasts that set when boilerplate is rare, shuffle-joins
   * when it isn't. A single per-doc aggregation then produces totals and
   * dup counts together (no second join back to the corpus).
   */
  def duplicatedGramFraction(docs: DataFrame, idCol: String, textCol: String,
                             n: Int = 13, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, "minDocs must be at least 2")
    // tokens materialize before the n-gram HOF (same rationale as
    // ngramDecontaminate: lambdas re-evaluate captured trees per element)
    val grams = docs
      .withColumn("__toks", lmTokens(textCol))
      .select(col(idCol), explode(wordNgrams(col("__toks"), n)).as("__g"))
      .select(col(idCol), xxhash64(col("__g")).as("__gh"))
      .distinct()
    val dupKeys = grams.groupBy("__gh")
      .agg(count(lit(1)).as("__docs")) // grams is distinct per (id, hash)
      .filter(col("__docs") >= minDocs)
      .select(col("__gh"), lit(1L).as("__dup"))
    grams.join(dupKeys, Seq("__gh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__dup"), lit(0L))).as("n_dup_grams"))
      .withColumn("dup_fraction",
        round(col("n_dup_grams").cast("double") / col("n_grams"), 6))
  }

  /**
   * Exact-substring deduplication (Lee et al., "Deduplicating Training
   * Data Makes Language Models Better" — the ExactSubstr variant): any
   * token window of length `minLen` that occurs more than once in the
   * corpus is a duplicated span; every occurrence EXCEPT the globally
   * first (ordered by doc id, then position) is removed from its document.
   * Overlapping/adjacent marked windows merge into maximal spans, so a
   * wholesale copied passage is excised in one piece while the first
   * occurrence survives verbatim. Operates in normalized token space
   * (lowercase, punctuation stripped — [[lmTokens]]), like the paper
   * operates on tokenizer output rather than raw bytes.
   *
   * Output: (id, n_tokens, n_removed, text_clean) per document.
   *
   * Scale shape: windows collapse map-side to (doc, pos, xxhash64) — the
   * window TEXT never shuffles (the paper's suffix array is a different
   * route to the same marks; hashing is the shuffle-friendly one). The
   * wide stages are the per-gram first-occurrence window (shuffle on
   * 8-byte hashes), the per-doc span merge (shuffle on doc id), and one
   * join of spans back onto the corpus. Everything else — interval
   * merging, token filtering, text rebuild — is per-doc projection work.
   */
  def exactSubstrDedup(docs: DataFrame, idCol: String, textCol: String,
                       minLen: Int = 13): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minLen >= 2, "minLen must be at least 2")
    val toks = docs.select(col(idCol).as("__id"), lmTokens(textCol).as("__toks"))
    // (doc, 0-based window pos, window hash) — one row per token position
    val wins = toks
      .select(col("__id"),
        posexplode(wordNgrams(col("__toks"), minLen)).as(Seq("__p", "__g")))
      .select(col("__id"), col("__p"), xxhash64(col("__g")).as("__gh"))
    // global first occurrence of each window survives; later ones are marks
    val occ = Window.partitionBy(col("__gh"))
      .orderBy(col("__id").asc, col("__p").asc)
    val marks = wins
      .withColumn("__rn", row_number().over(occ))
      .filter(col("__rn") >= 2)
      // token interval [start, end], 1-based inclusive
      .select(col("__id"), (col("__p") + 1).as("__s"),
        (col("__p") + lit(minLen)).as("__e"))
    // merge overlapping/adjacent intervals per doc (gaps-and-islands)
    val byDoc = Window.partitionBy(col("__id")).orderBy(col("__s"))
    val prevMax = max(col("__e")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = marks
      .withColumn("__new", when(prevMax.isNull || col("__s") > prevMax, 1).otherwise(0))
      .withColumn("__grp", sum(col("__new")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__id"), col("__grp"))
      .agg(min(col("__s")).as("__s"), max(col("__e")).as("__e"))
      .groupBy(col("__id"))
      .agg(collect_list(struct(col("__s"), col("__e"))).as("__iv"),
        sum(col("__e") - col("__s") + 1).as("__removed"))
    toks.join(spans, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        coalesce(col("__removed"), lit(0L)).as("n_removed"),
        array_join(filter(col("__toks"), (_, i) =>
          !exists(coalesce(col("__iv"),
              array().cast("array<struct<__s:int,__e:int>>")),
            v => (i + 1) >= v.getField("__s") && (i + 1) <= v.getField("__e"))),
          " ").as("text_clean"))
  }

  /** md5 hash-bucket id for a gram string: first 6 hex chars (24 bits) mod
    * `buckets`. md5 is reproduced bit-identically by every engine, so
    * bucket membership — which IS the feature definition in hashed-n-gram
    * models, collisions included — oracles exactly. */
  private def md5Bucket(g: Column, buckets: Int): Column =
    pmod(conv(substring(md5(g), 1, 6), 16, 10).cast("long"), lit(buckets.toLong))

  /**
   * DSIR importance weights (Xie et al. 2023, "Data Selection via
   * Importance Resampling"): score each raw-corpus document by how much
   * its hashed n-gram distribution looks like a curated target corpus.
   * Features are hashed unigram+bigram buckets (collisions are part of the
   * model); each bucket gets a smoothed log-likelihood ratio
   *
   *   lambda(b) = ln((ct(b)+a)/(Tt+a*B)) - ln((cr(b)+a)/(Tr+a*B))
   *
   * (ct/cr = target/raw bucket counts, Tt/Tr totals, B buckets, a the
   * add-a smoothing), and a document's weight is the average lambda over
   * its gram occurrences (multiplicity kept, per the paper's bag-of-grams
   * feature). Pretraining pipelines rank the raw corpus by this weight and
   * resample the top slice to match the target domain.
   *
   * Output: one row per raw doc with ≥1 token — (id, n_grams,
   * dsir_logratio rounded to 6 dp).
   *
   * Scale shape: grams derive map-side and collapse immediately to an
   * 8-byte bucket id, so corpus text never shuffles. Both count tables are
   * at most B rows (thousands), the lambda table is built with one tiny
   * full-outer join and always broadcasts into the scoring join; the only
   * corpus-sized wide stage is the final per-doc average, which
   * partial-aggregates map-side.
   */
  def dsirWeights(target: DataFrame, raw: DataFrame, idCol: String,
                  textCol: String, buckets: Int = 1024,
                  alpha: Double = 1.0): DataFrame = {
    require(buckets > 0 && alpha > 0)
    // tokens materialize before the n-gram HOFs (lambdas re-evaluate
    // captured trees per element — same rationale as ngramDecontaminate)
    def bucketRows(df: DataFrame, extra: Seq[Column]): DataFrame = df
      .withColumn("__toks", lmTokens(textCol))
      .select(extra :+ explode(concat(wordNgrams(col("__toks"), 1),
        wordNgrams(col("__toks"), 2))).as("__g"): _*)
      .select(extra :+ md5Bucket(col("__g"), buckets).as("__b"): _*)
    val ct = bucketRows(target, Seq.empty)
      .groupBy("__b").agg(count(lit(1)).as("__ct"))
    // the raw corpus feeds BOTH the count table and the scoring pass —
    // persist the (id, bucket) rows so tokenize+gram+hash runs once, not
    // twice. The persisted frame is 16 bytes/gram (what the count stage
    // shuffles anyway, ~a tenth of the corpus bytes) and spills to disk.
    // Lifetime: the cache is referenced by the RETURNED plan, so it is
    // released by Spark's ContextCleaner once the result frame is
    // dropped; sessions looping many instances can clearCache() between
    // runs (Bench does).
    val rawBuckets = bucketRows(raw, Seq(col(idCol)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cr = rawBuckets.groupBy("__b").agg(count(lit(1)).as("__cr"))
    val tt = ct.agg(sum(col("__ct")).as("__tt"))
    val tr = cr.agg(sum(col("__cr")).as("__tr"))
    // full outer: a bucket seen only in raw still needs a (smoothed)
    // target probability, and vice versa
    // an empty (or zero-token) corpus sums to NULL, which would ride
    // silently through the log-ratio and leave EVERY document unscored
    // (dsir_logratio = null) — fail loudly inside the expression instead
    def nonEmpty(c: Column, side: String): Column =
      when(c.isNull, raise_error(lit(
        s"dsirWeights: $side corpus has no tokens"))).otherwise(c)
    val lam = ct.join(cr, Seq("__b"), "full_outer")
      .crossJoin(broadcast(tt)).crossJoin(broadcast(tr))
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0L)) + lit(alpha)) /
             (nonEmpty(col("__tt"), "target") + lit(alpha * buckets))) -
         log((coalesce(col("__cr"), lit(0L)) + lit(alpha)) /
             (nonEmpty(col("__tr"), "raw") + lit(alpha * buckets)))).as("__lam"))
    rawBuckets
      .join(broadcast(lam), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        round(avg(col("__lam")), 6).as("dsir_logratio"))
  }

  /**
   * Temperature-scaled domain mixing: downsample each domain with rate
   * (n_min / n_d)^(1-t) — at t=1 every domain keeps everything, at t=0
   * every domain is flattened to the smallest domain's size in
   * expectation, between is the standard multinomial temperature used to
   * rebalance source mixes (crawl vs curated) before pretraining. The
   * per-row coin is the same md5(id:seed) device as [[mixDomains]], so
   * the exact sample reproduces in any engine.
   *
   * Rates deliberately avoid any floating-point SUM (no sum of weights):
   * n_min and n_d are exact longs, and pow/div are correctly-rounded IEEE
   * ops, so the rate — rounded to 9 dp before the threshold floor — is
   * bit-identical across engines and partitionings.
   *
   * Scale shape: one tiny per-domain count aggregate (partial-agg'd),
   * whose result broadcasts back onto the corpus; the filter itself is
   * map-side. Output: the input rows that survive.
   */
  def temperatureMix(df: DataFrame, idCol: String, domainCol: String,
                     temperature: Double, seed: String = ""): DataFrame = {
    require(temperature >= 0.0 && temperature <= 1.0)
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__nmin"))
    val rates = counts.crossJoin(broadcast(nMin))
      .withColumn("__keep", round(
        pow(col("__nmin").cast("double") / col("__n").cast("double"),
          lit(1.0 - temperature)), 9))
      .withColumn("__thr", when(col("__keep") >= 1.0, lit("zzzzzzzz"))
        .otherwise(format_string("%08x",
          floor(col("__keep") * lit(4294967296.0)).cast("long"))))
      .select(col(domainCol), col("__thr"))
    val u = substring(md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 8)
    // null-SAFE join: a NULL domain is a legitimate group (groupBy
    // already counted it, so it participates in n_min like any other) —
    // a plain equi-join would silently delete its rows even at t=1
    df.join(broadcast(rates.withColumnRenamed(domainCol, "__dom")),
        col(domainCol) <=> col("__dom"))
      .filter(u < col("__thr"))
      .select(df.columns.map(col): _*)
  }

  /**
   * Token-budget domain mix — the "data recipe" sampler (the Llama/Dolma
   * mixture shape): each domain in `budgets` contributes documents until
   * its TOKEN budget is filled; domains absent from the recipe are
   * dropped. The deterministic contract (what the oracle replicates):
   * within a domain, order documents by `(md5(id:seed), id)`; a document
   * is selected iff the token mass of documents ordered strictly before
   * it is `< budget`. The first budget-crossing document is therefore
   * included (budgets are met, never undershot), and a domain with less
   * total mass than its budget is kept whole.
   *
   * Scale shape: NO corpus-wide ordering or per-domain global window.
   * A `buckets`-way order-preserving histogram on the hash prefix
   * aggregates token mass per (domain, bucket) — one groupBy whose
   * output is metadata-sized; the cumulative scan runs over that tiny
   * frame; whole buckets then pass/fail via a broadcast semi-join, and
   * ONLY the single boundary bucket per domain pays a doc-level running
   * sum (a window over ~corpus/buckets rows). `buckets` must be a power
   * of two ≤ 65536 (the bucket is a bit-prefix of the hash, so bucket
   * order == hash order).
   */
  def mixByTokenBudget(df: DataFrame, idCol: String, domainCol: String,
                       tokensCol: String, budgets: Map[String, Long],
                       seed: String = "", buckets: Int = 1 << 16): DataFrame = {
    require(budgets.nonEmpty, "mixByTokenBudget: empty recipe")
    require(buckets > 0 && buckets <= (1 << 16) &&
      Integer.bitCount(buckets) == 1,
      s"buckets must be a power of two in [1, 65536], got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val shift = 16 - Integer.numberOfTrailingZeros(buckets)
    val h = md5(concat(col(idCol).cast("string"), lit(":" + seed)))
    val keyed = df
      .withColumn("__h", h)
      .withColumn("__b", shiftright(
        conv(substring(col("__h"), 1, 4), 16, 10).cast("long"), shift))
    val budgetDf = broadcast(
      budgets.toSeq.toDF(domainCol, "__budget"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(col("__b"))
    // persisted: the classification feeds TWO broadcast branches, and
    // without the cache each would recompute the full-corpus groupBy —
    // the histogram itself is ≤ buckets × recipe-domains rows. Released
    // by the ContextCleaner when the returned plan is dropped.
    val hist = keyed.groupBy(col(domainCol), col("__b"))
      .agg(sum(col(tokensCol).cast("long")).as("__m"))
      .withColumn("__before", coalesce(sum(col("__m")).over(
        w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .join(budgetDf, Seq(domainCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // __before + __m < budget → every member's before-mass < budget;
    // __before >= budget → none can be selected; the one bucket per
    // domain straddling the budget gets the exact doc-level scan
    val fullBuckets = hist
      .filter(col("__before") + col("__m") < col("__budget"))
      .select(col(domainCol), col("__b"))
    val boundary = hist
      .filter(col("__before") < col("__budget") &&
        col("__before") + col("__m") >= col("__budget"))
      .select(col(domainCol), col("__b"), col("__before"), col("__budget"))
    val selFull = keyed
      .join(broadcast(fullBuckets), Seq(domainCol, "__b"), "left_semi")
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
    val selBoundary = keyed
      .join(broadcast(boundary), Seq(domainCol, "__b"))
      .withColumn("__cb", coalesce(sum(col(tokensCol).cast("long")).over(
        wb.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__before") + col("__cb") < col("__budget"))
    selFull.select(df.columns.map(col): _*)
      .unionByName(selBoundary.select(df.columns.map(col): _*))
  }

  /**
   * SEQUENCE PACKING for LLM pretraining (the GPT-3/T5 input pipeline
   * shape): lay the corpus's token stream end to end in a
   * deterministic seeded order and cut it into fixed `seqLen`-token
   * context windows. Emits one row per (document × window) FRAGMENT:
   * `(id, seq_id, seq_off, tok_from, tok_to)` — window number, 0-based
   * offset of the fragment inside its window, and the 1-based token
   * span of the document it carries (a doc longer than a window spans
   * several; short docs pack together; nothing is padded or dropped).
   *
   * Scale shape: the global token offsets come from the hash-BUCKET
   * prefix sum ([[mixByTokenBudget]]'s histogram idiom) — one groupBy
   * to a ≤65536-row bucket histogram (its running sum is the only
   * unpartitioned window, bounded by construction), bucket offsets
   * broadcast back, and per-doc positions from a window PARTITIONED by
   * bucket. The total order (bucket, h, id) equals (h, id) because the
   * bucket is a prefix of the hash — no global sort, no single-
   * partition window over the corpus. Fragment expansion is an
   * in-array sequence explode: output rows = fragments, at most
   * docs + total_tokens/seqLen.
   *
   * Deterministic and SQL-replayable: order = (md5(id:seed), id), all
   * arithmetic exact int64 — the oracle re-derives every fragment.
   */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    seqLen: Long, seed: String = "",
                    buckets: Int = 1 << 16): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(buckets > 0 && buckets <= (1 << 16) &&
      Integer.bitCount(buckets) == 1,
      s"buckets must be a power of two in [1, 65536], got $buckets")
    val shift = 16 - Integer.numberOfTrailingZeros(buckets)
    val h = md5(concat(col(idCol).cast("string"), lit(":" + seed)))
    val keyed = df
      .filter(col(tokensCol).cast("long") > 0)
      .withColumn("__h", h)
      .withColumn("__b", shiftright(
        conv(substring(col("__h"), 1, 4), 16, 10).cast("long"), shift))
    val wb = org.apache.spark.sql.expressions.Window.orderBy(col("__b"))
    val hist = keyed.groupBy(col("__b"))
      .agg(sum(col(tokensCol).cast("long")).as("__m"))
      .withColumn("__off", coalesce(sum(col("__m")).over(
        wb.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__h"), col(idCol))
    val placed = keyed
      .join(broadcast(hist), Seq("__b"))
      .withColumn("__local", coalesce(sum(col(tokensCol).cast("long"))
        .over(wd.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)), lit(0L)))
      .withColumn("__start", col("__off") + col("__local"))
      .withColumn("__end",
        col("__start") + col(tokensCol).cast("long")) // exclusive
    placed
      .withColumn("seq_id", explode(sequence(
        expr(s"__start div $seqLen"),
        expr(s"(__end - 1) div $seqLen"))))
      .select(col(idCol), col("seq_id"),
        (greatest(col("__start"), col("seq_id") * seqLen)
          - col("seq_id") * seqLen).as("seq_off"),
        (greatest(col("__start"), col("seq_id") * seqLen)
          - col("__start") + 1L).as("tok_from"),
        (least(col("__end"), (col("seq_id") + 1L) * seqLen)
          - col("__start")).as("tok_to"))
  }

  /**
   * Token-budget mix WITH upsampling — the full "data recipe" semantics
   * (real recipes repeat small curated domains several epochs while
   * sampling the crawl down): when a domain's budget exceeds its total
   * token mass, the WHOLE domain repeats `floor(budget / mass)` times
   * and the remainder is filled by [[mixByTokenBudget]]'s selection rule
   * over one more pass. Output adds a 0-based `epoch` column; every
   * (row, epoch) pair is distinct. A domain whose recipe mass is zero
   * (all-zero token counts) contributes a single epoch-0 pass selected
   * by the remainder rule. Domain masses collect to the driver — one row
   * per RECIPE domain, metadata-sized at any corpus scale.
   */
  def mixByTokenBudgetEpochs(df: DataFrame, idCol: String, domainCol: String,
                             tokensCol: String, budgets: Map[String, Long],
                             seed: String = "", buckets: Int = 1 << 16)
      : DataFrame = {
    require(budgets.nonEmpty, "mixByTokenBudgetEpochs: empty recipe")
    require(!df.columns.contains("epoch"),
      "mixByTokenBudgetEpochs: input already has an 'epoch' column " +
        "(the output adds one) — rename it first")
    val spark = df.sparkSession
    import spark.implicits._
    val recipe = broadcast(budgets.keys.toSeq.toDF(domainCol))
    val masses = df.join(recipe, Seq(domainCol), "left_semi")
      .groupBy(col(domainCol))
      // all-NULL token columns sum to NULL — treat as zero mass
      .agg(coalesce(sum(col(tokensCol).cast("long")), lit(0L)).as("__m"))
      .collect().map(r => r.getAs[String](0) -> r.getLong(1)).toMap
    val plan = budgets.toSeq.map { case (d, b) =>
      val m = masses.getOrElse(d, 0L)
      val e = if (m > 0) b / m else 0L
      (d, e, b - e * m)
    }
    val epochsDf = broadcast(plan.map { case (d, e, _) => (d, e) }
      .toDF(domainCol, "__epochs"))
    // whole-domain repeats: explode a per-domain epoch sequence (guarded —
    // Spark's sequence(0, -1) DESCENDS instead of emptying)
    val full = df.join(epochsDf, Seq(domainCol))
      .withColumn("epoch", explode(when(col("__epochs") > 0,
        sequence(lit(0L), col("__epochs") - 1))
        .otherwise(array().cast("array<bigint>"))))
      .drop("__epochs")
    val remBudgets = plan.collect { case (d, _, r) if r > 0 => d -> r }.toMap
    val outCols = (df.columns.map(col) :+ col("epoch")).toSeq
    if (remBudgets.isEmpty) full.select(outCols: _*)
    else {
      val rem = mixByTokenBudget(df, idCol, domainCol, tokensCol,
          remBudgets, seed, buckets)
        .join(epochsDf, Seq(domainCol))
        .withColumn("epoch", col("__epochs")).drop("__epochs")
      full.select(outCols: _*).unionByName(rem.select(outCols: _*))
    }
  }

  /**
   * Bigram language-model perplexity — the CCNet-style quality signal a
   * pretraining pipeline uses to rank crawl documents against a clean
   * reference corpus. Trains interpolated bigram/unigram counts on `train`
   * and scores each `score` document with its average token log-probability
   * and perplexity:
   *
   *   P(w2|w1) = lambda * B(w1,w2)/U(w1) + (1-lambda) * (U(w2)+1)/(T+V)
   *
   * (add-one-smoothed unigram backoff, so unseen words never hit ln 0).
   *
   * Scale shape: bigram derivation is a per-row array `transform` — the
   * corpus text never shuffles to build n-grams. The wide stages touch
   * only count tables: U is vocabulary-sized, B is bigram-type-sized
   * (≪ corpus tokens); their join strategy is left to AQE, which
   * broadcasts when they fit and shuffle-hash-joins when a web-scale
   * vocabulary makes them large. The scalar (T, V) row is always a
   * broadcast. Outputs are rounded (6 dp) so every engine reproduces the
   * same bits regardless of float summation order.
   */
  def lmPerplexity(train: DataFrame, score: DataFrame, idCol: String,
                   textCol: String, lambda: Double = 0.9): DataFrame = {
    def bigrams(df: DataFrame, extra: Seq[Column]): DataFrame =
      df.withColumn("__toks", lmTokens(textCol))
        .select(extra :+ explode(expr(
          """transform(slice(__toks, 1, greatest(size(__toks)-1, 0)),
            |  (w, i) -> struct(w AS w1, __toks[i+1] AS w2))""".stripMargin))
          .as("__bg"): _*)
        .select(extra :+ col("__bg.w1") :+ col("__bg.w2"): _*)
    val uni = train.withColumn("__toks", lmTokens(textCol))
      .select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("u"))
    val totals = uni.agg(sum(col("u")).as("t"), count(lit(1)).as("v"))
    val big = bigrams(train, Seq.empty)
      .groupBy("w1", "w2").agg(count(lit(1)).as("b"))
    val scored = bigrams(score, Seq(col(idCol)))
      .join(big, Seq("w1", "w2"), "left")
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("u", "u1"),
        Seq("w1"), "left")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("u", "u2"),
        Seq("w2"), "left")
      .crossJoin(broadcast(totals))
    val pBig = coalesce(col("b").cast("double") / col("u1"), lit(0.0))
    val pUni = (coalesce(col("u2"), lit(0L)) + lit(1)).cast("double") /
      (col("t") + col("v"))
    scored
      .withColumn("__lp", log(lit(lambda) * pBig + lit(1.0 - lambda) * pUni))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("__lp")), 6).as("avg_logp"))
      .withColumn("ppl", round(exp(-col("avg_logp")), 3))
  }

  /**
   * BM25 (Robertson–Spärck Jones) relevance of every document against a
   * fixed term set — the retrieval scorer behind query-targeted data
   * selection ("find the corpus subset that looks like my eval set").
   * Standard formula with idf = ln(1 + (N - df + ½)/(df + ½)); only docs
   * matching at least one term are returned, scores rounded to 6 dp.
   *
   * Scale shape: one map-side pass computes per-doc term frequencies and
   * length (whitespace tokens, lowercased); the corpus statistics the
   * formula needs (N, Σdl, per-term df) collapse to ONE broadcast row, so
   * there is no shuffle proportional to the corpus at all — at 100 TB
   * this is a scan, a 1-row aggregate, and a second scan. Term count is
   * expression-compiled (one `size(filter(...))` per term), so keep the
   * query under ~100 terms; beyond that, explode+join a term table
   * instead. All arithmetic is exact counts → fixed-shape double
   * expressions, reproduced term-for-term by the q_bm25 oracle.
   */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = filter(split(trim(lower(col(textCol))), "\\s+"),
      t => length(t) > 0)
    val withTf = docs
      .withColumn("__dl", size(toks))
      .withColumns(queryTerms.zipWithIndex.map { case (t, i) =>
        s"__tf_$i" -> size(filter(toks, x => x === lit(t)))
      }.toMap)
    val aggs = count(lit(1)).as("__n") +:
      sum(col("__dl")).as("__sdl") +:
      queryTerms.indices.map(i =>
        sum((col(s"__tf_$i") > 0).cast("long")).as(s"__df_$i"))
    val stats = withTf.agg(aggs.head, aggs.tail: _*)
    val avgdl = col("__sdl").cast("double") / col("__n").cast("double")
    val score = queryTerms.indices.map { i =>
      val tf = col(s"__tf_$i").cast("double")
      val df = col(s"__df_$i")
      val idf = log(lit(1.0) +
        (col("__n").cast("double") - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl").cast("double") / avgdl))
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .filter(queryTerms.indices.map(i => col(s"__tf_$i")).reduce(_ + _) > 0)
      .withColumn("score", round(score, 6))
      .select(col(idCol), col("score"))
  }
}
