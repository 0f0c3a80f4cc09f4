package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.Chain

/**
 * Fluent training-data operations on [[graft.core.Chain]] — lets reference-style
 * pipelines stay one chain end-to-end:
 *
 * {{{
 * import graft.ops.chainops._
 * chain.cleanText("text")
 *   .withQuality("text")
 *   .dedupExact("text", "doc_id")
 *   .packByTokens("tokens", "doc_id", budget = 2048)
 * }}}
 *
 * Each method delegates to the corresponding operator object (same plans,
 * same scale shapes); the implicit class only provides the chaining sugar.
 */
object chainops {

  /** Lineage-hash arg encoding: collections render with a LENGTH
    * prefix and escaped separators, so `Seq("a|b")` and `Seq("a","b")`
    * can never hash equal (a plain mkString made two semantically
    * different chains collide, and saveOrReuse could then serve a stale
    * checkpoint). Maps encode as their sorted entry list. */
  private def encodeArg(a: Any): String = a match {
    case s: scala.collection.Seq[_] =>
      s.map(e => esc(String.valueOf(e)))
        .mkString(s"seq${s.size}[", "|", "]")
    case m: scala.collection.Map[_, _] =>
      // "=" escaped in the KEY so entry boundaries are unambiguous too
      encodeArg(m.toSeq.map { case (k, v) =>
        val ek = String.valueOf(k).replace("\\", "\\\\")
          .replace("=", "\\=")
        s"$ek=$v"
      }.sorted)
    case x => String.valueOf(x)
  }
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("|", "\\|")
      .replace("[", "\\[").replace("]", "\\]")

  implicit class TrainingDataChain(private val c: Chain) extends AnyVal {

    /** Derived frame + LINEAGE: appends a descriptive op (name + every
      * parameter that changes semantics; second-input chains contribute
      * their own hash) to the SOURCE chain's OpTree. A bare `Chain(df)`
      * would reset lineage to the output column names alone — two
      * different upstreams or parameterizations would then hash equal
      * and `saveOrReuse` could serve a stale checkpoint. */
    private def derive(df: org.apache.spark.sql.DataFrame, op: String,
                       args: Any*): Chain =
      Chain(df, c.ops.append(op, args.map(encodeArg).toSeq: _*))

    /** HTML-strip + URL-strip + PII-scrub `textCol` in place. */
    def cleanText(textCol: String): Chain =
      c.mutate(textCol -> TextAnalysis.scrubPii(
        TextAnalysis.stripUrls(TextAnalysis.stripHtml(col(textCol)))))

    /** Attach token_count / quality / lang columns. */
    def withQuality(textCol: String): Chain =
      c.mutate(
        "token_count" -> TextAnalysis.tokenCount(col(textCol)).cast("long"),
        "quality" -> TextAnalysis.qualityScore(col(textCol)),
        "lang_pred" -> TextAnalysis.langId(col(textCol)))

    /** Keep one row per exact (normalized) content hash. */
    def dedupExact(textCol: String, idCol: String): Chain =
      derive(Dedup.exact(c.toDF, textCol, idCol),
        "dedup_exact", textCol, idCol)

    /** Near-dup edge list via MinHash-LSH + exact-Jaccard verification. */
    def nearDupEdges(textCol: String, idCol: String,
                     threshold: Double = 0.8): Chain =
      derive(Dedup.minhashDedupEdges(c.toDF, textCol, idCol, threshold),
        "near_dup_edges", textCol, idCol, threshold)

    /** Drop near-duplicates: keeps the minimum-id member of every
      * duplicate cluster (MinHash-LSH edges → connected components). */
    def dedupNear(textCol: String, idCol: String,
                  threshold: Double = 0.8): Chain = {
      val clusters = Dedup.connectedComponents(
        Dedup.minhashDedupEdges(c.toDF, textCol, idCol, threshold))
      derive(c.toDF.join(clusters, c.toDF(idCol) === clusters("id"), "left_outer")
        .filter(col("cluster_id").isNull || col(idCol) === col("cluster_id"))
        .drop("id", "cluster_id"), "dedup_near", textCol, idCol, threshold)
    }

    /** 1:N content-defined chunking ([[Cdc.cdcChunks]] — Rabin rolling
      * window; boundaries survive edits where fixed-size blocks shift). */
    def cdcChunks(textCol: String, idCol: String, k: Int = 8,
                  divisor: Long = 64, minLen: Int = 1,
                  maxLen: Int = Int.MaxValue): Chain =
      derive(Cdc.cdcChunks(c.toDF, idCol, textCol, k, divisor, minLen,
        maxLen), "cdc_chunks", textCol, idCol, k, divisor, minLen, maxLen)

    /** Per-doc passage-reuse stats ([[Cdc.cdcShareStats]]). */
    def cdcShareStats(textCol: String, idCol: String, k: Int = 8,
                      divisor: Long = 64): Chain =
      derive(Cdc.cdcShareStats(c.toDF, idCol, textCol, k, divisor),
        "cdc_share_stats", textCol, idCol, k, divisor)

    /** Winnowed fingerprint table ([[Winnow.fingerprints]] — MOSS
      * window-min selection over k-gram hashes, position-carrying). */
    def winnowFingerprints(textCol: String, idCol: String, k: Int = 5,
                           w: Int = 8): Chain =
      derive(Winnow.fingerprints(c.toDF, idCol, textCol, k, w),
        "winnow_fingerprints", textCol, idCol, k, w)

    /** Near-dup pairs by winnow-fingerprint Jaccard
      * ([[Winnow.nearDup]]). */
    def winnowDedup(textCol: String, idCol: String, k: Int = 5,
                    w: Int = 8, minJaccard: Double = 0.5,
                    maxDocsPerFp: Int = 0): Chain =
      derive(Winnow.nearDup(c.toDF, idCol, textCol, k, w, minJaccard,
          maxDocsPerFp),
        "winnow_dedup", textCol, idCol, k, w, minJaccard, maxDocsPerFp)

    /** BPE-tokenized table ([[Bpe.tokenize]]): trains `numMerges`
      * merges on this chain's `textCol` (one distributed word count +
      * a driver loop over the top-`maxWords` frequency table), then
      * tokenizes every row with the codegen'd encoder. */
    def bpeTokenize(textCol: String, idCol: String, numMerges: Int = 64,
                    maxWords: Int = 1 << 20): Chain = {
      val model = Bpe.trainOn(c.toDF, textCol, numMerges, maxWords)
      derive(Bpe.tokenize(c.toDF, idCol, textCol, model),
        "bpe_tokenize", textCol, idCol, numMerges, maxWords)
    }

    /** 1:N character chunking (see [[TextAnalysis.chunkText]]). */
    def chunkDocs(textCol: String, size: Int, overlap: Int = 0): Chain =
      derive(c.toDF
        .withColumn("__c", explode(TextAnalysis.chunkText(col(textCol), size, overlap)))
        .withColumn("chunk_idx", col("__c.chunk_idx"))
        .withColumn(textCol, col("__c.chunk"))
        .drop("__c"), "chunk_docs", textCol, size, overlap)

    /** Token-budget sequence packing (see [[Pack.byTokenBudget]]). */
    def packByTokens(tokenCol: String, orderCol: String, budget: Int,
                     shards: Int = 32): Chain =
      derive(Pack.byTokenBudget(c.toDF, tokenCol, orderCol, budget, shards),
        "pack_by_tokens", tokenCol, orderCol, budget, shards)

    /** Deterministic per-stratum cap (see [[Split.stratifiedSample]]). */
    def stratified(stratumCol: String, keyCol: String, perGroup: Int): Chain =
      derive(Split.stratifiedSample(c.toDF, stratumCol, keyCol, perGroup),
        "stratified", stratumCol, keyCol, perGroup)

    /** Exact per-group top-k via the native bounded-heap aggregate —
      * O(k) per group across the shuffle, no window sort (see
      * [[Corpus.topKPerGroup]]). */
    def topKBy(groupCol: String, score: Column, item: Column, k: Int): Chain =
      derive(Corpus.topKPerGroup(c.toDF, groupCol, score, item, k),
        "topk_by", groupCol, score, item, k)

    /** Attach `avg_logp`/`ppl` from a bigram LM trained on `reference`
      * and drop rows above `maxPpl` (CCNet-style quality filtering; see
      * [[Corpus.lmPerplexity]]). Rows too short to score (fewer than two
      * tokens → no bigrams) are KEPT with null `ppl`, consistent with
      * [[decontaminate]]'s keep-too-short rule — a quality filter should
      * not silently eat rows it could not measure. */
    def filterByPerplexity(reference: Chain, textCol: String, idCol: String,
                           maxPpl: Double): Chain = {
      val scores = Corpus.lmPerplexity(reference.toDF, c.toDF, idCol, textCol)
      derive(c.toDF.join(scores.select(col(idCol), col("avg_logp"), col("ppl")),
          Seq(idCol), "left_outer")
        .filter(col("ppl").isNull || col("ppl") <= maxPpl),
        "filter_by_perplexity", reference.hash, textCol, idCol, maxPpl)
    }

    /** Drop rows sharing any word `n`-gram with `benchmark` (GPT-3-style
      * decontamination; see [[Corpus.ngramDecontaminate]]). Rows too short
      * to have an n-gram are kept. */
    def decontaminate(benchmark: Chain, textCol: String, idCol: String,
                      n: Int = 13): Chain = {
      val bad = Corpus.ngramDecontaminate(c.toDF, benchmark.toDF,
          idCol, textCol, n)
        .filter(col("contaminated")).select(col(idCol))
      derive(c.toDF.join(bad, Seq(idCol), "left_anti"),
        "decontaminate", benchmark.hash, textCol, idCol, n)
    }

    /** Drop rows failing the Gopher quality rules (Rae et al. 2021; see
      * [[TextAnalysis.gopherSignals]]). */
    def gopherFilter(textCol: String): Chain =
      derive(TextAnalysis.gopherSignals(c.toDF, textCol)
        .filter(col("gopher_pass"))
        .drop("n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
          "ellipsis_frac", "alpha_frac", "stop_hits", "gopher_pass"),
        "gopher_filter", textCol)

    /** C4 line+page cleaning (Raffel et al. 2020; see
      * [[TextAnalysis.c4Clean]]): surviving docs with rebuilt text. */
    def c4Clean(idCol: String, textCol: String): Chain =
      derive(TextAnalysis.c4Clean(c.toDF, idCol, textCol),
        "c4_clean", idCol, textCol)

    /** Drop rows containing any blocklist pattern (one Aho–Corasick scan;
      * see [[TextAnalysis.blocklistFilter]]). */
    def blocklist(textCol: String, patterns: Seq[String]): Chain =
      derive(TextAnalysis.blocklistFilter(c.toDF, textCol, patterns),
        "blocklist", textCol, patterns)

    /** Token-budget "data recipe" mix (see [[Corpus.mixByTokenBudget]]):
      * fill each domain's token budget in deterministic md5 order. */
    def mixByTokenBudget(idCol: String, domainCol: String, tokensCol: String,
                         budgets: Map[String, Long], seed: String = "",
                         buckets: Int = 1 << 16): Chain =
      derive(Corpus.mixByTokenBudget(c.toDF, idCol, domainCol, tokensCol,
        budgets, seed, buckets), "mix_by_token_budget", idCol, domainCol,
        tokensCol, budgets, seed, buckets)

    /** Token-budget mix with whole-domain upsampling epochs (see
      * [[Corpus.mixByTokenBudgetEpochs]]); adds an `epoch` column. */
    def mixByTokenBudgetEpochs(idCol: String, domainCol: String,
                               tokensCol: String, budgets: Map[String, Long],
                               seed: String = "",
                               buckets: Int = 1 << 16): Chain =
      derive(Corpus.mixByTokenBudgetEpochs(c.toDF, idCol, domainCol,
        tokensCol, budgets, seed, buckets), "mix_by_token_budget_epochs",
        idCol, domainCol, tokensCol,
        budgets, seed, buckets)

    /** Deterministic weighted sample without replacement (see
      * [[Split.weightedSample]]). */
    def weightedSample(idCol: String, weightCol: String, n: Int,
                       seed: String = ""): Chain =
      derive(Split.weightedSample(c.toDF, idCol, weightCol, n, seed),
        "weighted_sample", idCol, weightCol, n, seed)

    /** Attach a BM25 relevance score against `queryTerms` and keep only
      * matching rows (see [[Corpus.bm25]]) — retrieval-targeted selection. */
    def bm25Select(idCol: String, textCol: String,
                   queryTerms: Seq[String]): Chain =
      derive(c.toDF.join(
        Corpus.bm25(c.toDF, idCol, textCol, queryTerms), Seq(idCol), "inner"),
        "bm25_select", idCol, textCol, queryTerms)

    /** Drop rows whose normalized content already appears in `history`
      * (bloom-prefiltered incremental dedup; see [[Dedup.subtractSeen]]). */
    def subtractSeen(history: Chain, textCol: String, idCol: String,
                     expectedItems: Long = 1000000L): Chain =
      derive(Dedup.subtractSeen(c.toDF, history.toDF, textCol, idCol,
        expectedItems),
        "subtract_seen", history.hash, textCol, idCol, expectedItems)

    /** Drop rows whose CDC chunks overlap `history` beyond
      * `maxSharedFrac` (chunk-level incremental dedup — catches
      * tail-edited re-crawls exact content keys miss; see
      * [[Dedup.subtractSeenChunks]]). */
    def subtractSeenChunks(history: Chain, textCol: String, idCol: String,
                           k: Int = 8, divisor: Long = 64,
                           maxSharedFrac: Double = 0.5): Chain =
      derive(Dedup.subtractSeenChunks(c.toDF, history.toDF, textCol, idCol,
        k, divisor, maxSharedFrac),
        "subtract_seen_chunks", history.hash, textCol, idCol, k, divisor,
        maxSharedFrac)

    /** Drop rows near-duplicating any `history` row (banded MinHash
      * new×history join + exact-Jaccard confirm; see
      * [[Dedup.subtractSeenNear]]). */
    def subtractSeenNear(history: Chain, textCol: String, idCol: String,
                         threshold: Double = 0.5): Chain =
      derive(Dedup.subtractSeenNear(c.toDF, history.toDF, textCol, idCol,
        threshold),
        "subtract_seen_near", history.hash, textCol, idCol, threshold)

    /** Drop rows whose duplicated-gram fraction is at or above `maxFrac`
      * (see [[Corpus.duplicatedGramFraction]]). Rows too short to have an
      * n-gram are unscored and KEPT — same keep-too-short rule as
      * [[decontaminate]] and [[filterByPerplexity]]. */
    def filterByDupFraction(textCol: String, idCol: String, maxFrac: Double,
                            n: Int = 13, minDocs: Int = 2): Chain = {
      val bad = Corpus.duplicatedGramFraction(c.toDF, idCol, textCol, n,
          minDocs)
        .filter(col("dup_fraction") >= maxFrac).select(col(idCol))
      derive(c.toDF.join(bad, Seq(idCol), "left_anti"),
        "filter_by_dup_fraction", textCol, idCol, maxFrac, n, minDocs)
    }

    /** Stamp the canonical URL (see [[TextAnalysis.canonicalUrl]]). */
    def withCanonicalUrl(urlCol: String,
                         outCol: String = "canonical_url"): Chain =
      c.mutate(outCol -> TextAnalysis.canonicalUrl(col(urlCol)))

    /** Keep one row (lowest id) per canonical URL. Note the collapse
      * risk: any tracking parameter stripped by the canonicalizer that is
      * actually meaningful on a given site merges distinct resources into
      * one key and DROPS rows — audit
      * [[TextAnalysis.defaultTrackingParams]] against your corpus (it
      * deliberately excludes `ref` for this reason). */
    def dedupByUrl(urlCol: String, idCol: String): Chain = {
      val canon = TextAnalysis.canonicalUrl(col(urlCol))
      val df = c.toDF.withColumn("__curl", canon)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__curl").orderBy(col(idCol).asc)
      derive(df.withColumn("__r", row_number().over(w))
        .filter(col("__r") === 1).drop("__curl", "__r"),
        "dedup_by_url", urlCol, idCol)
    }

    /** Per-group heavy-hitter n-grams (Misra–Gries; see
      * [[Corpus.heavyHitterPhrases]]). */
    def heavyHitters(textCol: String, groupCol: String, n: Int = 2,
                     capacity: Int = 4096, topK: Int = 5): Chain =
      derive(Corpus.heavyHitterPhrases(c.toDF, textCol, groupCol, n,
        capacity, topK),
        "heavy_hitters", textCol, groupCol, n, capacity, topK)

    /** Inverted index over this chain's documents (see
      * [[Corpus.invertedIndex]]). */
    def invertedIndex(idCol: String, textCol: String,
                      maxPostings: Int = 0): Chain =
      derive(Corpus.invertedIndex(c.toDF, idCol, textCol, maxPostings),
        "inverted_index", idCol, textCol, maxPostings)

    /** Fuse this ranking with others by reciprocal rank (see
      * [[Corpus.rrfFuse]]). */
    def rrfWith(others: Seq[Chain], idCol: String, scoreCol: String,
                kRrf: Int = 60): Chain =
      derive(Corpus.rrfFuse(c.toDF +: others.map(_.toDF), idCol, scoreCol,
        kRrf), "rrf_with",
        (others.map(_.hash) :+ idCol :+ scoreCol :+ kRrf.toString): _*)

    /** Cluster assignment over near-dup edges — size-adaptive min-label
      * CC with the star-contraction fallback (see
      * [[Dedup.connectedComponents]]). */
    def dupClusters(srcCol: String = "id_a", dstCol: String = "id_b"): Chain =
      derive(Dedup.connectedComponents(c.toDF, srcCol, dstCol),
        "dup_clusters", srcCol, dstCol)

    /** Connected components by large-star/small-star contraction — the
      * O(log² n)-round path for long-chain graphs (see
      * [[Dedup.connectedComponentsStar]]). */
    def dupClustersStar(srcCol: String = "id_a",
                        dstCol: String = "id_b"): Chain =
      derive(Dedup.connectedComponentsStar(c.toDF, srcCol, dstCol),
        "dup_clusters_star", srcCol, dstCol)

    /** Deterministic ±1 JL projection of an embedding column (see
      * [[Similarity.randomProjection]]). */
    def randomProjection(vecCol: String = "embedding", outDim: Int = 16,
                         outCol: String = "projected"): Chain =
      derive(Similarity.randomProjection(c.toDF, vecCol, outDim, outCol),
        "random_projection", vecCol, outDim, outCol)

    /** Per-group quantiles from the mergeable KLL sketch (see
      * [[graft.functions.GraftFunctions.kll_quantiles]]): one row per
      * group with an array of discrete lower quantiles. */
    def quantilesByGroup(valueCol: String, groupCol: String,
                         probs: Seq[Double], k: Int = 2048,
                         outCol: String = "quantiles"): Chain =
      derive(c.toDF.groupBy(col(groupCol))
        .agg(graft.functions.GraftFunctions
          .kll_quantiles(col(valueCol).cast("double"), probs, k).as(outCol)),
        "quantiles_by_group", valueCol, groupCol,
        probs, k, outCol)

    /** HLL-sketch overlap with another corpus on `itemCol` (see
      * [[Corpus.distinctOverlap]]): one row of |A|,|B|,|A∪B|,|A∩B|
      * estimates + Jaccard. */
    def overlapWith(other: Chain, itemCol: String, lgK: Int = 14): Chain =
      derive(Corpus.distinctOverlap(c.toDF, other.toDF, itemCol, lgK),
        "overlap_with", other.hash, itemCol, lgK)

    /** Skew-salted equi-join against a non-broadcastable dimension (see
      * [[Joins.saltedJoin]]). */
    def saltedJoin(dim: Chain, key: String, dimKey: String, buckets: Int,
                   how: String = "inner"): Chain =
      derive(Joins.saltedJoin(c.toDF, dim.toDF, key, dimKey, buckets, how),
        "salted_join", dim.hash, key, dimKey, buckets, how)

    /** Ordered-funnel completion per entity (see [[Sessions.funnel]]). */
    def funnel(keyCol: String, tsCol: String, typeCol: String,
               steps: Seq[String], maxGapSec: Option[Long] = None): Chain =
      derive(Sessions.funnel(c.toDF, keyCol, tsCol, typeCol, steps,
        maxGapSec),
        "funnel", keyCol, tsCol, typeCol, steps, maxGapSec)

    /** Weekly retention cohort matrix (see
      * [[Sessions.retentionCohorts]]). */
    def retention(keyCol: String, tsCol: String): Chain =
      derive(Sessions.retentionCohorts(c.toDF, keyCol, tsCol),
        "retention", keyCol, tsCol)

    /** Deterministic k-fold CV assignment (see [[Split.kFold]]). */
    def kFold(idCol: String, k: Int, seed: String = ""): Chain =
      derive(Split.kFold(c.toDF, idCol, k, seed),
        "k_fold", idCol, k, seed)

    /** Rolling N-day distinct entities from daily HLL sketches (see
      * [[Sessions.rollingDistinct]]). */
    def rollingDistinct(keyCol: String, tsCol: String, days: Int = 7): Chain =
      derive(Sessions.rollingDistinct(c.toDF, keyCol, tsCol, days),
        "rolling_distinct", keyCol, tsCol, days)

    /** Column drift vs an earlier snapshot (see [[Profile.drift]]). */
    def driftFrom(before: Chain, relTol: Double = 0.1): Chain =
      derive(Profile.drift(before.toDF, c.toDF, relTol),
        "drift_from", before.hash, relTol)

    /** Interval-overlap join against `other` (see
      * [[Joins.intervalOverlapJoin]]): binned equi-join, exact overlap
      * filter, canonical-bin dedup — never a cross join. */
    def overlapJoin(other: Chain, lo: String, hi: String,
                    otherLo: String, otherHi: String, binWidth: Double,
                    keyCols: Seq[(String, String)] = Nil): Chain =
      derive(Joins.intervalOverlapJoin(c.toDF, lo, hi, other.toDF,
        otherLo, otherHi, binWidth, keyCols),
        "overlap_join", other.hash, lo, hi, otherLo, otherHi, binWidth,
        keyCols)

    /** Codec-free container metadata for (id, payload) media rows:
      * MP4 box walk / Matroska EBML walk dispatched on magic bytes
      * (see [[Multimodal.videoHeaderMeta]]). */
    def videoMeta(): Chain =
      derive(Multimodal.videoHeaderMeta(c.toDF), "video_meta")

    /** MP3 first-frame metadata + CBR duration estimate
      * (see [[Multimodal.audioFrameMeta]]). */
    def audioMeta(): Chain =
      derive(Multimodal.audioFrameMeta(c.toDF), "audio_meta")

    /** Nearest neighbors of `queries` against this chain's vector
      * column, dispatching across the compression tiers:
      * `"brute"` (exact cosine), `"hamming"` (32× sign bits + rerank),
      * `"sq8"` (4× scalar quantization + rerank), `"pq"` (32× product
      * quantization + ADC + rerank, codebook trained here). Each tier's
      * scale shape and exactness contract is documented on its
      * [[Similarity]] method. */
    def nearestNeighbors(queries: Chain, k: Int, method: String = "brute",
                         vecCol: String = "embedding",
                         idCol: String = "vec_id",
                         queryIdCol: String = "query_id"): Chain = {
      val corpus = c.toDF
      derive(method match {
        case "brute" =>
          Similarity.bruteForceTopK(corpus, queries.toDF, k, vecCol, idCol,
            queryIdCol)
        case "hamming" =>
          Similarity.hammingRerankTopK(corpus, queries.toDF, k,
            vecCol = vecCol, idCol = idCol, queryIdCol = queryIdCol)
        case "sq8" =>
          Similarity.sq8RerankTopK(corpus, queries.toDF, k,
            vecCol = vecCol, idCol = idCol, queryIdCol = queryIdCol)
        case "pq" =>
          val cb = Similarity.pqTrain(corpus, m = 8, kc = 16,
            iterations = 1, vecCol = vecCol, idCol = idCol)
          Similarity.pqRerankTopK(corpus, queries.toDF, k, cb,
            vecCol = vecCol, idCol = idCol, queryIdCol = queryIdCol)
        case other => throw new IllegalArgumentException(
          s"unknown ANN method '$other' (brute/hamming/sq8/pq)")
      }, "nearest_neighbors", queries.hash, k, method, vecCol, idCol,
        queryIdCol)
    }
  }
}
