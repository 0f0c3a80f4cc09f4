package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/**
 * Deduplication operators for training-data pipelines, each designed around
 * its shuffle shape at 100 TB:
 *
 *  - exact:      one hash-partitioned aggregation on a 64/128-bit content
 *                hash (never shuffles the text itself — only (hash, id)).
 *  - minhashLSH: shingle → k minhashes → b bands; candidate pairs come from
 *                a groupBy on (band, band-hash) — i.e. only near-duplicates
 *                ever meet, the classic MMDS ch.3 scheme. No O(n²) join.
 *  - simhash:    64-bit fingerprint; near-dup = hamming ≤ r; banded by
 *                16-bit chunks for the candidate join.
 *  - ngramJaccard: verification kernel on candidate pairs (exact Jaccard on
 *                character shingle sets).
 *  - embedding:  cosine near-dup via random-hyperplane LSH buckets, with
 *                exact cosine verification inside each bucket.
 */
object Dedup {

  /** Normalized 64-bit content key used by exact dedup. */
  def contentKey(text: Column): Column = TextAnalysis.fingerprint64(text)

  /**
   * Exact dedup: keep one representative row (min of `idCol`) per distinct
   * normalized-content hash, annotated with the group's `dup_count`.
   * Single shuffle on the 8-byte hash.
   */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keyed = df.withColumn("__ck", contentKey(col(textCol)))
    val reps = keyed.groupBy(col("__ck"))
      .agg(min(col(idCol)).as("__keep"), count(lit(1)).as("dup_count"))
      .withColumnRenamed("__ck", "__rk")
    // null-SAFE join: null-text rows hash to a null key, which a plain
    // equi-join would never match — every null-text row silently
    // vanished instead of its group keeping a representative (the one
    // group exactDupGroups does report)
    keyed.join(reps, col("__ck") <=> col("__rk"))
      .filter(col(idCol) === col("__keep"))
      .drop("__ck", "__rk", "__keep")
  }

  /** Exact-dup groups only (hash, representative id, count>1). */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(contentKey(col(textCol)).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /**
   * Word shingles → k minhash values. Minhash_i = min over shingles of
   * sipHash64(shingle XOR seed_i) — all inside Catalyst (transform +
   * array_min over the shingle array), no UDF.
   */
  def minhashSignature(text: Column, k: Int, shingleWords: Int = 3): Column =
    // Codegen'd single-pass kernel: tokenize → distinct w-shingles →
    // sipHash64 once per shingle → k running minima of intHash64(h ^ seed).
    // The equivalent Catalyst HOF composition (transform/aggregate/zip_with)
    // runs interpreted and re-allocates per element — measured 60× slower.
    graft.functions.GraftFunctions.minhash_signature(text, k, shingleWords)

  /**
   * MinHash LSH near-dup candidate pairs: k minhashes split into `bands`
   * bands of k/bands rows; docs sharing any band bucket become a candidate
   * pair. Returns (id_a, id_b) with id_a < id_b, distinct. The only shuffle
   * partitions on (band index, band hash) — skew-safe for ordinary corpora
   * and O(candidates), never O(n²).
   */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        k: Int = 64, bands: Int = 16,
                        maxBucketSize: Int = 10000): DataFrame = {
    // The banded frame feeds the skew guard AND both sides of the
    // candidate self-join — four consumers of the same subtree. Without a
    // cache each consumer re-shingles and re-hashes the full corpus (the
    // dominant cost); the cached frame is only (id, band, hash) rows,
    // orders of magnitude smaller than the text. LRU-evictable.
    val banded = bandedMinhash(df, textCol, idCol, k, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Skew guard: a degenerate bucket (e.g. millions of identical boiler-
    // plate docs sharing a band hash) would make the self-join quadratic.
    // Buckets above the cap are dropped — their members are by construction
    // near-identical and are caught by exact dedup far more cheaply.
    val guarded = capBuckets(banded, Seq("__band", "__bh"), maxBucketSize)
    val l = guarded.alias("a")
    val r = guarded.alias("b")
    l.join(r, col("a.__band") === col("b.__band") &&
        col("a.__bh") === col("b.__bh") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
  }

  /** (id, band, band-hash) rows: k minhashes split into `bands` bands of
    * k/bands rows, each band collapsed to one sip_hash_64 bucket key. The
    * common candidate-generation input for the self-join
    * ([[minhashCandidates]]) and the two-sided history join
    * ([[subtractSeenNear]]). */
  private def bandedMinhash(df: DataFrame, textCol: String, idCol: String,
                            k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    df.select(col(idCol).as("__id"),
        minhashSignature(col(textCol), k).as("__sig"))
      .select(col("__id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          sip_hash_64(concat_ws(",",
            slice(col("__sig"), b * rows + 1, lit(rows)))))).as(Seq("__band", "__bh")))
  }

  /** Drop rows belonging to join buckets larger than `cap` (quadratic-blowup
    * guard for LSH self-joins). Map-side partial counts keep this cheap. */
  private def capBuckets(df: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    if (cap <= 0) return df
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__bucket_n"))
    df.join(counts.filter(col("__bucket_n") <= cap).drop("__bucket_n"), keys)
  }

  /**
   * Full MinHash-LSH dedup: candidates verified by exact n-gram Jaccard ≥
   * threshold; returns rows of (id_a, id_b, jaccard) — the edges of the
   * duplicate graph. (Connected components / keep-one is a separate pass.)
   */
  /**
   * @param shingleCandidatesOnly scope of the verification shingle pass.
   *   `false` (default): shingle the whole corpus — the gram stage is
   *   independent of the LSH stages, so the scheduler overlaps them on
   *   idle cores (fastest when a large fraction of docs appear in some
   *   candidate pair, as in dedup-heavy corpora). `true`: semi-join the
   *   corpus to candidate-pair members first, so verification cost scales
   *   with |candidates| rather than |corpus| — the right plan when
   *   candidates are a small fraction (a web-scale corpus where ~1% of
   *   docs have a near-dup): shingling a 3 KB doc allocates thousands of
   *   strings, and paying that for the 99% that never meet a candidate
   *   dominates the whole job. The cost is a serialized DAG (grams wait
   *   on the LSH self-join).
   */
  def minhashDedupEdges(df: DataFrame, textCol: String, idCol: String,
                        threshold: Double, k: Int = 64, bands: Int = 16,
                        ngram: Int = 5,
                        shingleCandidatesOnly: Boolean = false): DataFrame = {
    // With shingleCandidatesOnly the pairs feed TWO consumers (the
    // member-id semi-join and the verification join chain) — persist so the
    // LSH self-join runs once; pairs are two longs, negligible storage.
    // Otherwise the join chain is the single consumer and a persist would
    // only add a materialization barrier.
    val cands0 = minhashCandidates(df, textCol, idCol, k, bands)
    val cands =
      if (shingleCandidatesOnly)
        cands0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else cands0
    val gramSource =
      if (shingleCandidatesOnly) {
        val members = cands.select(col("id_a").as("__gid"))
          .unionByName(cands.select(col("id_b").as("__gid"))).distinct()
        df.join(members, col(idCol) === col("__gid"), "left_semi")
      } else df
    // Both candidate sides need the shingle arrays — cache so the n-gram
    // kernel runs once per doc, not once per join side.
    val grams = gramSource
      .select(col(idCol).as("__gid"),
        TextAnalysis.charNgrams(col(textCol), ngram).as("__grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cands
      .join(grams.withColumnRenamed("__gid", "id_a")
        .withColumnRenamed("__grams", "__ga"), "id_a")
      .join(grams.withColumnRenamed("__gid", "id_b")
        .withColumnRenamed("__grams", "__gb"), "id_b")
      .withColumn("jaccard", ngramJaccardArrays(col("__ga"), col("__gb")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /**
   * SimHash near-dup edges verified by exact char-n-gram Jaccard ≥
   * `threshold` — simhash is the cheap banded candidate generator, exact
   * Jaccard the verifier (same verify-after-LSH shape as
   * [[minhashDedupEdges]], so both families emit comparable
   * (id_a, id_b, jaccard) edges). Candidates stay O(|bucket pairs|); the
   * gram join only ever touches candidate members.
   */
  def simhashDedupEdges(df: DataFrame, textCol: String, idCol: String,
                        maxHamming: Int = 8, threshold: Double = 0.5,
                        ngram: Int = 5, shingle: Int = 0): DataFrame = {
    val cands = simhashNearDups(df, textCol, idCol, maxHamming, shingle)
      .select("id_a", "id_b")
    // verification grams: only candidate members need shingling
    val members = cands.select(col("id_a").as("__gid"))
      .unionByName(cands.select(col("id_b").as("__gid"))).distinct()
    val grams = df.join(members, col(idCol) === col("__gid"), "left_semi")
      .select(col(idCol).as("__gid"),
        TextAnalysis.charNgrams(col(textCol), ngram).as("__grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cands
      .join(grams.withColumnRenamed("__gid", "id_a")
        .withColumnRenamed("__grams", "__ga"), "id_a")
      .join(grams.withColumnRenamed("__gid", "id_b")
        .withColumnRenamed("__grams", "__gb"), "id_b")
      .withColumn("jaccard", ngramJaccardArrays(col("__ga"), col("__gb")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact Jaccard between two shingle-set array columns (Catalyst-only). */
  def ngramJaccardArrays(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  /** Exact char-n-gram Jaccard similarity between two text columns. */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column =
    ngramJaccardArrays(TextAnalysis.charNgrams(a, n), TextAnalysis.charNgrams(b, n))

  /** SimHash near-dup candidate pairs: the 64-bit simhash is split into
    * `maxHamming + 1` bands (pigeonhole: a pair within the hamming budget
    * has at least one band with zero differing bits, so banded equality
    * GUARANTEES recall — no probabilistic miss); candidates are then
    * verified with the exact popcount. Larger budgets mean narrower bands
    * and coarser buckets — for web-scale corpora with large `maxHamming`,
    * the block-combination scheme of Manku et al. (WWW'07) trades more
    * tables for finer keys, built from these same primitives. */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      maxHamming: Int = 3, shingle: Int = 0): DataFrame = {
    val nBands = math.min(maxHamming + 1, 64)
    val fp = if (shingle > 0) sim_hash_64_shingles(col(textCol), shingle)
             else sim_hash_64(col(textCol))
    val sh = df.select(col(idCol).as("__id"), fp.as("__sh"))
    val bandCols = (0 until nBands).map { i =>
      val lo = i * 64 / nBands
      val width = (i + 1) * 64 / nBands - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      shiftright(col("__sh"), lo).bitwiseAND(lit(mask))
    }
    // both self-join sides reuse the banded fingerprints — cache so the
    // simhash kernel runs once per doc (rows are just (id, hash, band))
    val banded = sh.select(col("__id"), col("__sh"),
      posexplode(array(bandCols: _*)).as(Seq("__band", "__bh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = banded.alias("a")
    val r = banded.alias("b")
    // popcount BEFORE distinct: the filter runs inside the join's codegen
    // stage and drops the overwhelming share of candidate rows map-side, so
    // the dedup shuffle only carries true near-matches — ordering it the
    // other way makes the distinct the job's bottleneck (measured 20×).
    l.join(r, col("a.__band") === col("b.__band") &&
        col("a.__bh") === col("b.__bh") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        bit_hamming_distance(col("a.__sh"), col("b.__sh")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /**
   * Embedding cosine near-dup edges via random-hyperplane LSH:
   * `planes` sign bits (dot with pseudo-random hyperplanes derived from
   * int_hash_64 — deterministic, no RNG state to ship) form a bucket key;
   * pairs sharing a bucket are verified with cosine ≥ threshold.
   * The threshold applies to the 6-dp ROUNDED cosine — intentionally:
   * re-runs, cluster sizes, and the DuckDB oracle must make the SAME
   * keep/drop decision, and raw float summation differs across engines
   * by ulps exactly at a boundary. The decision boundary shifts by at
   * most 5e-7 — immaterial for a similarity heuristic; determinism at
   * 100 TB is not.
   */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
                        threshold: Double, planes: Int = 16): DataFrame = {
    // hyperplane signs are higher-order-function expressions (interpreted);
    // cache so they evaluate once per vector, not once per join side
    val withKey = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__bucket", hyperplaneBucket(col("__v"), planes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = withKey.alias("a")
    val r = withKey.alias("b")
    l.join(r, col("a.__bucket") === col("b.__bucket") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        round(lit(1.0) - cosine_distance(col("a.__v"), col("b.__v")), 6)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /**
   * Incremental exact dedup against already-ingested history: keep only the
   * rows of `newDf` whose normalized content does not appear in `history`.
   * This is the daily-crawl-against-100 TB-corpus shape — the history CANNOT
   * be joined wholesale, so it collapses to a broadcast Bloom filter over
   * 8-byte content keys (built distributed via `stat.bloomFilter`'s
   * treeAggregate) and the filter splits the new batch map-side:
   * definite-new rows (bloom miss — the vast majority of a real crawl) pass
   * WITHOUT ANY JOIN; probable duplicates go through an exact anti-join
   * confirmation against the history keys. `fpp` therefore tunes only how
   * many rows take the join path — the ANSWER is always exact (false
   * positives are resolved by the join; Bloom false negatives don't exist).
   *
   * Sizing: n=10⁹ history docs at fpp=0.01 is a ~1.1 GB broadcast — fine on
   * executor memory; beyond that, shard the filter by key range (one bloom
   * per shard, probe the matching shard). The confirmation join ships only
   * (key, id) pairs, never text.
   */
  def subtractSeen(newDf: DataFrame, history: DataFrame, textCol: String,
                   idCol: String, expectedItems: Long = 1000000L,
                   fpp: Double = 0.01): DataFrame = {
    val keyed = newDf.withColumn("__k", contentKey(col(textCol)))
    val histKeys = history.select(contentKey(col(textCol)).as("__k"))
    // empty history: everything is new (and Spark's bloom aggregate
    // returns null for zero rows, which readFrom would NPE on)
    if (histKeys.isEmpty) return newDf
    val bloomBytes = {
      val bf = histKeys.stat.bloomFilter("__k", math.max(expectedItems, 1L), fpp)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val might = graft.functions.GraftFunctions.bloom_might_contain(col("__k"), bloomBytes)
    // a null text row hashes to a null key: bloom_might_contain(null)
    // is null, which fails BOTH branches' filters — the row would be
    // silently deleted. It can never equal any history content (and the
    // confirmation anti-join would keep it anyway), so it is definite-new.
    val definiteNew = keyed.filter(might.isNull || !might)
    val confirmedNew = keyed.filter(might)
      .join(histKeys.distinct(), Seq("__k"), "left_anti")
    definiteNew.unionByName(confirmedNew)
      .select(newDf.columns.map(col): _*)
  }

  /**
   * CHUNK-level incremental dedup — [[subtractSeen]]'s content-defined
   * companion: drop rows of `newDf` whose CDC chunks ([[Cdc]], same
   * kernel and parameters both sides) overlap the accumulated `history`
   * beyond `maxSharedFrac` (the fraction of the new doc's chunk
   * occurrences whose exact text appears anywhere in history). Where
   * [[subtractSeen]] only catches byte-identical normalized content,
   * the chunk key catches a re-crawled page whose tail or any bounded
   * region was edited: boundaries are content-local, so every untouched
   * chunk still matches verbatim.
   *
   * Scale shape: each side runs the chunking kernel exactly ONCE (the
   * same one-Generate discipline the q_cdc_chunks plan pins): history
   * chunks dedupe to a distinct chunk table, the batch's chunk frame
   * LEFT-joins it carrying a hit marker, and one grouped pass computes
   * total and shared counts together — a plain equi-join on the chunk
   * key, never an all-pairs. Zero-chunk rows (empty text) are kept: a
   * dedup filter should not eat rows it could not measure.
   */
  def subtractSeenChunks(newDf: DataFrame, history: DataFrame,
                         textCol: String, idCol: String, k: Int = 8,
                         divisor: Long = 64,
                         maxSharedFrac: Double = 0.5): DataFrame =
    subtractSeenChunksPre(newDf,
      chunkTable(history, textCol, idCol, k, divisor),
      textCol, idCol, k, divisor, maxSharedFrac)

  /** The distinct history chunk table [[subtractSeenChunks]] probes.
    * Precompute (and persist) it ONCE for streaming `foreachBatch` use
    * — rebuilding it inside the batch function would re-chunk the whole
    * accumulated corpus on every trigger. */
  def chunkTable(history: DataFrame, textCol: String, idCol: String,
                 k: Int = 8, divisor: Long = 64): DataFrame =
    Cdc.cdcChunks(history.select(col(idCol), col(textCol)), idCol,
        textCol, k, divisor)
      .select(col("chunk")).distinct()

  /** [[subtractSeenChunks]] against a PRECOMPUTED history chunk table
    * (as built by [[chunkTable]] — same k/divisor, or the chunk keys
    * won't align). */
  def subtractSeenChunksPre(newDf: DataFrame, histChunks: DataFrame,
                            textCol: String, idCol: String, k: Int,
                            divisor: Long,
                            maxSharedFrac: Double): DataFrame = {
    val newChunks = Cdc.cdcChunks(
      newDf.select(col(idCol), col(textCol)), idCol, textCol, k, divisor)
    val marked = histChunks.select(col("chunk")).withColumn("__hit", lit(1))
    val stats = newChunks
      .join(marked, Seq("chunk"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("__total"), count(col("__hit")).as("__shared"))
    // zero-chunk rows never reach the grouped stats — the left join's
    // null __total keeps them without a second pass over the chunk frame
    newDf.join(stats, Seq(idCol), "left")
      .filter(col("__total").isNull ||
        col("__shared") <= col("__total") * lit(maxSharedFrac))
      .select(newDf.columns.map(col): _*)
  }

  /**
   * Incremental NEAR-dup filter — the continuous-crawl companion to
   * [[subtractSeen]]: drop rows of `newDf` whose text is a near-duplicate
   * (exact char-n-gram Jaccard ≥ `threshold`; exact copies score 1.0 and
   * are dropped too) of ANY row in the accumulated `history` corpus.
   * Returns the surviving `newDf` rows, schema unchanged.
   *
   * Scale shape: both sides band their MinHash signatures
   * ([[bandedMinhash]]) and candidates come from a new×history join on
   * (band, bucket) — never a self-join, never all-pairs, and the daily
   * batch side is tiny next to the history. The history side is
   * bucket-capped ([[capBuckets]]): a boilerplate bucket with millions of
   * accumulated members would make the join quadratic, and its near-
   * identical members are [[subtractSeen]]'s (exact, bloom-routed) job
   * anyway. With `shingleCandidatesOnly` (the default) verification
   * shingles ONLY candidate members on each side (semi-join first — the
   * web-scale trade from [[minhashDedupEdges]], the right default here
   * because history is unbounded); flip it to false when candidates are a
   * large fraction of both sides (a dedup-heavy batch at modest scale),
   * which saves the two member semi-join stages by shingling outright.
   * In steady production the history bands would be precomputed once at
   * ingest and stored ([[minhashSignature]] is deterministic), making the
   * incremental cost O(batch + candidates).
   */
  def subtractSeenNear(newDf: DataFrame, history: DataFrame, textCol: String,
                       idCol: String, threshold: Double = 0.5,
                       k: Int = 64, bands: Int = 16, ngram: Int = 5,
                       maxBucketSize: Int = 10000,
                       shingleCandidatesOnly: Boolean = true): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val nb = bandedMinhash(newDf, textCol, idCol, k, bands)
    // capBuckets consumes its input twice (bucket counts + the capped
    // join), which re-ran the k-hash signature kernel over the ENTIRE
    // history text — the dominant cost on the unbounded side. Persist
    // the banded rows ((id, band, bh) longs — orders of magnitude
    // smaller than the text), as minhashCandidates already does;
    // LRU-evictable, released by the ContextCleaner.
    val hb = capBuckets(
      bandedMinhash(history, textCol, idCol, k, bands)
        .persist(MEMORY_AND_DISK),
      Seq("__band", "__bh"), maxBucketSize)
    // with candidate-scoped shingling the pairs feed three consumers (two
    // member semi-joins + the verification join) — persist the id pairs,
    // which are two longs per row; otherwise the verification join is the
    // single consumer and a persist would only add a barrier
    val cands0 = nb.alias("n").join(hb.alias("h"),
        col("n.__band") === col("h.__band") && col("n.__bh") === col("h.__bh"))
      .select(col("n.__id").as("__nid"), col("h.__id").as("__hid"))
      .distinct()
    val cands =
      if (shingleCandidatesOnly) cands0.persist(MEMORY_AND_DISK) else cands0
    def gramsOf(df: DataFrame, member: Column, out: String) = {
      val scoped =
        if (shingleCandidatesOnly)
          df.join(cands.select(member.as("__gid")).distinct(),
            col(idCol) === col("__gid"), "left_semi")
        else df
      scoped.select(col(idCol).as("__gid"),
        TextAnalysis.charNgrams(col(textCol), ngram).as(out))
    }
    val dup = cands
      .join(gramsOf(newDf, col("__nid"), "__ga")
        .withColumnRenamed("__gid", "__nid"), "__nid")
      .join(gramsOf(history, col("__hid"), "__gb")
        .withColumnRenamed("__gid", "__hid"), "__hid")
      .filter(ngramJaccardArrays(col("__ga"), col("__gb")) >= threshold)
      .select(col("__nid")).distinct()
    newDf.join(dup, col(idCol) === col("__nid"), "left_anti")
  }

  /**
   * Fuzzy (similarity) join — the record-linkage primitive: match rows of
   * two DIFFERENT tables whose text columns are near-duplicates (n-gram
   * Jaccard ≥ `threshold`), returning `(left_id, right_id, similarity)`
   * pairs. The cross-source cousin of [[minhashDedupEdges]] (self-join)
   * and [[subtractSeenNear]] (which keeps only the anti-join): use it to
   * link a scraped metadata catalog to a curated one, align near-identical
   * docs across two crawls, or build cross-source dedup edges.
   *
   * Scale shape: identical to the incremental near-dedup — banded MinHash
   * signatures on BOTH sides, candidates from the band-bucket equi-join
   * (hashes cross the exchange, never text; `maxBucketSize` caps
   * degenerate buckets on each side), then exact n-gram Jaccard verifies
   * only candidate pairs, shingling semi-join-scoped to candidate members.
   * Never a cross join at any size; cost scales with true-match density,
   * not |left|×|right|.
   */
  def fuzzyJoin(left: DataFrame, leftText: String, leftId: String,
                right: DataFrame, rightText: String, rightId: String,
                threshold: Double = 0.5, k: Int = 64, bands: Int = 16,
                ngram: Int = 5, maxBucketSize: Int = 10000): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // persist both banded frames: capBuckets reads each twice (bucket
    // counts + capped join), which would re-run the signature kernel
    // over both corpora — the banded rows are three longs each
    val lb = capBuckets(
      bandedMinhash(left, leftText, leftId, k, bands)
        .persist(MEMORY_AND_DISK),
      Seq("__band", "__bh"), maxBucketSize)
    val rb = capBuckets(
      bandedMinhash(right, rightText, rightId, k, bands)
        .persist(MEMORY_AND_DISK),
      Seq("__band", "__bh"), maxBucketSize)
    // the pair set feeds both member semi-joins and the verification join
    // cached: the pair set feeds three consumers below; released by the
    // ContextCleaner once the returned frame is dropped
    val cands = lb.alias("l").join(rb.alias("r"),
        col("l.__band") === col("r.__band") && col("l.__bh") === col("r.__bh"))
      .select(col("l.__id").as("__lid"), col("r.__id").as("__rid"))
      .distinct()
      .persist(MEMORY_AND_DISK)
    def gramsOf(df: DataFrame, textCol: String, idCol: String,
                member: Column, out: String) =
      df.join(cands.select(member.as("__gid")).distinct(),
          col(idCol) === col("__gid"), "left_semi")
        .select(col(idCol).as("__gid"),
          TextAnalysis.charNgrams(col(textCol), ngram).as(out))
    cands
      .join(gramsOf(left, leftText, leftId, col("__lid"), "__ga")
        .withColumnRenamed("__gid", "__lid"), "__lid")
      .join(gramsOf(right, rightText, rightId, col("__rid"), "__gb")
        .withColumnRenamed("__gid", "__rid"), "__rid")
      .select(col("__lid").as("left_id"), col("__rid").as("right_id"),
        ngramJaccardArrays(col("__ga"), col("__gb")).as("__raw"))
      // threshold on the EXACT Jaccard (a 0.4999996 must not round up
      // past 0.5 — the documented contract and the oracle's join);
      // round only the reported value, as minhashDedupEdges does
      .filter(col("__raw") >= threshold)
      .select(col("left_id"), col("right_id"),
        round(col("__raw"), 6).as("similarity"))
  }

  /**
   * SemDeDup-style semantic deduplication (Abbas et al. 2023): assign every
   * embedding to its nearest anchor by cosine (ties: lower anchor id), then
   * within each cluster drop any vector whose cosine similarity to an
   * EARLIER-id member of the same cluster is ≥ `threshold` — the earliest
   * member of each semantic near-dup set survives. Anchors are supplied by
   * the caller (the paper uses k-means centroids; any deterministic anchor
   * set — e.g. a fixed sample, or [[graft.ops.Similarity.ivfBuild]]
   * centroids — works and keeps the op reproducible).
   *
   * Note this is "similar to ANY earlier member", not the greedy
   * keep-set-only chain — the chained variant is order-sequential and
   * cannot run data-parallel; at SemDeDup's operating thresholds
   * (cos ≥ ~0.95) the two differ only on chains of borderline pairs.
   *
   * Output: (id, cluster, kept) for every input vector.
   *
   * Scale shape: the anchor table broadcasts (k anchors ≪ corpus), so
   * assignment is one map-side pass with a per-row top-1 (WindowGroupLimit
   * keeps it streaming). The intra-cluster pair join shuffles on cluster id
   * once; all-pairs-within-cluster is the published SemDeDup shape — k is
   * chosen so clusters run ~10^4-10^5 vectors, bounding each partition's
   * pair work. `clusterCap` guards degenerate clusterings (one anchor
   * absorbing the corpus — e.g. a collapsed k-means init): clusters larger
   * than the cap are excluded from the pair join entirely (same
   * [[capBuckets]] mechanism as [[minhashCandidates]]), so their members
   * come back `kept = true` un-deduped instead of going quadratic. The cap
   * trades recall for a hard bound on per-cluster pair work — at the
   * default 100k the pair kernel is ≤5·10^9 comparisons per cluster, the
   * published SemDeDup operating point. `clusterCap <= 0` disables the
   * guard (exact small-data mode).
   */
  def semanticDedup(vecs: DataFrame, idCol: String, vecCol: String,
                    anchors: DataFrame, anchorIdCol: String,
                    anchorVecCol: String, threshold: Double,
                    clusterCap: Int = 100000,
                    cache: Boolean = true): DataFrame = {
    val a = broadcast(anchors.select(col(anchorIdCol).as("__aid"),
      col(anchorVecCol).as("__av")))
    val sim = lit(1.0) - cosine_distance(col(vecCol), col("__av"))
    // Arg-max by map-side min_by (the [[graft.ops.Similarity]] kmeans
    // assignment pattern): the K-replicated scored rows partial-aggregate
    // inside the scan task, so the exchange carries ONE row per document
    // — not corpus×K rows each dragging a vector through a window sort.
    // min over (−sim, aid) = highest similarity, ties to the lowest
    // anchor id, matching the previous row_number ordering. A null sim
    // (null/empty anchor vector) would sort FIRST in ascending struct
    // order and claim every document — coalesce it to +∞ so such
    // anchors lose to any real score (row_number(desc) put nulls last).
    val assigned0 = vecs.select(col(idCol).as("__id"), col(vecCol))
      .crossJoin(a)
      .groupBy(col("__id"))
      .agg(
        min_by(col("__aid"), struct(
          coalesce(lit(0.0) - sim, lit(Double.MaxValue)).as("__ns"),
          col("__aid"))).as("cluster"),
        first(col(vecCol)).as("__v"))
      .select(col("__id"), col("__v"), col("cluster"))
    // the assignment feeds both pair-join sides AND the final output —
    // persist so the k-way cross join runs once, not three times
    // (cache=false keeps the raw plan visible for the PlanSpec shape pins)
    val assigned = if (cache)
      assigned0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else assigned0
    // Pair join runs on the capped frame only; the final output join below
    // still uses the full assignment, so over-cap clusters surface with
    // kept = true rather than vanishing.
    val paired = capBuckets(assigned, Seq("cluster"), clusterCap)
    val l = paired.alias("a")
    val r = paired.alias("b")
    val dropped = l.join(r, col("a.cluster") === col("b.cluster") &&
        col("a.__id") < col("b.__id") &&
        lit(1.0) - cosine_distance(col("a.__v"), col("b.__v")) >= threshold)
      .select(col("b.__id").as("__id")).distinct()
      .withColumn("__drop", lit(true))
    assigned.join(dropped, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("cluster"),
        coalesce(col("__drop"), lit(false)).unary_!.as("kept"))
  }

  /**
   * Connected components over a duplicate-edge list — turns pairwise
   * near-dup edges (from [[minhashDedupEdges]] / [[simhashNearDups]] /
   * [[embeddingNearDups]]) into cluster assignments `(id, cluster_id)`,
   * cluster_id = min id reachable in the undirected dup graph. "Keep one
   * per cluster" then = `filter(id === cluster_id)`.
   *
   * Algorithm: iterative min-label propagation — each round every node
   * adopts the minimum label among itself and its neighbors; converges in
   * O(graph diameter) rounds. Each round is one shuffle (join + groupBy on
   * node id); `localCheckpoint` truncates the growing lineage so round N
   * doesn't replay rounds 1..N-1. Duplicate clusters are near-cliques
   * (diameter ~2-3), so this settles in a handful of rounds even at 100 TB;
   * for adversarial long-chain graphs, use [[connectedComponentsStar]]
   * (large-star/small-star, O(log² n) rounds on any diameter). If the
   * label loop is still moving at `maxIter` — the signature of exactly
   * such a graph — it hands off to the star contraction rather than
   * return silently mis-clustered partial labels.
   */
  /** Rounds the last [[connectedComponents]] call took (diagnostics). */
  @volatile var lastRounds: Int = 0

  def connectedComponents(edges: DataFrame, srcCol: String = "id_a",
                          dstCol: String = "id_b",
                          maxIter: Int = 25,
                          localEdgeThreshold: Long = 2000000L): DataFrame = {
    // Symmetrize in ONE pass over the edge list (explode to both
    // directions) — a self-union would evaluate the upstream edge
    // computation (often an expensive similarity join) twice.
    val sym = edges.select(explode(array(
        struct(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst")),
        struct(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst"))))
        .as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      // a null endpoint (null id, or a non-ANSI cast that nulled) is not
      // a node: the local path would NPE on it, and the distributed
      // joins would neither propagate labels through it nor stop it
      // emitting a phantom (id=null) row — drop the edge up front, the
      // same contract as connectedComponentsStar
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().persist()
    // Size-adaptive plan: below the threshold, union-find on the driver
    // beats distributed label propagation by an order of magnitude — each
    // distributed round costs 2-3 jobs of fixed scheduling latency, while
    // 2M (long, long) edges are ~32 MB and union-find is near-linear.
    // Above it, fall through to the iterative joins (the 100 TB path).
    // The count reads the persisted symmetrized edges, which every
    // downstream round needs anyway.
    val nEdges = sym.count()
    if (nEdges <= localEdgeThreshold) {
      val spark = edges.sparkSession
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      val seen = scala.collection.mutable.LongMap.empty[Unit]
      sym.select(col("src"), col("dst")).collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        seen(a) = (); seen(b) = ()
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // min-label union keeps cluster_id = min reachable id
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val out = seen.keys.toSeq.map(id => (id, find(id)))
      lastRounds = 0
      sym.unpersist()
      import spark.implicits._
      return out.toDF("id", "cluster_id")
    }
    // Round 0 folded into initialization: label = min(id, neighbors).
    // Dup clusters are near-cliques, so this alone usually converges and
    // the loop's first pass just confirms (changed = 0).
    var labels = sym.groupBy(col("src").as("id"))
      .agg(least(first(col("src")), min(col("dst"))).as("label"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nmin"))
      // Convergence count rides the checkpoint job via Observation — one
      // Spark job per round, not two.
      val obs = org.apache.spark.sql.Observation()
      val next = labels.join(neighborMin, labels("id") === neighborMin("src"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (col("nmin") < col("label")).as("__moved"))
        .observe(obs, sum(when(col("__moved"), 1L).otherwise(0L)).as("changed"))
        .drop("__moved")
        .localCheckpoint()
      changed = Option(obs.get("changed")).map(_.asInstanceOf[Long]).getOrElse(0L)
      labels = next
      iter += 1
    }
    // (A path-halving variant — also adopting label-of-label each round —
    // was measured SLOWER here: dup graphs are near-cliques, so rounds are
    // already few and the extra self-join per round dominates. For long-
    // chain graphs prefer connectedComponentsStar.)
    lastRounds = iter
    if (changed > 0) {
      // maxIter hit while labels were still moving — the graph's diameter
      // exceeded the budget (a chain-shaped component, not a dup clique).
      // Returning the partial labels would silently MIS-CLUSTER, so hand
      // off to the diameter-independent star contraction. sym is already
      // symmetrized+distinct+persisted; reuse it as the star input.
      val out = connectedComponentsStar(sym, "src", "dst")
      sym.unpersist()
      return out
    }
    sym.unpersist()
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Rounds the last [[connectedComponentsStar]] call took (diagnostics). */
  @volatile var lastStarRounds: Int = 0

  /** One large-star + small-star round over canonical (a > b) pairs —
    * package-visible so PlanSpec can pin its exchange count (the
    * per-round localCheckpoint hides it from the full query's explain).
    *
    * Exchange discipline (4 materialized per round, r17 — was 5 with
    * the large-star join computed twice in r16, 6+ full-width before):
    * the v>u half of the adjacency shuffles for the join probe side,
    * the min-neighbor table shuffles as MAP-SIDE PARTIAL aggregates
    * (~|V| rows, not the 2|E| raw pairs an explicit repartition(u)
    * forced through), the large-star output partitions ONCE by `a` —
    * the distinct (ClusteredDistribution(a, b) by the subset rule),
    * the mins2 groupBy, and the ls⋈mins2 join all ride AQE stage reuse
    * of that one exchange (ReusedExchange; kept canonical by the
    * explicit isNotNull on mins below) — and only the final small-star
    * distinct pays its own exchange. shuffle_hash hints keep the
    * O(nodes) min tables hashed per partition instead of re-sorting
    * the edge-sized side every round. PlanSpec executes a round and
    * pins materialized-shuffles ≤ 4 with ≥ 2 reused copies. */
  private[graft] def starRound(pairs: DataFrame): DataFrame = {
    // LARGE-STAR over the symmetrized adjacency. No explicit
    // repartition(u): PushDownPredicates moves the v>u filter below a
    // RepartitionByExpression, so the r16 "shared" exchange actually
    // materialized TWICE (full adj for mins + filtered adj for the
    // join — 3|E| rows shuffled) and the repartition forced mins to
    // aggregate entirely post-shuffle. Plain ENSURE exchanges shuffle
    // less: the mins branch partial-aggregates map-side (~|V| agg rows),
    // the join branch ships only the v>u half (|E| rows).
    val adj = pairs.select(col("a").as("u"), col("b").as("v"))
      .unionAll(pairs.select(col("b"), col("a")))
    val mins = adj.groupBy("u")
      .agg(least(first(col("u")), min(col("v"))).as("m"))
      // no-op filter (m = least(u, ...) over a non-empty group is never
      // null), load-bearing for AQE stage reuse: the small-star join's
      // b =!= m condition infers isnotnull into only ONE of ls's two
      // consumer subtrees, which un-shares the ls exchange and runs the
      // whole large-star join twice per round. With the constraint
      // explicit, both copies canonicalize equal and reuse.
      .filter(col("m").isNotNull)
    val ls = adj.filter(col("v") > col("u"))
      .join(mins.hint("shuffle_hash"), "u")
      .select(col("v").as("a"), col("m").as("b")) // a > u >= m = b
      .repartition(col("a"))
      .distinct()
    // SMALL-STAR on the (hi = a, lo = b) pairs
    val mins2 = ls.groupBy("a").agg(min(col("b")).as("m"))
    ls.join(mins2.hint("shuffle_hash"), "a")
      .filter(col("b") =!= col("m"))
      .select(col("b").as("a"), col("m").as("b"))
      .unionAll(mins2.select(col("a"), col("m")))
      .distinct()
  }

  /**
   * Connected components by alternating LARGE-STAR / SMALL-STAR rounds
   * (Kiveris et al., "Connected Components in MapReduce and Beyond",
   * SoCC'14) — the adversarial-diameter fallback [[connectedComponents]]
   * documents: min-label propagation needs O(diameter) rounds, so a
   * planted 1000-link chain costs 1000 shuffled rounds; the star rounds
   * CONTRACT the graph (every node ends pointing at its component min)
   * in O(log² n) rounds worst-case, single digits in practice. Same
   * output contract as [[connectedComponents]]: (id, cluster_id) with
   * cluster_id = min id reachable, one row per node that appears in any
   * edge.
   *
   * Round mechanics, expressed relationally (each phase is ONE groupBy
   * shuffle + one join on the grouped key, carrying only (long, long)
   * pairs — no text, no driver data):
   *  - large-star(u): m = min(N(u) ∪ {u}); every neighbor v > u re-links
   *    to (v, m). Local maxima emit nothing as u but survive as v.
   *  - small-star on the resulting (hi, lo) pairs: per hi, every smaller
   *    neighbor (and hi itself) re-links to the minimum.
   * Both preserve connectivity exactly; the fixpoint is a star forest.
   * Convergence is detected by an Observation riding each round's
   * checkpoint (count + order-independent xxhash64 sum — no extra job);
   * the loop stops when the pair set's signature repeats.
   *
   * Prefer [[connectedComponents]] for dup graphs (near-cliques converge
   * in 2-3 label rounds and its small-graph union-find path is free);
   * prefer this when components can be long paths/trees — lineage
   * chains, co-citation trails, linked-page walks.
   */
  def connectedComponentsStar(edges: DataFrame, srcCol: String = "id_a",
                              dstCol: String = "id_b",
                              maxIter: Int = 50): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val raw = edges.select(col(srcCol).cast("long").as("x"),
        col(dstCol).cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    // node universe up front: self-loop-only nodes must still surface as
    // their own singleton cluster after self-loops drop out of the pairs
    val nodes = raw.select(explode(array(col("x"), col("y"))).as("id"))
      .distinct().persist(MEMORY_AND_DISK)
    // set signature = (size, XOR of row hashes): order-independent and
    // overflow-free (a SUM of longs would throw under ANSI arithmetic)
    val rowSig = coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L))
    def sigOf(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), rowSig).head()
      (r.getLong(0), r.getLong(1))
    }
    var pairs = raw.filter(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("a"),
        least(col("x"), col("y")).as("b"))
      .distinct()
      .localCheckpoint()
    var prevSig = sigOf(pairs)
    var iter = 0
    var converged = prevSig._1 == 0L
    while (!converged && iter < maxIter) {
      val ss = starRound(pairs)
      val obs = org.apache.spark.sql.Observation()
      pairs = ss.observe(obs, count(lit(1)).as("n"), rowSig.as("h"))
        .localCheckpoint() // eager: materializes the round AND fills obs
      val sig = (obs.get("n").asInstanceOf[Long],
        obs.get("h").asInstanceOf[Long])
      converged = sig == prevSig
      prevSig = sig
      iter += 1
    }
    lastStarRounds = iter
    // star forest → assignments; roots and isolated nodes map to themselves
    val out = nodes
      .join(pairs.select(col("a").as("id"), col("b").as("cluster_id")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .localCheckpoint() // materialize while the node cache is hot
    nodes.unpersist()
    out
  }

  /**
   * Random-hyperplane sign bucket: bit p = sign(sum_i v_i * h(p, i)) where
   * h is a deterministic ±1 hash. Pure Catalyst (aggregate over the array).
   */
  def hyperplaneBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (v, i) =>
          v.cast("double") * when(
            graft.functions.GraftFunctions.int_hash_64(
              i.cast("long") * 131071L + p * 524287L)
              .bitwiseAND(lit(1L)) === 1L, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
