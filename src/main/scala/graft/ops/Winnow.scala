package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow

/**
 * Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
 * SIGMOD 2003 — the MOSS algorithm): slide a window of `w` consecutive
 * character `k`-gram hashes over the text and keep each window's
 * MINIMUM hash (rightmost occurrence on ties). The selected
 * fingerprints are a position-robust subset of the k-grams with two
 * guarantees the paper proves: any shared substring of length
 * `w + k - 1` or more is caught by at least one shared fingerprint,
 * and no substring shorter than `k` is ever matched. Density is
 * 2/(w+1) of the grams — a tunable sketch that, unlike MinHash,
 * carries POSITIONS, so matches localize to the reused passage.
 *
 * Complements the existing dedup family: MinHash/SimHash answer
 * "are these documents similar overall", CDC chunks answer "which
 * exact passages are reused verbatim at chunk granularity", winnowing
 * answers "do these documents share any run of ≥ w+k-1 characters"
 * at ~1/(w+1) the index size of full k-gram shingling — the
 * plagiarism/license-leak/boilerplate detector for a training corpus.
 *
 * The gram hash is the same plain window polynomial the CDC kernel
 * uses (`Σ code(i+j)·W^(k-1-j)`, `W = 31`, codepoint domain) —
 * deliberately NOT a private hash: for `k <= 9` (`k <= 10` BMP-only)
 * the value is exact int64 arithmetic any SQL engine recomputes
 * verbatim, which is what lets the driver's DuckDB oracle re-derive
 * every fingerprint bit-for-bit. Larger `k` (to the accepted 16)
 * wraps two's-complement: still deterministic and self-consistent,
 * but not SQL-replayable (mirrors [[Cdc.chunkSpans]]'s documented
 * bound). Selection is O(n) via a monotonic deque, not O(n·w).
 */
object Winnow {

  /** Gram hashes of `s` in the codepoint domain: element `i` is the
    * polynomial over codepoints `[i, i+k)`. Empty when the text has
    * fewer than `k` codepoints. Rolling O(1) update per position. */
  def gramHashes(s: String, k: Int): Array[Long] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < k) return Array.emptyLongArray
    // W^(k-1), the outgoing element's weight in the rolling update
    var wk = 1L
    var j = 0
    while (j < k - 1) { wk *= Cdc.W; j += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    j = 0
    while (j < k) { h = h * Cdc.W + cps(j); j += 1 }
    out(0) = h
    var i = 1
    while (i <= n - k) {
      h = (h - cps(i - 1) * wk) * Cdc.W + cps(i + k - 1)
      out(i) = h
      i += 1
    }
    out
  }

  /** Winnowed fingerprints of `s`: `(pos, fp)` with `pos` the 1-BASED
    * codepoint start of the selected k-gram (the SQL `substr`
    * convention the oracle shares) in increasing order, one entry per
    * distinct selected position. Every window of `w` consecutive grams
    * contributes its minimum hash, rightmost occurrence on ties (the
    * paper's BASIC winnowing with the rightmost-tie rule, not robust
    * winnowing: on a run of EQUAL hashes — repeated-char separators,
    * whitespace boilerplate — each window's rightmost minimum is a new
    * position, so density degrades toward one fp per gram there, where
    * the robust rule would re-select the prior pick. Matching
    * correctness and the w+k-1 window guarantee are unaffected; the
    * expected density 2/(w+1) holds for distinct-hash text. Kept basic
    * because the oracle replays the selection as pure SQL window
    * minima, which the robust rule's cross-window state cannot
    * express); a text with fewer than `w` grams
    * is one window over all its grams, so any text of at least `k`
    * codepoints yields at least one fingerprint. */
  def fingerprintSpans(s: String, k: Int, w: Int): Seq[(Int, Long)] = {
    require(k >= 2 && k <= 16, s"winnow gram k must be in [2,16], got $k")
    require(w >= 1, s"winnow window w must be >= 1, got $w")
    val h = gramHashes(s, k)
    val g = h.length
    if (g == 0) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    // monotonic deque of gram indices; popping `>=` on insert keeps the
    // RIGHTMOST occurrence of the window minimum at the front
    val deque = new java.util.ArrayDeque[Int]()
    var last = -1
    var i = 0
    while (i < g) {
      while (!deque.isEmpty && h(deque.peekLast) >= h(i)) deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst <= i - w) deque.pollFirst()
      // first full window ends at w-1; a short text (g < w) is the
      // single window ending at its last gram
      if (i >= w - 1 || i == g - 1) {
        val sel = deque.peekFirst
        if (sel != last) { out += ((sel + 1, h(sel))); last = sel }
      }
      i += 1
    }
    out.toSeq
  }

  /** The codegen entry point: [[fingerprintSpans]] packed as
    * `array<struct<pos:int, fp:long>>`. */
  def fingerprintArray(text: UTF8String, k: Int, w: Int): ArrayData =
    new GenericArrayData(fingerprintSpans(text.toString, k, w)
      .map { case (p, f) => InternalRow(p, f) }.toArray[Any])

  /** `array<struct<pos,fp>>` column of winnowed fingerprints. */
  def fingerprintsCol(text: Column, k: Int = 5, w: Int = 8): Column =
    org.apache.spark.sql.graft.bridge.column(
      org.apache.spark.sql.graft.WinnowFingerprintsExpr(
        org.apache.spark.sql.graft.bridge.expression(text), k, w))

  /** Exploded fingerprint table `(id, pos, fp)` — one row per selected
    * gram. One codegen'd projection, no shuffle. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, w: Int = 8): DataFrame =
    df.select(col(idCol),
        explode(fingerprintsCol(col(textCol), k, w)).as("f"))
      .select(col(idCol), col("f.pos").as("pos"), col("f.fp").as("fp"))

  /** [[sharedSpans]] over a PRECOMPUTED fingerprint table `(id, pos,
    * fp)` (the [[fingerprints]] shape) — the `subtractSeenChunksPre`
    * pattern: a caller that already fingerprinted the corpus (e.g. the
    * composed [[nearDupWithSpans]]) pays the dominant linear
    * projection exactly once for detection AND localization. */
  def sharedSpansPre(fpTable: DataFrame, pairs: DataFrame,
                     idCol: String = "id"): DataFrame =
    pairs.select(col("id_a"), col("id_b"))
      .join(fpTable.select(col(idCol).as("id_a"), col("pos").as("pos_a"),
        col("fp")), "id_a")
      .join(fpTable.select(col(idCol).as("id_b"), col("pos").as("pos_b"),
        col("fp")), Seq("id_b", "fp"))
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"),
        col("fp"))

  /** Localize WHERE near-dup pairs overlap — the property that makes
    * winnowing worth its index over MinHash: fingerprints carry
    * positions, so a match points at the reused passage. For each
    * `(id_a, id_b)` in `pairs`, emits one row per matching fingerprint
    * position pair: `(id_a, id_b, pos_a, pos_b, fp)` with `pos_*` the
    * 1-based codepoint starts of the shared k-gram. Spans come from the
    * RAW fingerprint table (no hot-fp cap — localization wants every
    * anchor, including boilerplate); chain consecutive positions with
    * [[coalesceRuns]]. The pair table is typically tiny (nearDup's
    * output), so both joins broadcast it and the corpus fingerprints
    * never shuffle. The fingerprint frame is PERSISTED (it feeds both
    * join sides — uncached, each side would re-run the full projection
    * over the corpus) and stays cached after return: the result is
    * lazy, so the op cannot unpersist behind it; blocks are
    * LRU-evictable (id, pos, fp) triples, orders of magnitude smaller
    * than the text (the nearDup cache idiom). */
  def sharedSpans(df: DataFrame, idCol: String, textCol: String,
                  pairs: DataFrame, k: Int = 5, w: Int = 8): DataFrame = {
    val fps = fingerprints(df, idCol, textCol, k, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sharedSpansPre(fps, pairs, idCol)
  }

  /** Chain [[sharedSpans]] position pairs into contiguous RUNS: rows
    * of one `(id_a, id_b)` pair whose positions advance in lockstep
    * (`pos_b - pos_a` constant — the same reused passage at one
    * alignment) merge into `(id_a, id_b, start_a, start_b, length)`
    * with `length` in codepoints (`last gram start + k - start`).
    * Successive fingerprints of a shared run are at most `w` grams
    * apart (the winnowing window guarantee), so a gap of more than
    * `w + k - 1` codepoints at the same alignment is a DIFFERENT
    * reused passage. One window + one groupBy, both partitioned by
    * the (pair, alignment) key — pair-local frames, no shuffle growth
    * beyond the span table itself. */
  def coalesceRuns(spans: DataFrame, k: Int, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byAlign = Window
      .partitionBy(col("id_a"), col("id_b"), col("__delta"))
      .orderBy(col("pos_a"))
    val gap = w + k - 1
    spans
      .withColumn("__delta", col("pos_b") - col("pos_a"))
      .withColumn("__new", when(col("pos_a") -
        lag(col("pos_a"), 1).over(byAlign) > gap, 1).otherwise(0))
      .withColumn("__run", sum(col("__new")).over(
        byAlign.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("id_a"), col("id_b"), col("__delta"), col("__run"))
      .agg(min(col("pos_a")).as("start_a"),
        min(col("pos_b")).as("start_b"),
        (max(col("pos_a")) + lit(k) - min(col("pos_a"))).as("length"))
      .select(col("id_a"), col("id_b"), col("start_a"), col("start_b"),
        col("length"))
  }

  /** Near-duplicate pairs by fingerprint-set Jaccard:
    * `(id_a, id_b, n_shared, n_union)` for every pair whose DISTINCT
    * fingerprint-value sets overlap at `jaccard >= minJaccard`
    * (`id_a < id_b`). Candidates come from POSTINGS LISTS — the kept
    * (id, fp) pairs grouped per fingerprint VALUE into a sorted id
    * array, with every in-list pair emitted by an in-array HOF — never
    * an all-pairs product, so cost tracks true overlap like the
    * MinHash band join. `maxDocsPerFp > 0` drops fingerprints
    * appearing in more than that many documents BEFORE the lists are
    * collected (a count-only pre-pass + broadcast anti-join, so no
    * aggregation buffer ever holds a hot posting): boilerplate grams
    * shared corpus-wide carry no near-dup signal and would form
    * quadratic hot buckets at crawl scale — the cap both bounds the
    * pair expansion AND bounds every collected list at `maxDocsPerFp`
    * entries. 0 keeps every gram (exact, small/trusted corpora only:
    * an uncapped hot fingerprint's posting must fit one aggregation
    * buffer). Feed the pairs to [[Dedup.connectedComponents]] for
    * cluster-level dedup.
    *
    * Caching: the fingerprint frame and the postings lists persist and
    * stay cached after return — the result is lazy, so the op cannot
    * unpersist behind it. Blocks are metadata-sized and LRU-evictable
    * (the minhashCandidates idiom); a caller that wants them gone after
    * materializing calls `spark.catalog.clearCache()` or re-plans from
    * [[nearDupWithSpans]], which shares ONE cached table across
    * detection and localization. */
  def nearDup(df: DataFrame, idCol: String, textCol: String,
              k: Int = 5, w: Int = 8, minJaccard: Double = 0.5,
              maxDocsPerFp: Int = 0): DataFrame = {
    // per-doc DISTINCT fp values locally inside the projection
    // (array_distinct before the explode) — the dedup that a
    // groupBy-distinct would otherwise pay a full shuffle for is free.
    // Cached: this one frame feeds the hot-fp count and the postings
    // aggregation; without the cache each consumer re-fingerprints the
    // full corpus.
    val fps = df.select(col(idCol).as("id"),
        explode(array_distinct(transform(
          fingerprintsCol(col(textCol), k, w), f => f("fp")))).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nearDupFromDistinct(fps, minJaccard, maxDocsPerFp)
  }

  /** Detection + localization off ONE fingerprint pass: fingerprints
    * the corpus once into a persisted `(id, pos, fp)` table, derives
    * the near-dup pairs from it ([[nearDup]] semantics — the per-doc
    * distinct collapses inside the postings aggregation via
    * collect_set, so no second projection runs), and localizes the
    * pairs over the SAME table. Returns (pairs, spans). */
  def nearDupWithSpans(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 5, w: Int = 8, minJaccard: Double = 0.5,
                       maxDocsPerFp: Int = 0): (DataFrame, DataFrame) = {
    // cache the PRE-EXPLODE fingerprint arrays: the one expensive
    // linear pass over the text runs once; the detection side derives
    // its per-doc-distinct VALUE rows and the localization side its
    // POSITIONAL rows as cheap in-array projections of the cache — no
    // extra shuffle anywhere (a distinct() on the exploded table would
    // pay one, and the in-array array_distinct is free)
    val arr = df.select(col(idCol).as("id"),
        fingerprintsCol(col(textCol), k, w).as("__fps"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fps = arr.select(col("id"),
      explode(array_distinct(transform(col("__fps"),
        f => f("fp")))).as("fp"))
    // the pair table feeds the caller AND both span joins — without its
    // own cache, materializing the spans frame would re-run the whole
    // postings/pair pipeline a second time
    val pairs = nearDupFromDistinct(fps, minJaccard, maxDocsPerFp)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fpTable = arr.select(col("id"), explode(col("__fps")).as("f"))
      .select(col("id"), col("f.pos").as("pos"), col("f.fp").as("fp"))
    (pairs, sharedSpansPre(fpTable, pairs, "id"))
  }

  /** The shared pair pipeline over a distinct `(id, fp)` frame (the
    * caller persists it — every branch below consumes it). */
  private def nearDupFromDistinct(fps: DataFrame, minJaccard: Double,
                                  maxDocsPerFp: Int): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in (0,1], got $minJaccard")
    val kept =
      if (maxDocsPerFp <= 0) fps
      else {
        // one map-side-combined COUNT groupBy plus an anti-join, so no
        // collect_list buffer ever sees an uncapped posting. The hot
        // list is usually tiny (≤ total-grams/cap rows); AQE picks the
        // broadcast anti-join then, and degrades to a shuffle anti-join
        // when a crawl-scale corpus pushes it past the threshold — no
        // hint, so neither regime is mis-planned
        val hot = fps.groupBy(col("fp"))
          .agg(count(lit(1)).as("__docs"))
          .filter(col("__docs") > maxDocsPerFp).select(col("fp"))
        fps.join(hot, Seq("fp"), "left_anti")
      }
    // one sorted postings list per fingerprint; reused by the pair
    // generator AND the per-doc size table below
    val postings = kept.groupBy(col("fp"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-doc kept-set size (one row per doc). Derived from `kept`,
    // not `postings`: the union size must count a doc's UNSHARED kept
    // fps too. Joined back onto pairs without a hint — AQE broadcasts
    // it at ordinary scale, shuffle-joins at billions of docs.
    val sizes = kept.groupBy(col("id")).agg(count(lit(1)).as("n"))
    // every in-list pair (x, y) with x < y by sort order: for element
    // i, pair it with each later element — O(|ids|²) per list, bounded
    // by the cap, allocated in-array with codegen HOFs (no shuffle)
    val pairs = postings.select(
        explode(flatten(transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + lit(2),
              size(col("ids")) - i - lit(1)),
            y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("n_union", col("na") + col("nb") - col("n_shared"))
      .filter(col("n_shared").cast("double") / col("n_union")
        >= lit(minJaccard))
      .select(col("id_a"), col("id_b"), col("n_shared"), col("n_union"))
  }
}
