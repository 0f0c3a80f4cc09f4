package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft._
import org.apache.spark.sql.graft.bridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.functions._

/**
 * graft's scalar-function DSL — the Spark-side equivalent of the reference's
 * `datachain.func` package (reference: src/datachain/func package). Everything
 * that Spark ships as a built-in is a thin alias (codegen'd, pushdown-able);
 * the rest are our custom Catalyst expressions from `org.apache.spark.sql.graft` expressions.
 */
object GraftFunctions {

  // ------------------------------------------------------------ custom exprs

  /** ClickHouse-style IntHash64 (reference: src/datachain/func/numeric.py:142). */
  def int_hash_64(c: Column): Column = toCol(IntHash64(toExpr(c)))

  /** SipHash-2-4, zero key (reference: src/datachain/func/array.py:382). */
  def sip_hash_64(c: Column): Column = toCol(SipHash64(toExpr(c)))

  /** popcount(a^b) (reference: src/datachain/func/numeric.py:178). */
  def bit_hamming_distance(a: Column, b: Column): Column =
    toCol(BitHammingDistance(toExpr(a), toExpr(b)))

  /** Hilbert curve position of 2-D grid cell (x, y), classic kernel
    * ([[graft.io.Hilbert.index2]] — oracle-replayable exact int64). */
  def hilbert_2(x: Column, y: Column, bits: Int = 16): Column =
    toCol(HilbertIndex2(toExpr(x), toExpr(y), bits))

  /** Hilbert curve position of an N-d grid cell (array<long> of bucket
    * ids), Skilling transpose kernel ([[graft.io.Hilbert.indexN]]). */
  def hilbert_n(coords: Column, bits: Int): Column =
    toCol(HilbertIndexN(toExpr(coords), bits))

  /** char-wise hamming (reference: src/datachain/func/string.py:179). */
  def byte_hamming_distance(a: Column, b: Column): Column =
    toCol(ByteHammingDistance(toExpr(a), toExpr(b)))

  /** probe a spark-sketch Bloom filter (serialized bytes) — the broadcast
    * history-membership prefilter for incremental dedup. */
  def bloom_might_contain(c: Column, bloom: Array[Byte]): Column =
    toCol(BloomMightContain(toExpr(c), bloom))

  /** Misra–Gries heavy hitters: top `topK` of an O(capacity) mergeable
    * frequent-items summary (exact when the group's distinct count stays
    * within capacity; otherwise undercounts by at most N/(capacity+1)).
    * Returns array<struct<item, count>> sorted by (count desc, item). */
  def heavy_hitters(c: Column, capacity: Int, topK: Int): Column =
    toCol(MisraGriesTopK(toExpr(c), capacity, topK).toAggregateExpression())

  /** Deterministic ±1 JL random projection to `outDim` coordinates — one
    * codegen'd kernel call per row, hash-regenerated sign matrix,
    * engine-exact scaled-long arithmetic (see
    * [[graft.ops.Similarity.randomProjection]] for the op contract). */
  def jl_project(c: Column, outDim: Int): Column =
    toCol(JlProject(toExpr(c), outDim))

  /** Header-only image dims from a binary payload (PNG/JPEG/GIF/BMP
    * container headers, ~24 bytes touched, no pixel decode) — null for
    * unrecognized blobs. struct<format, width, height>. */
  def image_header_dims(c: Column): Column =
    toCol(ImageHeaderDims(toExpr(c)))

  /** MP4/ISO-BMFF container metadata from the box structure alone
    * (brand, mvhd duration, first video track's tkhd dims) — no codec,
    * no frame decode. struct<brand, duration_sec, width, height>;
    * null for non-ISO-BMFF blobs. */
  def mp4_header_meta(c: Column): Column =
    toCol(Mp4HeaderMeta(toExpr(c)))

  /** MP3 stream metadata from the first frame header (ID3v2 skipped,
    * spec bitrate/samplerate tables, CBR duration estimate) — no audio
    * decode. struct<version, layer, bitrate_kbps, sample_rate, channels,
    * est_duration_sec>; null without a valid frame sync. */
  def mp3_frame_meta(c: Column): Column =
    toCol(Mp3FrameMeta(toExpr(c)))

  /** Matroska/WebM metadata from the EBML element tree (DocType,
    * Duration × TimestampScale, first video track's pixel dims) — same
    * struct shape as [[mp4_header_meta]], null without the EBML magic. */
  def ebml_header_meta(c: Column): Column =
    toCol(EbmlHeaderMeta(toExpr(c)))

  /** #(sorted bounds) <= v by binary search — the Z-order quantile-
    * bucket kernel (log2 comparisons, no per-row allocation). */
  def bounds_rank(c: Column, bounds: Array[Double]): Column =
    toCol(BoundsRank(toExpr(c), bounds))

  /** Mergeable per-group bloom filter over 64-bit keys (feed `xxhash64`
    * values) → serialized `util.sketch.BloomFilter` bytes. The one-pass
    * builder behind the catalog's per-FILE bloom index. */
  def bloom_agg(c: Column, expectedItems: Long, fpp: Double = 0.03): Column =
    toCol(BloomAgg(toExpr(c), expectedItems, fpp)
      .toAggregateExpression())

  /** Point frequency query against a pre-built broadcast Count–Min
    * sketch (spark-sketch serialized bytes) — never undercounts,
    * overcounts by at most eps·N at the sketch's confidence. */
  def cms_estimate_count(c: Column, cms: Array[Byte]): Column =
    toCol(CmsEstimateCount(toExpr(c), cms))

  /** Exact per-group top-k rows from an O(k) bounded-heap aggregate
    * ([[org.apache.spark.sql.graft.TopKRows]]) — the AGGREGATE form of
    * `row_number() <= k`: composes with other aggregates in one groupBy
    * pass and is legal in streaming aggregations where window functions
    * are not. Keeps the k largest (score, then smallest item) pairs;
    * fully deterministic. With `score = xxhash64(item)` it is a
    * deterministic uniform group sampler (bottom-k-by-hash).
    * Returns array<struct<score, item>> sorted by (score desc, item). */
  def topk_rows(score: Column, item: Column, k: Int): Column =
    toCol(TopKRows(toExpr(score), toExpr(item), k).toAggregateExpression())

  /** KLL mergeable quantile sketch: one array<double> of discrete lower
    * quantiles (smallest value with cumulative count >= ceil(q*n)) per
    * group from O(k·log(n/k)) state — EXACT while the group's item count
    * stays <= k (the oracle-able regime), rank error ~1.5·log2(n/k)/k
    * beyond it. The scale path where exact `percentile` would sort the
    * whole column per group. */
  def kll_quantiles(c: Column, probs: Seq[Double], k: Int = 2048): Column =
    toCol(KllQuantiles(toExpr(c), probs, k).toAggregateExpression())

  /** Weight-aware KLL: integer row weights via binary-expansion level
    * inserts (O(log w) per row, total weight exact) — "p99 by token
    * mass, not by row count". Same convention, sharing, and exact
    * regime as [[kll_quantiles]]. */
  def kll_quantiles_weighted(c: Column, w: Column, probs: Seq[Double],
                             k: Int = 2048): Column =
    toCol(KllQuantilesWeighted(toExpr(c), toExpr(w), probs, k)
      .toAggregateExpression())

  /** 1 - cos(a,b) over float vectors (reference: src/datachain/func/array.py:10). */
  def cosine_distance(a: Column, b: Column): Column =
    toCol(CosineDistance(toExpr(a), toExpr(b)))

  /** PQ/ADC score: decimal-exact sum of the query-table entries selected
    * by the candidate's codes (see [[graft.ops.Similarity.pqAdcTopK]]). */
  def pq_adc(table: Column, codes: Column, kc: Int): Column =
    toCol(PqAdc(toExpr(table), toExpr(codes), kc))

  /** Engine-exact squared euclidean distance over double vectors (12-dp
    * decimal-summed) — the codegen'd kernel behind `Similarity.kmeans`. */
  def decimal_sq_distance(a: Column, b: Column): Column =
    toCol(DecimalSqDistance(toExpr(a), toExpr(b)))

  /** SQ8 encode: one byte per dimension, linear bins over per-dim
    * [min, max] — the 4× ANN compression tier. */
  def sq8_encode(v: Column, mins: Seq[Double], scales: Seq[Double]): Column =
    toCol(Sq8Encode(toExpr(v), mins, scales))

  /** Asymmetric SQ8 distance: full-precision query vs byte codes,
    * 12-dp decimal-summed (engine-exact). */
  def sq8_distance(q: Column, codes: Column, mins: Seq[Double],
                   scales: Seq[Double]): Column =
    toCol(Sq8Distance(toExpr(q), toExpr(codes), mins, scales))

  /** Total occurrences of all `patterns` (overlapping counted) in one
    * Aho–Corasick pass — the blocklist scan for bad-word filtering. */
  def multi_pattern_count(c: Column, patterns: Seq[String]): Column =
    toCol(MultiPatternCount(toExpr(c), patterns))

  /** L2 distance over float vectors (reference: src/datachain/func/array.py:65). */
  def euclidean_distance(a: Column, b: Column): Column =
    toCol(EuclideanDistance(toExpr(a), toExpr(b)))

  /** dot(a,b) over float vectors — ANN scoring kernel. */
  def dot_product(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))

  /** L2 norm of a float vector. */
  def vector_norm(a: Column): Column = toCol(VectorNorm(toExpr(a)))

  /** SimHash-64 text fingerprint (near-dup detection). */
  def sim_hash_64(c: Column): Column = toCol(SimHash64(toExpr(c)))

  /** SimHash-64 over distinct char n-gram shingles (short-doc-stable). */
  def sim_hash_64_shingles(c: Column, n: Int): Column =
    toCol(SimHash64Shingles(toExpr(c), n))

  /** Distinct char n-gram set of normalized text (codegen'd kernel). */
  def char_ngrams(c: Column, n: Int): Column = toCol(CharNgrams(toExpr(c), n))

  /** k-wide MinHash signature over w-token shingles (codegen'd kernel). */
  def minhash_signature(c: Column, k: Int, w: Int): Column =
    toCol(MinHashSignature(toExpr(c), k, w))

  // -------------------------------------------------------------- path funcs
  // Mirror the reference's SQL semantics (src/datachain/sql/sqlite/base.py:326-391),
  // including its multi-slash and trailing-dot edge cases, composed purely from
  // codegen'd built-ins (regexp/substr/trim) so Catalyst can optimize freely.

  /** Parent directory of a path; "" when the path has no slash. */
  def path_parent(p: Column): Column =
    when(p.contains("/"), regexp_extract(p, "^(.*?)/+[^/]*$", 1)).otherwise(lit(""))

  /** Final path component (after the last slash). */
  def path_name(p: Column): Column = regexp_extract(p, "([^/]*)$", 1)

  /** Extension of the final component, without the dot; "" when none. */
  def path_file_ext(p: Column): Column = {
    val nm = path_name(p)
    when(instr(nm, ".") > 0, regexp_extract(nm, "\\.([^.]*)$", 1)).otherwise(lit(""))
  }

  /** Final component minus its extension (trailing dots trimmed). */
  def path_file_stem(p: Column): Column = {
    val nm = path_name(p)
    val extLen = when(instr(nm, ".") > 0, length(path_file_ext(p))).otherwise(lit(0))
    rtrim(nm.substr(lit(1), length(nm) - extLen), ".")
  }

  // ------------------------------------------------------------- array funcs
  // Aliases onto Spark built-ins, named as in src/datachain/func/array.py.

  def array_length(c: Column): Column = size(c)
  def array_contains_(c: Column, v: Any): Column = array_contains(c, v)
  def array_slice(c: Column, offset: Int, len: Int): Column =
    slice(c, offset + 1, len) // reference is 0-based
  def array_join_(c: Column, sep: String): Column = array_join(c, sep)
  def array_get_element(c: Column, idx: Int): Column =
    element_at(c, idx + 1) // reference is 0-based

  // ------------------------------------------------------- conditional funcs

  def ifelse(cond: Column, ifTrue: Column, ifFalse: Column): Column =
    when(cond, ifTrue).otherwise(ifFalse)
  def isnone(c: Column): Column = c.isNull

  // ------------------------------------------------------------ random funcs

  /** Non-negative pseudo-random Long, like the reference's `rand()`
    * (abs(random()) in SQLite). Deterministic variants should prefer
    * [[graft.core.Sys]]'s persisted `sys.rand`. */
  def rand_uint63(): Column = (rand() * Long.MaxValue).cast("long")

  // ----------------------------------------------------------- registration

  /** Register the custom expressions for SQL use (`SELECT int_hash_64(x)`). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("int_hash_64", es => IntHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("sip_hash_64", es => SipHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("bit_hamming_distance",
      es => BitHammingDistance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("byte_hamming_distance",
      es => ByteHammingDistance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("cosine_distance",
      es => CosineDistance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("euclidean_distance",
      es => EuclideanDistance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vector_norm",
      es => VectorNorm(es.head), "built-in")
    reg.createOrReplaceTempFunction("sim_hash_64",
      es => SimHash64(es.head), "built-in")
  }
}
