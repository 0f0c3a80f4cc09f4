package org.apache.spark.sql.graft

import graft.functions.Impl
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Custom Catalyst expressions for the functions the reference has that
 * Spark lacks as built-ins (reference: src/datachain/func/numeric.py,
 * src/datachain/func/array.py, src/datachain/func/string.py).
 *
 * All of them generate code as a single static call into [[Impl]], so they
 * stay inside whole-stage codegen (no interpreted-eval fallback, no UDF
 * serialization cost) — this is the "native Expression beats UDF" path.
 */

/** 64-bit integer hash (ClickHouse IntHash64 semantics). */
case class IntHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int_hash_64"
  override protected def nullSafeEval(v: Any): Any =
    Impl.intHash64(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impl.intHash64($c)")
  override protected def withNewChildInternal(c: Expression): IntHash64 = copy(c)
}

/** SipHash-2-4 (zero key) of a string's UTF-8 bytes. */
case class SipHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sip_hash_64"
  override protected def nullSafeEval(v: Any): Any =
    Impl.sipHash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impl.sipHash64($c)")
  override protected def withNewChildInternal(c: Expression): SipHash64 = copy(c)
}

/** Registered domain (eTLD+1) of a host against the vendored Mozilla
  * Public Suffix List — full wildcard/exception/private-section
  * semantics ([[graft.ops.Psl]]); the per-JVM rule tables load lazily on
  * first executor call, the lookup itself is a static call inside
  * whole-stage codegen. */
case class RegisteredDomainExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "registered_domain"
  override protected def nullSafeEval(v: Any): Any =
    graft.ops.Psl.registeredDomainU(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Psl.registeredDomainU($c)")
  override protected def withNewChildInternal(c: Expression): RegisteredDomainExpr =
    copy(c)
}

/** Content-defined chunk spans of a string ([[graft.ops.Cdc]] — Rabin
  * window polynomial, rolling O(1) per char): returns
  * `array<struct<start:int, chunk:string>>` with 1-based starts. The
  * split parameters are plan-time constants (ride the expression, not
  * child columns), so the whole call codegens to one static kernel
  * invocation. */
case class CdcChunksExpr(child: Expression, k: Int, divisor: Long,
                         minLen: Int, maxLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"
  override protected def nullSafeEval(v: Any): Any =
    graft.ops.Cdc.chunkArray(v.asInstanceOf[UTF8String], k, divisor,
      minLen, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.Cdc.chunkArray($c, $k, ${divisor}L, $minLen, $maxLen)")
  override protected def withNewChildInternal(c: Expression): CdcChunksExpr =
    copy(child = c)
}

/** Winnowed fingerprints (Schleimer et al. 2003) of a string:
  * `array<struct<pos:int, fp:long>>`, pos 1-based codepoint gram
  * start. Kernel in [[graft.ops.Winnow]]; same exact-int64 polynomial
  * family as [[CdcChunksExpr]]. */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"
  override protected def nullSafeEval(v: Any): Any =
    graft.ops.Winnow.fingerprintArray(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.Winnow.fingerprintArray($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFingerprintsExpr =
    copy(child = c)
}

/** BPE tokenization of whitespace-split text under a trained
  * [[graft.ops.Bpe.Model]]: array<struct<widx:int, tidx:int,
  * token:string>>, 1-based positions. The model rides generated code
  * via addReferenceObj (one virtual call per row); its per-JVM word
  * memo makes Zipf-headed corpora encode each distinct word once. */
case class BpeTokenizeExpr(child: Expression, model: graft.ops.Bpe.Model)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("widx", IntegerType, nullable = false),
    StructField("tidx", IntegerType, nullable = false),
    StructField("token", StringType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_tokenize"
  override protected def nullSafeEval(v: Any): Any =
    model.tokenizeRow(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", model,
      classOf[graft.ops.Bpe.Model].getName)
    defineCodeGen(ctx, ev, c => s"$ref.tokenizeRow($c)")
  }
  override protected def withNewChildInternal(c: Expression): BpeTokenizeExpr =
    copy(child = c)
}

/** Hilbert curve index of 2-D grid cell (x, y) on the 2^bits-per-side
  * grid — classic reflect+rotate kernel in [[graft.io.Hilbert.index2]];
  * exact int64, SQL-replayable via a recursive CTE (the oracle does). */
case class HilbertIndex2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 31, s"hilbert bits in [1,31], got $bits")
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hilbert_index2"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    graft.io.Hilbert.index2(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.io.Hilbert.index2($x, $y, $bits)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertIndex2 =
    copy(left = l, right = r)
}

/** Hilbert curve index of an N-d grid cell (`array<long>` of bucket ids,
  * each < 2^bits) — Skilling transpose kernel in
  * [[graft.io.Hilbert.indexN]]; n*bits must fit 63 bits. */
case class HilbertIndexN(child: Expression, bits: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hilbert_index_n"
  override protected def nullSafeEval(a: Any): Any =
    graft.io.Hilbert.indexNArray(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.io.Hilbert.indexNArray($c, $bits)")
  override protected def withNewChildInternal(c: Expression): HilbertIndexN =
    copy(child = c)
}

/** popcount(a ^ b) — hamming distance between two 64-bit values. */
case class BitHammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bit_hamming_distance"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Impl.bitHammingDistance(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** Character-wise hamming distance between two strings (length diff counts). */
case class ByteHammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_hamming_distance"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Impl.byteHammingDistance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Impl.byteHammingDistance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** 1 - cosine similarity between two float vectors. */
case class CosineDistance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_distance"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Impl.cosineDistanceFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Impl.cosineDistanceFloat($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** Euclidean (L2) distance between two float vectors. */
case class EuclideanDistance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "euclidean_distance"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Impl.euclideanDistanceFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Impl.euclideanDistanceFloat($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** Dot product between two float vectors (ANN scoring kernel). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Impl.dotFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Impl.dotFloat($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** L2 norm of a float vector. */
case class VectorNorm(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vector_norm"
  override protected def nullSafeEval(v: Any): Any =
    Impl.normFloat(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impl.normFloat($c)")
  override protected def withNewChildInternal(c: Expression): VectorNorm = copy(c)
}

/** Distinct overlapping character n-grams of normalized text (shingle set). */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n > 0, "ngram size must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngrams"
  override protected def nullSafeEval(v: Any): Any =
    Impl.charNgrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impl.charNgrams($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharNgrams =
    copy(child = c)
}

/** k-wide MinHash signature over w-token word shingles. */
case class MinHashSignature(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k > 0 && w > 0, "k and shingle width must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"
  override protected def nullSafeEval(v: Any): Any =
    Impl.minhashSignature(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impl.minhashSignature($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** SimHash-64 fingerprint of a text (whitespace tokens, SipHash bit votes). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sim_hash_64"
  override protected def nullSafeEval(v: Any): Any =
    Impl.simHash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impl.simHash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** SimHash-64 over distinct char n-gram shingles (low-variance fingerprint
  * for short documents; see Impl.simHash64Shingles). */
case class SimHash64Shingles(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n > 0, "ngram size must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sim_hash_64_shingles"
  override protected def nullSafeEval(v: Any): Any =
    Impl.simHash64Shingles(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Impl.simHash64Shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): SimHash64Shingles =
    copy(child = c)
}

/**
 * Total occurrences of a fixed pattern set in a string — one Aho–Corasick
 * automaton pass (overlapping matches included), codegen'd as a single
 * virtual call. The blocklist/bad-word scan of a C4-style pipeline: P
 * patterns cost one text scan, not P. The automaton rides the expression
 * into codegen references and rebuilds lazily per executor.
 */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "multi_pattern_count"
  @transient private lazy val aho = new graft.functions.AhoCorasick(patterns)
  /** public for generated code */
  def count(s: UTF8String): Int = aho.countAll(s.toString)
  override protected def nullSafeEval(v: Any): Any =
    count(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAho", this,
      classOf[MultiPatternCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }
  override protected def withNewChildInternal(c: Expression): MultiPatternCount =
    copy(child = c)
}

/** Engine-exact squared euclidean distance (12-dp decimal-summed; see
  * [[graft.functions.Impl.decimalSqDist]]) — the codegen'd k-means kernel. */
/** Deterministic ±1 JL random projection as ONE codegen'd kernel call per
  * row (see [[graft.functions.Impl.jlProject]]): the hash-regenerated
  * sign matrix is cached per (outDim, dims) and the decimal-exact fold
  * runs in scaled longs — the interpreted zip_with/aggregate HOF chain
  * this replaces cost ~50× more per row and dominated the gate. */
case class JlProject(child: Expression, outDim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(outDim >= 1, "outDim must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jl_project"
  /** public for generated code */
  def proj(v: ArrayData): ArrayData = Impl.jlProject(v, outDim)
  override protected def nullSafeEval(v: Any): Any =
    proj(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftJl", this, classOf[JlProject].getName)
    defineCodeGen(ctx, ev, c => s"$ref.proj($c)")
  }
  override protected def withNewChildInternal(c: Expression): JlProject =
    copy(child = c)
}

/** PQ/ADC score: sum over subspaces of the query's flattened m×kc
  * distance-table entry selected by the candidate's code — one compiled
  * kernel call per (query, candidate) pair instead of an interpreted
  * `aggregate` HOF (same decimal-exact arithmetic; the probe measured the
  * HOF ~2.4× slower end-to-end on the candidate scan). */
case class PqAdc(left: Expression, right: Expression, kc: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(kc > 0, "kc must be positive")
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"
  /** Per-thread memo of the last query table converted to 9-dp scaled
    * longs: broadcast-join probes stream many candidates against the
    * same query row, so the 64-entry conversion amortizes away and each
    * pair costs m long adds. Scaled-long sums are exact (and identical
    * to the decimal formulation) while the total distance stays under
    * ~9·10⁶ — far beyond any embedding's squared distance; the oracle
    * gate pins the equality empirically.
    *
    * The memo hit test is reference identity PLUS a content fingerprint
    * (length and first/last raw bits): columnar/unsafe execution paths
    * may reuse one ArrayData instance re-pointed at different bytes, and
    * identity alone would then serve a stale table. Distinct ADC tables
    * share first AND last entry bit patterns only if two query vectors
    * tie in decimal distance to both codebook corners — and a false
    * rebuild costs one 64-entry conversion, a false HIT is what the
    * fingerprint rules out. */
  @transient private lazy val memo =
    new ThreadLocal[(ArrayData, Int, Long, Long, Array[Long])]()
  /** public for generated code */
  def score(t: ArrayData, c: ArrayData): Double = {
    val n = t.numElements()
    val fb = java.lang.Double.doubleToRawLongBits(t.getDouble(0))
    val lb = java.lang.Double.doubleToRawLongBits(t.getDouble(n - 1))
    var e = memo.get()
    if (e == null || (e._1 ne t) || e._2 != n || e._3 != fb || e._4 != lb) {
      val arr = new Array[Long](n)
      var i = 0
      while (i < n) { arr(i) = Math.round(t.getDouble(i) * 1e9); i += 1 }
      e = (t, n, fb, lb, arr)
      memo.set(e)
    }
    val longs = e._5
    var sum = 0L
    var s = 0
    val m = c.numElements()
    while (s < m) { sum += longs(s * kc + c.getInt(s)); s += 1 }
    sum.toDouble / 1e9
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqAdc", this, classOf[PqAdc].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.score($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

case class DecimalSqDistance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "decimal_sq_distance"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Impl.decimalSqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Impl.decimalSqDist($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** SQ8 scalar-quantization encode: one byte per dimension via per-dim
  * linear bins over [min, max] (see [[graft.functions.Impl.sq8Encode]]) —
  * 4× smaller than float32. The bin tables ride the expression into the
  * codegen references; output is a BinaryType blob, so quantized scans
  * shuffle 1 byte/dim. */
case class Sq8Encode(child: Expression, mins: Seq[Double],
                     scales: Seq[Double])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(mins.length == scales.length, "mins/scales length mismatch")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_encode"
  @transient private lazy val mArr = mins.toArray
  @transient private lazy val sArr = scales.toArray
  /** public for generated code */
  def enc(v: ArrayData): Array[Byte] = Impl.sq8Encode(v, mArr, sArr)
  override protected def nullSafeEval(v: Any): Any =
    enc(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSq8Enc", this, classOf[Sq8Encode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.enc($c)")
  }
  override protected def withNewChildInternal(c: Expression): Sq8Encode =
    copy(child = c)
}

/** Asymmetric SQ8 distance (full-precision query vs byte codes),
  * 12-dp-decimal-summed like [[DecimalSqDistance]] — engine-exact; see
  * [[graft.functions.Impl.sq8Dist]]. */
case class Sq8Distance(left: Expression, right: Expression,
                       mins: Seq[Double], scales: Seq[Double])
    extends BinaryExpression with ImplicitCastInputTypes {
  require(mins.length == scales.length, "mins/scales length mismatch")
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_distance"
  @transient private lazy val mArr = mins.toArray
  @transient private lazy val sArr = scales.toArray
  /** public for generated code */
  def dist(q: ArrayData, codes: Array[Byte]): Double =
    Impl.sq8Dist(q, codes, mArr, sArr)
  override protected def nullSafeEval(q: Any, c: Any): Any =
    dist(q.asInstanceOf[ArrayData], c.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSq8Dist", this, classOf[Sq8Distance].getName)
    defineCodeGen(ctx, ev, (q, c) => s"$ref.dist($q, $c)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/**
 * Membership probe against a pre-built broadcast Bloom filter (spark-sketch
 * serialized form, as produced by `DataFrameStatFunctions.bloomFilter`).
 * The filter bytes ride the expression into the codegen references, so the
 * probe is one virtual call inside whole-stage codegen — this is the
 * incremental-dedup prefilter shape: a 100 TB history collapses to a
 * broadcastable bitset and only probable duplicates proceed to the exact
 * confirmation join.
 */
/**
 * Header-only image dimension extraction: parses just the container
 * header (PNG IHDR, JPEG SOF marker scan, GIF logical screen, BMP info
 * header) of a binary payload — tens of bytes — instead of decoding
 * pixels. At 100 TB of media, metadata backfill via full decode reads
 * and decompresses every pixel; this reads the parquet binary column and
 * touches ~24 bytes per blob, stays inside whole-stage codegen, and
 * never allocates an image buffer. Returns
 * struct<format, width, height>, null for unrecognized/corrupt headers
 * (route those through the full [[graft.ops.Multimodal]] decode).
 */
case class ImageHeaderDims(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "image_header_dims"

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  /** public for generated code; null = not a recognized image header */
  def parse(b: Array[Byte]): InternalRow = {
    if (b.length >= 24 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G' && b(12) == 'I' && b(13) == 'H' &&
        b(14) == 'D' && b(15) == 'R') {
      InternalRow(UTF8String.fromString("png"), be32(b, 16), be32(b, 20))
    } else if (b.length > 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      // JPEG: walk marker segments to the first SOFn (C0-CF minus the
      // non-frame C4/C8/CC); height/width sit 5/7 bytes into the segment
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xFF) != 0xFF) return null // desynced marker stream
        var m = b(i + 1) & 0xFF
        while (m == 0xFF && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xFF }
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          if (i + 8 >= b.length) return null
          return InternalRow(UTF8String.fromString("jpeg"),
            be16(b, i + 7), be16(b, i + 5))
        } else if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
          i += 2 // standalone marker, no length field
        } else {
          if (i + 3 >= b.length) return null
          i += 2 + be16(b, i + 2)
        }
      }
      null
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8') {
      InternalRow(UTF8String.fromString("gif"), le16(b, 6), le16(b, 8))
    } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      // dispatch on the DIB header size: BITMAPINFOHEADER (40+) stores
      // 32-bit dims at 18/22, BITMAPCOREHEADER (12, OS/2) 16-bit dims at
      // 18/20 — reading the core layout as 32-bit packed width|height
      // into one int and planes+bitcount into the other, reporting
      // confident garbage. Anything else → null (full-decode route).
      val dib = le32(b, 14)
      if (dib >= 40)
        // negative height = top-down row order; magnitude is the dimension
        InternalRow(UTF8String.fromString("bmp"),
          le32(b, 18), math.abs(le32(b, 22)))
      else if (dib == 12)
        InternalRow(UTF8String.fromString("bmp"), le16(b, 18), le16(b, 20))
      else null
    } else null
  }

  override protected def nullSafeEval(v: Any): Any =
    parse(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftImgHdr", this,
      classOf[ImageHeaderDims].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.parse($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }
  override protected def withNewChildInternal(c: Expression): ImageHeaderDims =
    copy(child = c)
}

/**
 * MP4/ISO-BMFF container metadata from the box structure alone — the
 * video counterpart of [[ImageHeaderDims]]: brand from `ftyp`, duration
 * from `moov/mvhd` (duration/timescale, version 0 and 1 layouts), and
 * the first video track's pixel dims from `moov/trak/tkhd` (16.16
 * fixed-point; audio tracks carry 0×0 and are skipped). Walks top-level
 * boxes (64-bit `largesize` supported) and recurses only into
 * `moov`/`trak`, so a blob with a leading `moov` costs ~100 touched
 * bytes and a trailing-moov file one linear box walk — no codec, no
 * frame decode (JDK ships none; the reference shells out to ffprobe for
 * the same fields, reference: src/datachain/lib/file.py:901-1003).
 * Null for anything that isn't ISO-BMFF.
 */
case class Mp4HeaderMeta(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType),
    StructField("duration_sec", DoubleType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mp4_header_meta"

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "ISO-8859-1")

  private final class Acc {
    var brand: String = null
    var durationSec: java.lang.Double = null
    var width = 0
    var height = 0
  }

  /** Walk boxes in [from, to); recurse into containers on the path to
    * the fields we need. Malformed sizes end the walk (partial results
    * still surface). */
  private def walk(b: Array[Byte], from: Long, to: Long, depth: Int,
                   acc: Acc): Unit = {
    var i = from
    while (i + 8 <= to) {
      var size = be32(b, i.toInt)
      val typ = fourcc(b, (i + 4).toInt)
      var hdr = 8L
      if (size == 1 && i + 16 <= to) { size = be64(b, (i + 8).toInt); hdr = 16L }
      else if (size == 0) size = to - i // box extends to end
      if (size < hdr || i + size > to) return
      val body = i + hdr
      typ match {
        case "ftyp" if size >= hdr + 4 && acc.brand == null =>
          acc.brand = fourcc(b, body.toInt)
        case "moov" if depth == 0 =>
          walk(b, body, i + size, 1, acc)
        case "trak" if depth == 1 =>
          walk(b, body, i + size, 2, acc)
        case "mvhd" if depth == 1 && size >= hdr + 20 =>
          val v = b(body.toInt) & 0xFF
          if (v == 1 && size >= hdr + 32) {
            val ts = be32(b, (body + 20).toInt)
            val dur = be64(b, (body + 24).toInt)
            if (ts > 0) acc.durationSec = dur.toDouble / ts
          } else if (v == 0) {
            val ts = be32(b, (body + 12).toInt)
            val dur = be32(b, (body + 16).toInt)
            if (ts > 0) acc.durationSec = dur.toDouble / ts
          }
        case "tkhd" if depth == 2 && acc.width == 0 =>
          val v = b(body.toInt) & 0xFF
          // width/height are the LAST 8 bytes of the box either version
          if (size >= hdr + (if (v == 1) 96 else 84)) {
            val wOff = i + size - 8
            val w = (be32(b, wOff.toInt) >> 16).toInt
            val h = (be32(b, (wOff + 4).toInt) >> 16).toInt
            if (w > 0 && h > 0) { acc.width = w; acc.height = h }
          }
        case _ =>
      }
      i += size
    }
  }

  /** public for generated code; null = not an ISO-BMFF container */
  def parse(b: Array[Byte]): InternalRow = {
    if (b.length < 12 || fourcc(b, 4) != "ftyp") return null
    val acc = new Acc
    walk(b, 0L, b.length.toLong, 0, acc)
    InternalRow(
      if (acc.brand == null) null else UTF8String.fromString(acc.brand),
      acc.durationSec,
      if (acc.width > 0) acc.width else null,
      if (acc.height > 0) acc.height else null)
  }

  override protected def nullSafeEval(v: Any): Any =
    parse(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftMp4Hdr", this,
      classOf[Mp4HeaderMeta].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.parse($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }
  override protected def withNewChildInternal(c: Expression): Mp4HeaderMeta =
    copy(child = c)
}

/**
 * MP3 stream metadata from the first frame HEADER — 4 bytes of sync +
 * table lookups, no audio decode (the JDK ships no MP3 codec; the
 * reference gets these fields via soundfile/ffprobe). Skips a leading
 * ID3v2 tag (synchsafe size), scans a bounded window for the frame sync,
 * and reads version/layer/bitrate/samplerate/channel-mode from the spec
 * tables (MPEG1/2/2.5 × Layer I/II/III). `est_duration_sec` is the CBR
 * estimate bytes·8/bitrate — exact for constant-bitrate streams, the
 * honest label for VBR. Null for anything without a valid frame sync.
 */
case class Mp3FrameMeta(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("version", StringType),
    StructField("layer", IntegerType),
    StructField("bitrate_kbps", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", StringType),
    StructField("est_duration_sec", DoubleType)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mp3_frame_meta"

  // bitrate kbps by [table][index-1]; tables: V1L1 V1L2 V1L3 V2L1 V2L23
  private val Bitrates: Array[Array[Int]] = Array(
    Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
  private val SampleRates: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000),  // MPEG1
    2 -> Array(22050, 24000, 16000),  // MPEG2
    0 -> Array(11025, 12000, 8000))   // MPEG2.5
  private val Channels = Array("stereo", "joint", "dual", "mono")

  /** public for generated code */
  def parse(b: Array[Byte]): InternalRow = {
    var i = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      i = 10 + sz
    }
    val end = math.min(b.length - 4, i + 2048)
    // scan for a VALID frame header, resuming past false syncs: 0xFF
    // padding after an ID3 tag looks like a sync word but decodes to
    // reserved version/bitrate fields — aborting there would silently
    // drop the real frame a few bytes later as "not MP3"
    var h1 = 0; var h2 = 0; var h3 = 0
    var found = false
    while (!found && i <= end && i + 3 < b.length) {
      if ((b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xE0) == 0xE0) {
        h1 = b(i + 1) & 0xFF
        h2 = b(i + 2) & 0xFF
        h3 = b(i + 3) & 0xFF
        val vb = (h1 >> 3) & 3
        val lb = (h1 >> 1) & 3
        val br = (h2 >> 4) & 0xF
        val sr = (h2 >> 2) & 3
        if (vb != 1 && lb != 0 && br != 0 && br != 15 && sr != 3)
          found = true
        else i += 1
      } else i += 1
    }
    if (!found) return null
    val verBits = (h1 >> 3) & 3    // 0=2.5, 2=2, 3=1 (1 reserved)
    val layerBits = (h1 >> 1) & 3  // 1=III, 2=II, 3=I (0 reserved)
    val brIdx = (h2 >> 4) & 0xF
    val srIdx = (h2 >> 2) & 3
    val layer = 4 - layerBits // 1, 2, 3
    val table =
      if (verBits == 3) layer - 1
      else if (layer == 1) 3
      else 4
    val kbps = Bitrates(table)(brIdx - 1)
    val sr = SampleRates(verBits)(srIdx)
    val version = verBits match {
      case 3 => "1"
      case 2 => "2"
      case _ => "2.5"
    }
    val durSec = (b.length - i).toDouble * 8.0 / (kbps * 1000.0)
    InternalRow(UTF8String.fromString(version), layer, kbps, sr,
      UTF8String.fromString(Channels((h3 >> 6) & 3)), durSec)
  }

  override protected def nullSafeEval(v: Any): Any =
    parse(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftMp3Hdr", this,
      classOf[Mp3FrameMeta].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.parse($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }
  override protected def withNewChildInternal(c: Expression): Mp3FrameMeta =
    copy(child = c)
}

/**
 * Matroska/WebM metadata from the EBML element tree — the second video
 * container beside [[Mp4HeaderMeta]], same no-codec posture: DocType
 * from the EBML header, duration from Segment>Info (Duration float ×
 * TimestampScale, default 10⁶ ns), and the first video track's
 * PixelWidth/Height from Segment>Tracks>TrackEntry>Video. Handles
 * variable-length IDs/sizes (1-8 bytes) and the streaming "unknown
 * size" form (all size bits set → element runs to the end). Null for
 * anything without the EBML magic.
 */
case class EbmlHeaderMeta(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType),
    StructField("duration_sec", DoubleType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ebml_header_meta"

  // element IDs with their marker bits, as the spec writes them
  private val EbmlHdr = 0x1A45DFA3L
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TsScale = 0x2AD7B1L
  private val Duration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val Video = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val Containers =
    Set(EbmlHdr, Segment, Info, Tracks, TrackEntry, Video)

  /** (value, bytesRead) of a varint at i; keepMarker for IDs. -1 length
    * on malformed input. */
  private def varint(b: Array[Byte], i: Long, keepMarker: Boolean): (Long, Int) = {
    if (i >= b.length) return (0L, -1)
    val first = b(i.toInt) & 0xFF
    val n = Integer.numberOfLeadingZeros(first) - 23 // 1..8 for 1xxx..00000001
    if (n < 1 || n > 8 || i + n > b.length) return (0L, -1)
    var v = (if (keepMarker) first else first & (0xFF >> n)).toLong
    var k = 1
    while (k < n) { v = (v << 8) | (b((i + k).toInt) & 0xFF); k += 1 }
    (v, n)
  }

  private final class Acc {
    var docType: String = null
    var tsScale = 1000000L // Matroska default: 1 ms
    var durationUnits: java.lang.Double = null
    var width = 0
    var height = 0
  }

  private def readUint(b: Array[Byte], from: Long, len: Long): Long = {
    var v = 0L
    var k = 0L
    while (k < len) { v = (v << 8) | (b((from + k).toInt) & 0xFF); k += 1 }
    v
  }

  private def walk(b: Array[Byte], from: Long, to: Long, acc: Acc): Unit = {
    var i = from
    while (i < to) {
      val (id, idLen) = varint(b, i, keepMarker = true)
      if (idLen < 0) return
      val (sz0, szLen) = varint(b, i + idLen, keepMarker = false)
      if (szLen < 0) return
      val body = i + idLen + szLen
      // all-ones size = unknown: element extends to the end of scope
      val unknown = sz0 == (1L << (7 * szLen)) - 1
      val sz = if (unknown) to - body else sz0
      if (sz < 0 || body + sz > to) return
      id match {
        case x if Containers(x) => walk(b, body, body + sz, acc)
        case DocType if acc.docType == null =>
          acc.docType = new String(b, body.toInt, sz.toInt, "ISO-8859-1")
            .takeWhile(_ != '\u0000') // spec allows null padding
        case TsScale => acc.tsScale = readUint(b, body, sz)
        case Duration if sz == 4 =>
          acc.durationUnits = java.lang.Float.intBitsToFloat(
            readUint(b, body, 4).toInt).toDouble
        case Duration if sz == 8 =>
          acc.durationUnits =
            java.lang.Double.longBitsToDouble(readUint(b, body, 8))
        case PixelWidth if acc.width == 0 =>
          acc.width = readUint(b, body, sz).toInt
        case PixelHeight if acc.height == 0 =>
          acc.height = readUint(b, body, sz).toInt
        case _ =>
      }
      i = body + sz
    }
  }

  /** public for generated code; null = no EBML magic */
  def parse(b: Array[Byte]): InternalRow = {
    if (b.length < 4 || (b(0) & 0xFF) != 0x1A || (b(1) & 0xFF) != 0x45 ||
        (b(2) & 0xFF) != 0xDF || (b(3) & 0xFF) != 0xA3) return null
    val acc = new Acc
    walk(b, 0L, b.length.toLong, acc)
    val dur: java.lang.Double =
      if (acc.durationUnits == null) null
      else acc.durationUnits * acc.tsScale / 1e9
    InternalRow(
      if (acc.docType == null) null else UTF8String.fromString(acc.docType),
      dur,
      if (acc.width > 0) acc.width else null,
      if (acc.height > 0) acc.height else null)
  }

  override protected def nullSafeEval(v: Any): Any =
    parse(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftEbmlHdr", this,
      classOf[EbmlHeaderMeta].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.parse($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }
  override protected def withNewChildInternal(c: Expression): EbmlHeaderMeta =
    copy(child = c)
}

/**
 * Rank of a STRING against a sorted boundary array in UTF-8 byte order
 * (count of bounds <= value, upper-bound binary search) — the string
 * twin of [[BoundsRank]], built for the binned string-envelope probe:
 * the driver bins file envelopes and the scan bins source keys through
 * the SAME object's `rank`, so bin assignment can never diverge between
 * the two sides (a divergent bin would silently skip a matching file in
 * a merge — a lost update). Boundaries ride Java serialization as plain
 * strings and lazily re-derive their UTF8String forms per executor.
 */
case class StringBoundsRank(child: Expression, bounds: Array[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(bounds != null && bounds.nonEmpty, "bounds must be non-empty")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "string_bounds_rank"

  @transient private lazy val ub: Array[UTF8String] =
    bounds.map(UTF8String.fromString)

  /** public for generated code: #bounds <= v in UTF-8 byte order. */
  def rank(v: UTF8String): Long = {
    var lo = 0
    var hi = ub.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ub(mid).compareTo(v) <= 0) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def nullSafeEval(v: Any): Any =
    rank(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSBounds", this,
      classOf[StringBoundsRank].getName)
    defineCodeGen(ctx, ev, c => s"$ref.rank($c)")
  }
  override protected def withNewChildInternal(c: Expression)
      : StringBoundsRank = copy(child = c)
}

/**
 * Rank of a value within a sorted driver-side bounds array: the count of
 * boundaries <= v, by binary search — the quantile-bucket kernel for
 * Z-order layouts. The `filter`-HOF formulation it replaces compared the
 * value against all 2^bits-1 boundaries AND allocated the filtered array
 * per row; this is log2 comparisons and zero allocation, one static-ish
 * call inside whole-stage codegen.
 */
case class BoundsRank(child: Expression, bounds: Array[Double])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(bounds != null && bounds.nonEmpty, "bounds must be non-empty")
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bounds_rank"

  /** public for generated code: #bounds <= v (upper-bound search, so
    * duplicate boundary values collapse into the highest bucket). */
  def rank(v: Double): Long = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def nullSafeEval(v: Any): Any =
    rank(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBounds", this, classOf[BoundsRank].getName)
    defineCodeGen(ctx, ev, c => s"$ref.rank($c)")
  }
  override protected def withNewChildInternal(c: Expression): BoundsRank =
    copy(child = c)
}

/**
 * Point frequency query against a pre-built broadcast Count–Min sketch
 * (spark-sketch serialized form, as produced by the `count_min_sketch`
 * aggregate). Same shape as [[BloomMightContain]]: the sketch bytes ride
 * the expression into the codegen references, deserialize once per
 * executor, and each probe is one virtual call inside whole-stage codegen.
 * This is the arbitrary-point-query complement to the Misra–Gries top-k
 * summary: a 100 TB term-count table collapses to a broadcastable
 * depth×width grid, estimates never undercount, and overcount is bounded
 * by eps·N with the configured confidence.
 */
case class CmsEstimateCount(child: Expression, cmsBytes: Array[Byte])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate_count"
  @transient private lazy val cms =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(cmsBytes))
  /** public for generated code — probes with the UTF8 bytes, matching the
    * aggregate's update path for string inputs */
  def test(v: org.apache.spark.unsafe.types.UTF8String): Long =
    cms.estimateCount(v.getBytes)
  override protected def nullSafeEval(v: Any): Any =
    test(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCms", this,
      classOf[CmsEstimateCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.test($c)")
  }
  override protected def withNewChildInternal(c: Expression): CmsEstimateCount =
    copy(child = c)
}

case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"
  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))
  /** public for generated code */
  def test(v: Long): Boolean = bloom.mightContainLong(v)
  override protected def nullSafeEval(v: Any): Any = test(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.test($c)")
  }
  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}
