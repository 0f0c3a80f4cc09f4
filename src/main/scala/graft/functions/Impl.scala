package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static evaluation helpers for graft's custom Catalyst expressions.
 *
 * Kept as static methods on an object so generated code (whole-stage
 * codegen) can call them with a single `staticInvoke`-style snippet —
 * the expression stays inside the codegen'd stage instead of falling
 * back to interpreted eval.
 *
 * Algorithms re-expressed from public sources:
 *  - intHash64: ClickHouse's IntHash64 finalizer (xor-shift-multiply,
 *    the same avalanche used by MurmurHash3/SplitMix64 family); the
 *    reference registers it as a SQLite UDF
 *    (reference: src/datachain/sql/sqlite/base.py:187-198).
 *  - sipHash64: SipHash-2-4 with a zero key over UTF-8 bytes, matching
 *    ClickHouse's `sipHash64` (reference exposes sip_hash_64 in
 *    src/datachain/func/array.py:382).
 *  - bit/byteHamming: reference src/datachain/sql/sqlite/base.py:199-215.
 */
object Impl {

  /** ClickHouse IntHash64: salt xor + Murmur-style 64-bit finalizer. */
  def intHash64(x0: Long): Long = {
    var x = x0 ^ 0x4CF2D2BAAE6DA887L
    x ^= x >>> 33
    x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33
    x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }

  /** Number of differing bits between two 64-bit values. */
  def bitHammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /**
   * Character-wise Hamming distance between two strings; a length
   * difference counts one per missing character.
   */
  def byteHammingDistance(au: UTF8String, bu: UTF8String): Int = {
    val a = au.toString
    val b = bu.toString
    val n = math.min(a.length, b.length)
    var diff = math.abs(a.length - b.length)
    var i = 0
    while (i < n) {
      if (a.charAt(i) != b.charAt(i)) diff += 1
      i += 1
    }
    diff
  }

  // ---------------------------------------------------------------- SipHash

  @inline private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

  /** SipHash-2-4, zero key, over the UTF-8 bytes of `s`. */
  def sipHash64(s: UTF8String): Long = sipHash64Bytes(s.getBytes)

  def sipHash64Bytes(data: Array[Byte]): Long = sipHash64Keyed(0L, 0L, data)

  /** SipHash-2-4 with an explicit 128-bit key (k0, k1) — validated against
    * the reference vectors from the SipHash paper (Aumasson & Bernstein). */
  def sipHash64Keyed(k0: Long, k1: Long, data: Array[Byte]): Long = {
    var v0 = 0x736f6d6570736575L ^ k0
    var v1 = 0x646f72616e646f6dL ^ k1
    var v2 = 0x6c7967656e657261L ^ k0
    var v3 = 0x7465646279746573L ^ k1

    @inline def sipRound(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    val n = data.length
    val end = n - (n % 8)
    var i = 0
    while (i < end) {
      var m = 0L
      var j = 7
      while (j >= 0) { m = (m << 8) | (data(i + j) & 0xffL); j -= 1 }
      v3 ^= m
      sipRound(); sipRound()
      v0 ^= m
      i += 8
    }
    var last = (n.toLong & 0xffL) << 56
    var j = n - 1
    while (j >= end) { last |= (data(j) & 0xffL) << (8 * (j - end)); j -= 1 }
    v3 ^= last
    sipRound(); sipRound()
    v0 ^= last
    v2 ^= 0xff
    sipRound(); sipRound(); sipRound(); sipRound()
    v0 ^ v1 ^ v2 ^ v3
  }

  // ------------------------------------------------------- vector distances

  /**
   * Engine-exact squared euclidean distance over double vectors: each
   * squared difference is rounded to 12 dp through the SAME BigDecimal
   * path Spark's `round(x, 12)` uses (valueOf → setScale HALF_UP), summed
   * exactly in decimal, and the total converted back to double. This is
   * the compiled kernel behind [[graft.ops.Similarity.kmeans]] — one
   * virtual call per row pair whether or not the surrounding operator is
   * whole-stage-codegen'd (the k-means assignment join isn't), versus the
   * equivalent zip_with/aggregate HOF composition's per-element lambda
   * interpretation, measured ~5× slower end-to-end; the result is
   * bit-identical, so the unrolled SQL oracle is unaffected.
   */
  /** Sign-bit matrices for [[jlProject]], keyed (outDim, dims): row j is
    * a bitset over i with bit set ⇔ s(j,i) = +1. Built once per
    * (outDim, dims) per JVM — the hash is pure, so a benign build race
    * just computes the same array twice. */
  private val jlSigns =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Long]]]()

  private def jlSignMatrix(outDim: Int, dims: Int): Array[Array[Long]] =
    jlSigns.computeIfAbsent((outDim, dims), { _ =>
      Array.tabulate(outDim) { j =>
        val words = new Array[Long]((dims + 63) >> 6)
        var i = 0
        while (i < dims) {
          if ((intHash64(j.toLong * 131071L + i) & 1L) == 1L)
            words(i >> 6) |= 1L << (i & 63)
          i += 1
        }
        words
      }
    })

  /**
   * Deterministic ±1 JL projection kernel (see
   * `graft.ops.Similarity.randomProjection` for the op contract). The
   * decimal-exact arithmetic runs entirely in SCALED LONGS: each term is
   * round(x_i, 12) carried as x·10^12 (exact for |x| < 9·10^6 — far
   * beyond any embedding coordinate), the per-coordinate sum is plain
   * long addition (order-independent, no decimal objects), the 9-dp
   * HALF_UP round is `(|sum|+500)/1000` away from zero, and the final
   * /10^9 plus 1/√outDim scale are two exact-then-correctly-rounded IEEE
   * steps — bit-identical to the BigDecimal formulation it replaces,
   * ~50× cheaper per row.
   */

  /** Loud guard for vector kernels: ArrayData.getFloat/getDouble on a
    * NULL slot silently reads 0.0 (the zeroed value region / unboxed
    * null), which would turn a corrupt embedding into a plausible but
    * wrong distance. Parquet-read arrays are containsNull=true, so the
    * check must live at runtime. One predictable branch per element. */
  @inline private def nn(a: ArrayData, i: Int): Unit =
    if (a.isNullAt(i))
      throw new IllegalArgumentException(
        s"null element at index $i in vector argument")

  def jlProject(v: ArrayData, outDim: Int): ArrayData = {
    val n = v.numElements()
    val terms = new Array[Long](n)
    var i = 0
    while (i < n) {
      nn(v, i) // fail-loud on a null slot, like every other vector kernel
      terms(i) = java.math.BigDecimal.valueOf(v.getDouble(i))
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .movePointRight(12).longValueExact()
      i += 1
    }
    val signs = jlSignMatrix(outDim, n)
    val invScale = 1.0 / math.sqrt(outDim.toDouble)
    val out = new Array[Any](outDim)
    var j = 0
    while (j < outDim) {
      val row = signs(j)
      var sum = 0L
      i = 0
      while (i < n) {
        if ((row(i >> 6) >>> (i & 63) & 1L) == 1L) sum += terms(i)
        else sum -= terms(i)
        i += 1
      }
      val q = if (sum >= 0L) (sum + 500L) / 1000L else -((-sum + 500L) / 1000L)
      out(j) = (q.toDouble / 1e9) * invScale
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def decimalSqDist(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vector length mismatch: $n vs ${b.numElements()}")
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      nn(a, i); nn(b, i)
      val d = a.getDouble(i) - b.getDouble(i)
      acc = acc.add(java.math.BigDecimal.valueOf(d * d)
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  /**
   * SQ8 scalar quantization: per-dimension linear int8 code
   * round((x - min_d) / scale_d) clamped to [0, 255], packed as one byte
   * per dimension — 4× smaller than float32, the standard first
   * compression tier of production ANN (below it sits the 32× sign-bit
   * signature, [[simHash64]]-style). `scale_d = (max_d - min_d)/255`; a
   * degenerate dimension (scale 0) codes to 0. HALF_UP rounding through
   * floor(v + 0.5) — identical to SQL `round(v)` for the non-negative v
   * this produces.
   */
  def sq8Encode(v: ArrayData, mins: Array[Double],
                scales: Array[Double]): Array[Byte] = {
    val n = v.numElements()
    require(n == mins.length, s"vector length mismatch: $n vs ${mins.length}")
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      nn(v, i) // fail-loud on a null slot, like every other vector kernel
      val c =
        if (scales(i) == 0.0) 0
        else {
          val r = math.floor((v.getDouble(i) - mins(i)) / scales(i) + 0.5).toInt
          if (r < 0) 0 else if (r > 255) 255 else r
        }
      out(i) = c.toByte
      i += 1
    }
    out
  }

  /**
   * Asymmetric (query-vs-code) SQ8 distance: dequantize each byte
   * (min_d + code*scale_d) and accumulate the squared differences against
   * the full-precision query through the same 12-dp decimal path as
   * [[decimalSqDist]] — engine-exact, so a SQL oracle reproducing the
   * arithmetic hash-matches bit-for-bit.
   */
  def sq8Dist(q: ArrayData, codes: Array[Byte], mins: Array[Double],
              scales: Array[Double]): Double = {
    val n = q.numElements()
    require(n == codes.length, s"vector length mismatch: $n vs ${codes.length}")
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      nn(q, i) // fail-loud on a null slot, like every other vector kernel
      val deq = mins(i) + (codes(i) & 0xFF) * scales(i)
      val d = q.getDouble(i) - deq
      acc = acc.add(java.math.BigDecimal.valueOf(d * d)
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  /** Cosine distance (1 - cosine similarity) between two float vectors. */
  def cosineDistanceFloat(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vector length mismatch: $n vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      nn(a, i); nn(b, i)
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0
    else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Euclidean (L2) distance between two float vectors. */
  def euclideanDistanceFloat(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vector length mismatch: $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      nn(a, i); nn(b, i)
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  /** Dot product between two float vectors (ANN scoring kernel). */
  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) { nn(a, i); nn(b, i)
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  /** L2 norm of a float vector. */
  def normFloat(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { nn(a, i); val x = a.getFloat(i).toDouble; acc += x * x; i += 1 }
    math.sqrt(acc)
  }

  // ------------------------------------------------------------- text hashes

  /** Normalized text: lowercase, whitespace collapsed to single spaces. */
  def normalize(text: UTF8String): String = {
    val s = text.toString.trim.toLowerCase
    val sb = new java.lang.StringBuilder(s.length)
    var prevWs = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) {
        if (!prevWs && sb.length > 0) sb.append(' ')
        prevWs = true
      } else { sb.append(c); prevWs = false }
      i += 1
    }
    var n = sb.length
    if (n > 0 && sb.charAt(n - 1) == ' ') sb.setLength(n - 1)
    sb.toString
  }

  /**
   * Distinct overlapping character n-grams of the normalized text, first-
   * occurrence order. Single pass + hash set — the codegen'd kernel behind
   * [[graft.ops.TextAnalysis.charNgrams]] (the equivalent
   * transform/sequence/array_distinct composition runs interpreted inside
   * Spark's higher-order functions and measured ~10× slower).
   */
  def charNgrams(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = normalize(text)
    val out = new java.util.LinkedHashSet[String]()
    var i = 0
    val end = s.length - n
    while (i <= end) { out.add(s.substring(i, i + n)); i += 1 }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /**
   * MinHash signature in one pass: whitespace tokens → w-token shingles
   * (distinct) → sipHash64 per shingle → k running minima of
   * intHash64(h ^ seed). No intermediate Catalyst arrays.
   */
  def minhashSignature(text: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = normalize(text).split(' ')
    val n = toks.length
    // Tokens are sipHash64'd ONCE; a shingle's hash is a polynomial roll of
    // its token hashes — no shingle string is ever materialized. Duplicate
    // shingles need no dedup set: re-feeding a value cannot change a
    // running minimum. The k permutation values stay INDEPENDENT
    // intHash64(h ^ s) chains on purpose: double-hashing shortcuts
    // (h1 + s*h2) correlate the minima across s — two docs sharing one
    // low-hash shingle then collide on whole BANDS, band-match probability
    // inflates from j^bandRows toward j, and LSH buckets go quadratic
    // (observed: 8x corpus went 13x wall instead of ~1.5x).
    val th = new Array[Long](n)
    var t = 0
    while (t < n) { th(t) = sipHash64Bytes(toks(t).getBytes("UTF-8")); t += 1 }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val nSh = math.max(n - (w - 1), 0)
    def update(h: Long): Unit = {
      var s = 0
      while (s < k) {
        val v = intHash64(h ^ s.toLong)
        if (v < mins(s)) mins(s) = v
        s += 1
      }
    }
    def roll(from: Int, len: Int): Long = {
      var h = 0L
      var j = 0
      while (j < len) { h = h * 0xc2b2ae3d27d4eb4fL + th(from + j); j += 1 }
      h
    }
    if (nSh < 1) { if (n > 0) update(roll(0, n)) else update(0L) }
    else {
      var i = 0
      while (i < nSh) { update(roll(i, w)); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(java.lang.Long.valueOf(_): Any))
  }

  /**
   * SimHash-64 over whitespace tokens: each token is sipHash64'd; bit i of
   * the result is 1 iff the sum over tokens of (+1 / -1 for bit i set/unset)
   * is positive. Near-duplicate texts land within a few bits of each other.
   */
  def simHash64(text: UTF8String): Long = {
    val tokens = text.toString.toLowerCase.split("\\s+")
    val acc = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      if (tokens(t).nonEmpty) {
        val h = sipHash64Bytes(tokens(t).getBytes("UTF-8"))
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /**
   * SimHash-64 over DISTINCT character n-gram shingles of the normalized
   * text (same normalization as [[charNgrams]]). Shingle features make the
   * fingerprint far less sensitive than word tokens on short documents: a
   * doc pair sharing 90% of shingles typically lands within 2-4 bits,
   * versus ~10 for token features — which lets banded hamming search use a
   * small radius and fine buckets at scale.
   */
  def simHash64Shingles(text: UTF8String, n: Int): Long = {
    val s = normalize(text)
    val seen = new java.util.HashSet[String]()
    val acc = new Array[Int](64)
    var i = 0
    val end = s.length - n
    while (i <= end) {
      val gram = s.substring(i, i + n)
      if (seen.add(gram)) {
        val h = sipHash64Bytes(gram.getBytes("UTF-8"))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}
