package graft.io

/**
 * Hilbert space-filling curve kernels — the locality-maximal alternative
 * to [[Layout]]'s Morton/Z-order interleave for multi-dimensional file
 * clustering. Both curves map an N-d bucket grid onto one sort key so a
 * range-partitioned write gives every file a narrow min/max envelope on
 * every dimension; the Hilbert curve's edge is that CONSECUTIVE curve
 * positions are always GRID-ADJACENT cells (unit L1 steps, no Morton
 * "jumps" across the grid at quadrant boundaries), so contiguous curve
 * ranges — which is exactly what range-partitioned files are — cover
 * compact, connected regions. Every curve-prefix block is a compact
 * quadrant subtree, and measured on the same data the per-file envelopes
 * come out at-most-as-wide as Z-order's on every dimension (OpsSpec pins
 * the comparison on a deterministic fixture). Same cost shape as
 * Z-order: a pure codegen'd per-row projection, no UDF, no lookup table,
 * no shuffle beyond the sorted write's own range exchange.
 *
 * Two kernels, both exact int64 arithmetic:
 *  - [[index2]]/[[coords2]] — the classic iterative 2-D transform
 *    (quadrant reflect+rotate, one loop over bit planes; the textbook
 *    `xy2d` formulation). The loop carries only (x, y, s, d) scalar
 *    state, so a SQL engine replays it verbatim with a recursive CTE —
 *    that is what lets the driver's DuckDB oracle re-derive every
 *    Hilbert value bit-for-bit (the `q_hilbert` gate).
 *  - [[indexN]]/[[coordsN]] — Skilling's transpose algorithm (John
 *    Skilling, "Programming the Hilbert curve", AIP Conf. Proc. 707,
 *    2004): Gray-code the axes in place with O(n·bits) word ops, then
 *    bit-interleave. Handles any dimension count with n·bits ≤ 63 —
 *    the production path for ZORDER-BY-style multi-column layout.
 *    Scalacheck pins bijectivity (index ∘ coords ≡ id on random
 *    indices), the inverse round-trip, and the defining unit-step
 *    property (|coords(d+1) − coords(d)|₁ == 1).
 *
 * The 2-D curves of the two kernels are both Hilbert curves but
 * DIFFERENT orientations (reflections of each other) — they are never
 * mixed: [[Layout.hilbertFrame]] (oracle-exact linear bins) uses
 * [[index2]], [[Layout.hilbertFrameQuantileN]] (production quantile
 * bins) uses [[indexN]] for any N including 2.
 */
object Hilbert {

  /** Hilbert index of grid cell (x, y) on the 2^bits × 2^bits grid —
    * the classic reflect+rotate loop, most-significant plane first.
    * Exact for bits ≤ 31 (d < 2^62). Public static so generated code
    * calls it directly (one static call inside whole-stage codegen). */
  def index2(x0: Long, y0: Long, bits: Int): Long = {
    require(bits >= 1 && bits <= 31, s"hilbert index2 bits in [1,31], got $bits")
    val n = 1L << bits
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the quadrant so the sub-curve enters/exits correctly
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse of [[index2]]: the (x, y) cell at curve position `d`. Used
    * by the locality pins and by tooling that maps file boundaries back
    * to grid regions; not on any hot path. */
  def coords2(d0: Long, bits: Int): (Long, Long) = {
    val n = 1L << bits
    var x = 0L
    var y = 0L
    var d = d0
    var s = 1L
    while (s < n) {
      val rx = (d / 2) & 1
      val ry = (d ^ rx) & 1
      // rotate back
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      x += s * rx
      y += s * ry
      d /= 4
      s <<= 1
    }
    (x, y)
  }

  /** Hilbert index of the N-d grid cell `coords` (each in [0, 2^bits)):
    * Skilling's axes→transpose Gray-coding followed by a bit
    * interleave with axis 0 owning the most significant bit of every
    * plane group. n·bits must fit 63 bits. The input array is not
    * mutated. */
  def indexN(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    require(n >= 2, s"hilbert indexN needs >= 2 dims, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"hilbert indexN: $n dims x $bits bits must fit 63 bits")
    val x = java.util.Arrays.copyOf(coords, n)
    val m = 1L << (bits - 1)
    // inverse undo (most significant plane down to plane 1)
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transpose: bit b of axis i -> index bit b*n+(n-1-i)
    var out = 0L
    i = 0
    while (i < n) {
      var b = 0
      while (b < bits) {
        out |= ((x(i) >> b) & 1L) << (b * n + (n - 1 - i))
        b += 1
      }
      i += 1
    }
    out
  }

  /** Inverse of [[indexN]]: the N-d cell at curve position `d`
    * (Skilling's transpose→axes). Locality/bijectivity pins + tooling. */
  def coordsN(d: Long, n: Int, bits: Int): Array[Long] = {
    require(n >= 2 && bits >= 1 && n * bits <= 63,
      s"hilbert coordsN: $n dims x $bits bits must fit 63 bits")
    // de-interleave into the transpose
    val x = new Array[Long](n)
    var i = 0
    while (i < n) {
      var b = 0
      while (b < bits) {
        x(i) |= ((d >> (b * n + (n - 1 - i))) & 1L) << b
        b += 1
      }
      i += 1
    }
    val m = 2L << (bits - 1)
    // Gray decode
    var t = x(n - 1) >> 1
    i = n - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    // undo excess work (plane 1 up to the most significant)
    var q = 2L
    while (q != m) {
      val p = q - 1
      i = n - 1
      while (i >= 0) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i -= 1
      }
      q <<= 1
    }
    x
  }

  /** [[indexN]] over catalyst ArrayData — the codegen entry point. */
  def indexNArray(a: org.apache.spark.sql.catalyst.util.ArrayData,
                  bits: Int): Long =
    indexN(a.toLongArray(), bits)
}
