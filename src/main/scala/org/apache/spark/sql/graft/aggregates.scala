package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra–Gries heavy-hitters summary as a native Catalyst aggregate
 * (`TypedImperativeAggregate`, the same machinery as Spark's own
 * `BloomFilterAggregate`/`percentile_approx`): per-partition summaries of
 * at most `capacity` counters partial-aggregate map-side and MERGE
 * losslessly in the Agarwal et al. "Mergeable Summaries" (PODS'12) sense,
 * so only O(capacity) state crosses the shuffle per group no matter how
 * many rows feed it — the frequent-items shape that an exact
 * count-then-sort cannot match once the key space outgrows memory.
 *
 * Guarantees (standard MG): every returned count is an UNDERCOUNT by at
 * most N/(capacity+1), where N is the group's item count; any item with
 * true frequency > N/(capacity+1) is guaranteed present. When the group's
 * distinct-item count never exceeds `capacity`, no decrements fire anywhere
 * and every count is EXACT regardless of row or merge order — the regime
 * the correctness gate pins (the oracle recomputes exact counts in SQL).
 *
 * Output: the `topK` surviving counters as array<struct<item, count>>,
 * sorted by (count desc, item asc) — fully deterministic.
 */
case class MisraGriesTopK(
    child: Expression,
    capacity: Int,
    topK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

  require(capacity > 0 && topK > 0, "capacity and topK must be positive")

  override def prettyName: String = "heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1L)
        case None if buf.size < capacity =>
          // own the bytes: the input UTF8String may point into a reused
          // row buffer, and a map key must outlive the current row
          buf.update(key.clone(), 1L)
        case None =>
          // classic MG overflow: decrement every counter, drop zeros.
          // O(capacity) per overflow EVENT, but each decrement pays for
          // one prior insert — amortized O(1) per row
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.keysIterator.foreach { k =>
            val c = buf(k) - 1L
            if (c == 0L) dead += k else buf.update(k, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      // mergeable-summaries reduction: subtract the (capacity+1)-th
      // largest count from everything, keep the strictly-positive rest —
      // the error bound telescopes across any merge tree, so the final
      // summary is order-independent up to the documented undercount
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.keysIterator.foreach { k =>
        val c = buf(k) - cut
        if (c <= 0L) dead += k else buf.update(k, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((ka, ca), (kb, cb)) =>
      if (ca != cb) ca > cb else ka.compareTo(kb) < 0
    }
    new GenericArrayData(sorted.take(topK).map { case (k, c) =>
      InternalRow(k, c): Any
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MisraGriesTopK =
    copy(child = c)
}

/** Mutable state of [[KllQuantiles]]: a KLL/MRL-style multi-level sampler.
  * `levels(i)` holds items of weight 2^i; `n` is the total (weighted) item
  * count; `flip` alternates the deterministic compaction offset so
  * successive compactions don't systematically favor one parity. */
final class QuantileSketchBuffer {
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])
  var flip: Boolean = false
  var n: Long = 0L
}

/** Shared machinery of [[KllQuantiles]] and [[KllQuantilesWeighted]]:
  * compaction, merge, quantile walk, and serde over
  * [[QuantileSketchBuffer]] — one implementation so the weighted variant
  * cannot drift from the gated unweighted one. */
private[graft] object QuantileSketchOps {

  /** Sort level `level`, promote every other item (alternating parity) to
    * level+1 at doubled weight, keep an odd straggler in place; cascade
    * upward while buffers overflow. Total weight is preserved exactly. */
  def compact(buf: QuantileSketchBuffer, level: Int, k: Int): Unit = {
    val cur = buf.levels(level)
    val arr = cur.toArray
    java.util.Arrays.sort(arr)
    if (buf.levels.size <= level + 1)
      buf.levels += mutable.ArrayBuffer.empty[Double]
    val next = buf.levels(level + 1)
    val off = if (buf.flip) 1 else 0
    buf.flip = !buf.flip
    val pairs = arr.length / 2
    var i = 0
    while (i < pairs) { next += arr(2 * i + off); i += 1 }
    cur.clear()
    if (arr.length % 2 == 1) cur += arr(arr.length - 1)
    if (next.size >= k) compact(buf, level + 1, k)
  }

  def merge(buf: QuantileSketchBuffer, other: QuantileSketchBuffer,
            k: Int): QuantileSketchBuffer = {
    var lvl = 0
    while (lvl < other.levels.size) {
      if (buf.levels.size <= lvl)
        buf.levels += mutable.ArrayBuffer.empty[Double]
      buf.levels(lvl) ++= other.levels(lvl)
      lvl += 1
    }
    buf.n += other.n
    var i = 0
    while (i < buf.levels.size) {
      if (buf.levels(i).size >= k) compact(buf, i, k)
      i += 1
    }
    buf
  }

  /** Discrete lower quantiles: smallest value whose cumulative weighted
    * count >= ceil(q*n), clamped to >= 1. Null on an empty buffer. */
  def eval(buf: QuantileSketchBuffer, probs: Seq[Double]): Any = {
    if (buf.n == 0L) return null
    var m = 0
    buf.levels.foreach(l => m += l.size)
    val vals = new Array[Double](m)
    val wts = new Array[Long](m)
    var idx = 0
    var lvl = 0
    while (lvl < buf.levels.size) {
      val w = 1L << lvl
      buf.levels(lvl).foreach { v => vals(idx) = v; wts(idx) = w; idx += 1 }
      lvl += 1
    }
    val order = (0 until m).sortBy(vals(_)).toArray
    val out = probs.map { q =>
      val target = math.max(1L, math.ceil(q * buf.n).toLong)
      var cum = 0L
      var j = 0
      var ans = vals(order(m - 1))
      var found = false
      while (j < m && !found) {
        cum += wts(order(j))
        if (cum >= target) { ans = vals(order(j)); found = true }
        j += 1
      }
      ans: Any
    }
    new GenericArrayData(out.toArray)
  }

  def serialize(buf: QuantileSketchBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.flip)
    out.writeLong(buf.n)
    out.writeInt(buf.levels.size)
    buf.levels.foreach { l =>
      out.writeInt(l.size)
      l.foreach(out.writeDouble)
    }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): QuantileSketchBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new QuantileSketchBuffer
    buf.flip = in.readBoolean()
    buf.n = in.readLong()
    val nLevels = in.readInt()
    buf.levels.clear()
    var i = 0
    while (i < nLevels) {
      val sz = in.readInt()
      val l = new mutable.ArrayBuffer[Double](math.max(sz, 4))
      var j = 0
      while (j < sz) { l += in.readDouble(); j += 1 }
      buf.levels += l
      i += 1
    }
    if (buf.levels.isEmpty) buf.levels += mutable.ArrayBuffer.empty[Double]
    buf
  }
}

/**
 * Mergeable quantile sketch as a native Catalyst aggregate — the 100 TB
 * profiling primitive next to [[MisraGriesTopK]]: per-partition summaries
 * of O(k·log(n/k)) doubles partial-aggregate map-side and merge
 * associatively, where the exact `percentile` alternative is a full sort
 * of the column per group.
 *
 * Structure (KLL, Karnin–Lang–Liberty FOCS'16, with the deterministic
 * MRL-style compactor of Manku–Rajagopalan–Lindsay SIGMOD'98): each level
 * holds items of weight 2^level in a buffer of capacity `k`; a full
 * buffer sorts, promotes every other item to the next level (the kept
 * parity alternates via a flip bit — deterministic, no RNG, so a given
 * update/merge order reproduces exactly), and keeps an odd straggler in
 * place. Rank error after any merge tree is bounded by
 * ~1.5·H/k · n where H = #levels ≈ log2(n/k) — the property test pins an
 * empirical bound well inside that.
 *
 * EXACT REGIME (what the correctness gate pins): while a group's total
 * item count stays ≤ k, no compaction fires anywhere — level 0 is the
 * full sorted multiset and every quantile is exact, independent of row
 * and merge order. Query convention: quantile(q) = the smallest value
 * whose cumulative (weighted) count ≥ ceil(q·n) (clamped to ≥1) — the
 * discrete lower quantile, reproducible in ANSI SQL as the value at
 * row_number ceil(q·n) of the sorted group.
 *
 * Output: array<double>, one entry per requested probability (null on an
 * empty/all-null group).
 */
case class KllQuantiles(
    child: Expression,
    probs: Seq[Double],
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketchBuffer]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
    with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)

  require(k >= 8, "k must be at least 8")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    "probabilities must be in [0, 1]")

  override def prettyName: String = "kll_quantiles"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType)

  override def createAggregationBuffer(): QuantileSketchBuffer =
    new QuantileSketchBuffer

  override def update(buf: QuantileSketchBuffer,
                      input: InternalRow): QuantileSketchBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.levels(0) += v.asInstanceOf[Double]
      buf.n += 1L
      if (buf.levels(0).size >= k) compact(buf, 0)
    }
    buf
  }

  private def compact(buf: QuantileSketchBuffer, level: Int): Unit =
    QuantileSketchOps.compact(buf, level, k)

  override def merge(buf: QuantileSketchBuffer,
                     other: QuantileSketchBuffer): QuantileSketchBuffer =
    QuantileSketchOps.merge(buf, other, k)

  override def eval(buf: QuantileSketchBuffer): Any =
    QuantileSketchOps.eval(buf, probs)

  override def serialize(buf: QuantileSketchBuffer): Array[Byte] =
    QuantileSketchOps.serialize(buf)

  override def deserialize(bytes: Array[Byte]): QuantileSketchBuffer =
    QuantileSketchOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllQuantiles =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): KllQuantiles =
    copy(child = c)
}

/**
 * Exact per-group top-k selection as a native Catalyst AGGREGATE: a
 * bounded heap whose O(k) state partial-aggregates map-side and merges
 * associatively. Honest positioning vs the `row_number() OVER (...) <= k`
 * window idiom: modern Spark's rank-limit pushdown (WindowGroupLimit,
 * SPARK-37099) already bounds that route's shuffle too, so on a plain
 * batch top-k the two are comparable (the ScaleProbe `topk` case measures
 * both, plus the pushdown-disabled cost any unmatched rank pattern pays).
 * What the AGGREGATE form uniquely buys is composition: it runs inside a
 * `groupBy().agg(...)` BESIDE other aggregates in the same single pass
 * (the window route needs its own shuffle plus a join back), and it is
 * legal in STREAMING aggregations — its serialized buffer rides the state
 * store like any mergeable summary — where window functions are not
 * (q_stream_topk pins that). With `score = xxhash64(item)` it doubles as
 * a deterministic uniform group sampler (bottom-k-by-hash).
 *
 * Semantics: keep the k rows with the largest (score, then smallest item)
 * — the tie-break makes the result fully deterministic and independent of
 * row order, partitioning, and merge shape, which is what lets a DuckDB
 * window oracle reproduce it bit-for-bit. Rows with a null score or null
 * item are ignored. Duplicate (score, item) pairs count as distinct rows.
 *
 * Output: array<struct<score double, item string>> sorted by
 * (score desc, item asc).
 */
case class TopKRows(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, UTF8String)]]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, StringType)
  override def prettyName: String = "topk_rows"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("item", StringType))))

  /** Max-heap whose head is the WORST kept row (lowest score; on a score
    * tie, the lexically largest item), so a better candidate replaces the
    * head in O(log k). */
  private def worstFirst: Ordering[(Double, UTF8String)] =
    new Ordering[(Double, UTF8String)] {
      override def compare(a: (Double, UTF8String),
                           b: (Double, UTF8String)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, UTF8String)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, UTF8String)],
                    score: Double, item: UTF8String, owned: Boolean): Unit = {
    if (buf.size < k) {
      buf.enqueue((score, if (owned) item else item.clone()))
    } else {
      // head is the worst kept row; candidate wins if strictly better
      // under (score desc, item asc) — Double.compare keeps ±0.0 ordered
      // the same way worstFirst and the eval sort do
      val (ws, wi) = buf.head
      val sc = java.lang.Double.compare(score, ws)
      val better = sc > 0 || (sc == 0 && item.compareTo(wi) < 0)
      if (better) {
        buf.dequeue()
        buf.enqueue((score, if (owned) item else item.clone()))
      }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, UTF8String)],
                      input: InternalRow): mutable.PriorityQueue[(Double, UTF8String)] = {
    val s = left.eval(input)
    val i = right.eval(input)
    // NaN scores are skipped like nulls: they have no place in a ranked
    // top-k, and under `>`-based comparison a NaN that slipped into the
    // heap while size < k would make the eval sort's comparator
    // inconsistent (TimSort can throw)
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double])) {
      // clone only on insert: the UTF8String may point into a reused row
      // buffer, and compare-and-reject needs no copy
      offer(buf, s.asInstanceOf[Double], i.asInstanceOf[UTF8String], owned = false)
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, UTF8String)],
                     other: mutable.PriorityQueue[(Double, UTF8String)])
      : mutable.PriorityQueue[(Double, UTF8String)] = {
    other.foreach { case (s, i) => offer(buf, s, i, owned = true) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, UTF8String)]): Any = {
    // java.lang.Double.compare gives the total order worstFirst uses —
    // sortWith on raw >/!= would be an inconsistent comparator if a NaN
    // or mixed ±0.0 ever reached the buffer
    val arr = buf.toArray.sortWith { case ((sa, ia), (sb, ib)) =>
      val c = java.lang.Double.compare(sa, sb)
      if (c != 0) c > 0 else ia.compareTo(ib) < 0
    }
    new GenericArrayData(arr.map { case (s, i) => InternalRow(s, i): Any })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) =>
      out.writeDouble(s)
      val b = i.getBytes
      out.writeInt(b.length); out.write(b)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.enqueue((s, UTF8String.fromBytes(b)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKRows =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRows =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKRows =
    copy(left = newLeft, right = newRight)
}

/**
 * Weight-aware [[KllQuantiles]]: each row carries an integer weight w,
 * decomposed into its binary expansion — for every set bit b of w the
 * value inserts once at level b (weight 2^b) — so total weight is
 * preserved EXACTLY with O(log w) inserts per row, and compaction /
 * merge / query are byte-identical to the unweighted sketch
 * ([[QuantileSketchOps]] is shared). The weighted quantile convention
 * matches the unweighted one: the smallest value whose cumulative
 * WEIGHT reaches ceil(q·W). Token-weighted length/quality percentiles
 * over a corpus are the motivating shape — "the p99 document by token
 * mass", not by document count. EXACT while no level overflows k
 * (inserts per level are bounded by the row count, so the oracle-able
 * regime is the same as the unweighted gate's); rows with null/
 * non-positive weight or null value are skipped.
 */
case class KllQuantilesWeighted(
    left: Expression,
    right: Expression,
    probs: Seq[Double],
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketchBuffer]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)

  require(k >= 8, "k must be at least 8")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    "probabilities must be in [0, 1]")

  override def prettyName: String = "kll_quantiles_weighted"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType)

  override def createAggregationBuffer(): QuantileSketchBuffer =
    new QuantileSketchBuffer

  override def update(buf: QuantileSketchBuffer,
                      input: InternalRow): QuantileSketchBuffer = {
    val v = left.eval(input)
    val wAny = right.eval(input)
    if (v != null && wAny != null) {
      val w = wAny.asInstanceOf[Long]
      if (w > 0L) {
        val x = v.asInstanceOf[Double]
        var ww = w
        var b = 0
        while (ww != 0L) {
          if ((ww & 1L) == 1L) {
            while (buf.levels.size <= b)
              buf.levels += mutable.ArrayBuffer.empty[Double]
            buf.levels(b) += x
            if (buf.levels(b).size >= k) QuantileSketchOps.compact(buf, b, k)
          }
          ww >>>= 1
          b += 1
        }
        buf.n += w
      }
    }
    buf
  }

  override def merge(buf: QuantileSketchBuffer,
                     other: QuantileSketchBuffer): QuantileSketchBuffer =
    QuantileSketchOps.merge(buf, other, k)

  override def eval(buf: QuantileSketchBuffer): Any =
    QuantileSketchOps.eval(buf, probs)

  override def serialize(buf: QuantileSketchBuffer): Array[Byte] =
    QuantileSketchOps.serialize(buf)

  override def deserialize(bytes: Array[Byte]): QuantileSketchBuffer =
    QuantileSketchOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KllQuantilesWeighted =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllQuantilesWeighted =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantilesWeighted =
    copy(left = newLeft, right = newRight)
}

/**
 * Bloom filter over 64-bit keys as a native mergeable aggregate — the
 * per-GROUP bloom builder `DataFrame.stat.bloomFilter` (one whole-frame
 * job) cannot be: grouping by `input_file_name()` yields one filter per
 * data FILE in a single pass, which is the catalog's file-level bloom
 * index for equality pruning (Delta-style) on columns whose per-file
 * min/max ranges overlap. Wraps Spark's own
 * `org.apache.spark.util.sketch.BloomFilter`, so `might_contain`
 * semantics match `stat.bloomFilter` exactly; callers feed `xxhash64`
 * keys (hash once, putLong — never the raw strings).
 *
 * Output: the filter's serialized bytes (binary).
 */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[org.apache.spark.util.sketch.BloomFilter]
    with UnaryLike[Expression] {

  require(expectedItems > 0 && fpp > 0 && fpp < 1,
    "need expectedItems > 0 and 0 < fpp < 1")

  override def prettyName: String = "bloom_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)

  override def update(buf: org.apache.spark.util.sketch.BloomFilter,
                      input: InternalRow): org.apache.spark.util.sketch.BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: org.apache.spark.util.sketch.BloomFilter,
                     other: org.apache.spark.util.sketch.BloomFilter)
      : org.apache.spark.util.sketch.BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: org.apache.spark.util.sketch.BloomFilter): Any =
    serialize(buf)

  override def serialize(buf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): BloomAgg =
    copy(child = c)
}
