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
