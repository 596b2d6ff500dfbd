package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters: the classic bounded-state frequent-items
  * sketch as a native aggregate — at most `k` counters per buffer, so
  * map-side partials stay O(k) no matter how many rows a partition
  * holds (the groupBy-count alternative shuffles one row per DISTINCT
  * item — unbounded on a web-scale token stream).
  *
  * Guarantees (Misra–Gries 1982; merge from Agarwal et al.,
  * "Mergeable Summaries", PODS'12): every estimate is an UNDERCOUNT by
  * at most n/(k+1), and any item with true frequency > n/(k+1) is
  * guaranteed present in the summary. With k ≥ |distinct items| no
  * eviction can ever fire and the counts are EXACT (the oracle-able
  * case). For k < distinct the counter set depends on partition
  * order — the bounds hold regardless, but bit-determinism doesn't
  * (documented; specs assert the guarantees, the driver query runs
  * the exact regime).
  *
  * Eval emits array<struct<item, est>> sorted by (est desc, item asc).
  * Supported item types: the fixed-width + string set of
  * [[BoundedTopK]]. Nulls are ignored.
  */
case class FrequentItems(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[Any, Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"frequent_items requires k > 0, got $k")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", child.dataType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_frequent_items"

  override def createAggregationBuffer(): mutable.LinkedHashMap[Any, Long] =
    mutable.LinkedHashMap.empty

  override def update(buf: mutable.LinkedHashMap[Any, Long],
                      input: InternalRow): mutable.LinkedHashMap[Any, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v match { case s: UTF8String => s.copy(); case x => x }
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < k => buf.update(key, 1L)
      case None =>
        // decrement-all step: one "vote" of every counter and the new
        // item cancel out; drop exhausted counters
        val dead = mutable.ArrayBuffer[Any]()
        buf.foreach { case (item, c) =>
          if (c == 1L) dead += item else buf.update(item, c - 1)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  /** Mergeable-summaries merge: pointwise counter add, then subtract
    * the (k+1)-largest combined count from everything and drop ≤ 0 —
    * keeps the ≤ k bound and the n/(k+1) error bound. */
  override def merge(buf: mutable.LinkedHashMap[Any, Long],
                     other: mutable.LinkedHashMap[Any, Long]): mutable.LinkedHashMap[Any, Long] = {
    other.foreach { case (item, c) =>
      buf.update(item, buf.getOrElse(item, 0L) + c)
    }
    if (buf.size > k) {
      val counts = buf.values.toArray.sorted(Ordering[Long].reverse)
      val cut = counts(k) // (k+1)-th largest
      val dead = mutable.ArrayBuffer[Any]()
      buf.foreach { case (item, c) =>
        if (c - cut <= 0L) dead += item else buf.update(item, c - cut)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.LinkedHashMap[Any, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      if (c1 != c2) c1 > c2 else ordering.lt(i1, i2)
    }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c)
    })
  }

  override def serialize(buf: mutable.LinkedHashMap[Any, Long]): Array[Byte] = {
    val items = buf.toSeq.map { case (item, c) => (encode(item), c) }
    val bb = ByteBuffer.allocate(4 + items.map(_._1.length + 12).sum)
    bb.putInt(items.length)
    items.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[Any, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.LinkedHashMap.empty[Any, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf.update(decode(b), bb.getLong)
      i += 1
    }
    buf
  }

  private def encode(v: Any): Array[Byte] = child.dataType match {
    case StringType => v.asInstanceOf[UTF8String].getBytes
    case IntegerType | DateType =>
      ByteBuffer.allocate(4).putInt(v.asInstanceOf[Int]).array()
    case LongType | TimestampType | TimestampNTZType =>
      ByteBuffer.allocate(8).putLong(v.asInstanceOf[Long]).array()
    case t => throw new UnsupportedOperationException(
      s"graft_frequent_items: unsupported item type $t")
  }

  private def decode(b: Array[Byte]): Any = child.dataType match {
    case StringType => UTF8String.fromBytes(b)
    case IntegerType | DateType => ByteBuffer.wrap(b).getInt
    case LongType | TimestampType | TimestampNTZType => ByteBuffer.wrap(b).getLong
    case t => throw new UnsupportedOperationException(
      s"graft_frequent_items: unsupported item type $t")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FrequentItems =
    copy(child = newChild)
}
