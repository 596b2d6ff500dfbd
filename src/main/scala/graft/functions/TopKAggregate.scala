package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ksqlDB's TOPK / TOPKDISTINCT (ksqldb builtin surface) as a native
  * bounded-state aggregate: per group, the k largest values, returned
  * descending.
  *
  * Unlike `slice(sort_array(collect_list(v)))` — whose intermediate
  * state is O(group size) and OOMs on hot keys at scale — this is a
  * [[TypedImperativeAggregate]] whose buffer never holds more than k
  * values: map-side partial aggregation trims to k *before* the
  * shuffle, so a 10^9-row group ships k values per map partition, and
  * reduce-side merge is k·log-free linear insertion. This is the same
  * state bound ksqlDB's TOPK keeps in its RocksDB store.
  *
  * Values are compared with the type's interpreted ordering; supported
  * child types: int/long/float/double/string/date/timestamp (anything
  * `TypeUtils.getInterpretedOrdering` handles and the fixed-width or
  * UTF8 serializer below covers). Nulls are ignored, matching ksqlDB.
  * k is expected small (ksqlDB-style tens, not millions) — insertion
  * is a linear scan over the k-slot buffer.
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    distinct: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(k > 0, s"topk requires k > 0, got $k")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String =
    if (distinct) "graft_topk_distinct" else "graft_topk"

  override def createAggregationBuffer(): ArrayBuffer[Any] =
    new ArrayBuffer[Any](k + 1)

  /** Keep `buf` as the k largest seen, unsorted; evict the current
    * minimum only when a larger value arrives. */
  private def insert(buf: ArrayBuffer[Any], v: Any): Unit = {
    if (distinct && buf.exists(ordering.equiv(_, v))) return
    if (buf.length < k) { buf += v; return }
    var minIdx = 0
    var i = 1
    while (i < buf.length) {
      if (ordering.lt(buf(i), buf(minIdx))) minIdx = i
      i += 1
    }
    if (ordering.gt(v, buf(minIdx))) buf(minIdx) = v
  }

  override def update(buf: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buf, copyIfNeeded(v))
    buf
  }

  override def merge(buf: ArrayBuffer[Any], other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.sorted(ordering.reverse).toArray)

  /** UTF8String inputs may alias mutable row memory; copy on capture. */
  private def copyIfNeeded(v: Any): Any = v match {
    case s: UTF8String => s.copy()
    case x => x
  }

  override def serialize(buf: ArrayBuffer[Any]): Array[Byte] = {
    val bytes = buf.map(encode)
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 4).sum)
    bb.putInt(bytes.length)
    bytes.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[Any](k + 1)
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf += decode(b)
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
    case FloatType =>
      ByteBuffer.allocate(4).putFloat(v.asInstanceOf[Float]).array()
    case DoubleType =>
      ByteBuffer.allocate(8).putDouble(v.asInstanceOf[Double]).array()
    case t => throw new UnsupportedOperationException(
      s"graft_topk: unsupported value type $t")
  }

  private def decode(b: Array[Byte]): Any = child.dataType match {
    case StringType => UTF8String.fromBytes(b)
    case IntegerType | DateType => ByteBuffer.wrap(b).getInt
    case LongType | TimestampType | TimestampNTZType => ByteBuffer.wrap(b).getLong
    case FloatType => ByteBuffer.wrap(b).getFloat
    case DoubleType => ByteBuffer.wrap(b).getDouble
    case t => throw new UnsupportedOperationException(
      s"graft_topk: unsupported value type $t")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)
}
