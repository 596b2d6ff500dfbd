package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bloom filter as bounded driver metadata: the explicit form of the
  * runtime-filter pattern — build a ~hundreds-of-KB bit set over the
  * SMALL side's join keys, broadcast it as a plan literal, and drop
  * most of the BIG side's rows before they reach the shuffle. The
  * filter has no false negatives, so `prefilter → exact join` is
  * result-identical to the exact join alone; false positives only
  * cost exact-join work, never correctness.
  *
  * Layout: `array<long>` with word 0 = number of probe hashes k,
  * words 1.. = the bit set (a power-of-two bit count). Double
  * hashing (Kirsch–Mitzenmacher): probe i tests bit
  * (h1 + i·h2) & (numBits − 1), h2 forced odd so probes cycle the
  * whole table. Inputs are 64-bit hashes — callers feed
  * `xxhash64(key)`, so any key type works through one codegen hash.
  */
object BloomUtil {
  /** Optimal sizing for `n` expected items at false-positive rate
    * `fpp`: m = −n·lnp/(ln2)², rounded up to a power of two (the
    * probe mask must be cheap), k = (m/n)·ln2 clamped to [1, 16]. */
  def sizing(n: Long, fpp: Double): (Int, Int) = {
    require(n > 0 && fpp > 0 && fpp < 1, s"need n > 0, 0 < fpp < 1; got $n, $fpp")
    val ln2 = math.log(2)
    // stay in doubles until the budget check — a huge n would
    // overflow long math and silently dodge the guard
    val mRaw = -n.toDouble * math.log(fpp) / (ln2 * ln2)
    require(mRaw <= (1L << 30).toDouble, f"bloom filter would need $mRaw%.0f " +
      "bits — over the 128 MB driver-metadata budget; raise fpp or pre-aggregate keys")
    val m = java.lang.Long.highestOneBit(
      math.max(64L, math.ceil(mRaw).toLong - 1) * 2).toInt
    val k = math.max(1, math.min(16, math.round(m.toDouble / n * ln2).toInt))
    (m, k)
  }

  def set(words: Array[Long], hash: Long): Unit = {
    val numBits = (words.length - 1).toLong * 64
    val mask = numBits - 1
    val k = words(0).toInt
    val h2 = (hash >>> 32) | 1L
    var i = 0
    while (i < k) {
      val bit = (hash + i * h2) & mask
      words(1 + (bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Probe; called from generated code per big-side row. */
  def mightContain(words: ArrayData, hash: Long): Boolean = {
    val numWords = words.numElements() - 1
    val mask = numWords.toLong * 64 - 1
    val k = words.getLong(0).toInt
    val h2 = (hash >>> 32) | 1L
    var i = 0
    while (i < k) {
      val bit = (hash + i * h2) & mask
      if ((words.getLong(1 + (bit >>> 6).toInt) & (1L << (bit & 63))) == 0L)
        return false
      i += 1
    }
    true
  }
}

/** Aggregate a column of 64-bit hashes into the bloom layout above.
  * The buffer is a fixed `1 + numBits/64` long array — map-side
  * partials OR together, so a 10⁹-row side ships one array per map
  * partition. */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 64 && Integer.bitCount(numBits) == 1,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16, s"numHashes in [1,16], got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): Array[Long] = {
    val w = new Array[Long](1 + numBits / 64)
    w(0) = numHashes
    w
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.set(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 1
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomBuildAgg =
    copy(child = c)
}

/** `mightContain(filter, hash)` — the probe, codegen'd so the big
  * side's pre-filter stays inside whole-stage codegen. `left` is
  * normally a broadcast literal (the collected filter). */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(filter: Any, hash: Any): Any =
    BloomUtil.mightContain(filter.asInstanceOf[ArrayData], hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, h) =>
      s"graft.functions.BloomUtil.mightContain($f, $h)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomMightContain = copy(left = l, right = r)
}
