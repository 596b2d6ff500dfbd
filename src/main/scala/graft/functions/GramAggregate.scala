package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass exact second-moment (Gram) aggregate over a vector
  * column: Σ n, Σ vᵢ, and Σ vᵢ·vⱼ for every i ≤ j — everything PCA /
  * covariance needs — in a SINGLE map-side-combined aggregation over
  * one scan, at any dimension.
  *
  * The d(d+1)/2 product cells plus d sums are each a 128-bit exact
  * integer accumulator of `scale`-decimal-rounded values (the
  * [[ExactSumKernel]] contract — bit-identical to summing
  * `CAST(x AS DECIMAL(30, scale))` in any engine, in any order), so
  * a DuckDB oracle reproduces every cell exactly. The buffer is one
  * flat long array (2 longs per cell + 1 row count): fixed size,
  * O(d²) independent of row count, and the map-side partial collapse
  * means a 10⁹-row partition ships ONE buffer, not 10⁹ rows.
  *
  * Rows that are null, of the wrong length, or containing a NULL /
  * non-finite / |x| > 10⁴ element are skipped whole (count excluded)
  * so every cell is consistent over exactly the same row set.
  *
  * Eval returns struct(n, sums: array[d], gram: array[d·d]) with the
  * full square materialized from the triangle (IEEE products
  * commute), each cell converted with the same 128-bit → double
  * rounding as [[ExactSum128]].
  */
case class ExactGram(
    child: Expression,
    dim: Int,
    scale: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(dim > 0, "dim must be positive")
  require(scale >= 0 && scale <= 9, "scale must be in [0, 9]")

  private val tri = dim * (dim + 1) / 2
  // layout: [count, sumHi(d), sumLo(d), prodHi(tri), prodLo(tri)]
  private val bufLen = 1 + 2 * dim + 2 * tri
  private def sumHi(i: Int) = 1 + i
  private def sumLo(i: Int) = 1 + dim + i
  private def prodHi(t: Int) = 1 + 2 * dim + t
  private def prodLo(t: Int) = 1 + 2 * dim + tri + t

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("gram", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_exact_gram"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  @transient private lazy val elementIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** 128-bit two's-complement add of sign-extended `s` into
    * (buf(hiIdx), buf(loIdx)) — same carry logic as [[ExactSum128]]. */
  private def add128(buf: Array[Long], hiIdx: Int, loIdx: Int, s: Long): Unit = {
    val lo = buf(loIdx)
    val newLo = lo + s
    val carry = ((lo & s) | ((lo | s) & ~newLo)) >>> 63
    buf(hiIdx) += (s >> 63) + carry
    buf(loIdx) = newLo
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return buf
    val xs = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      // a NULL element would read as 0.0 through the primitive getter
      // — treat it like the other invalid elements (skip the whole
      // row), matching the maintained-moments lens exactly
      if (arr.isNullAt(i)) return buf
      val x = if (elementIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (x.isNaN || x.isInfinite || math.abs(x) > 1e4) return buf
      xs(i) = x
      i += 1
    }
    buf(0) += 1L
    i = 0
    var t = 0
    while (i < dim) {
      add128(buf, sumHi(i), sumLo(i), ExactSumKernel.scaleTo(xs(i), scale))
      var j = i
      while (j < dim) {
        add128(buf, prodHi(t), prodLo(t),
          ExactSumKernel.scaleTo(xs(i) * xs(j), scale))
        j += 1; t += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    buf(0) += other(0)
    var i = 0
    while (i < dim) {
      merge128(buf, sumHi(i), sumLo(i), other(sumHi(i)), other(sumLo(i)))
      i += 1
    }
    var t = 0
    while (t < tri) {
      merge128(buf, prodHi(t), prodLo(t), other(prodHi(t)), other(prodLo(t)))
      t += 1
    }
    buf
  }

  private def merge128(buf: Array[Long], hiIdx: Int, loIdx: Int,
                       oHi: Long, oLo: Long): Unit = {
    val lo = buf(loIdx)
    val newLo = lo + oLo
    val carry = ((lo & oLo) | ((lo | oLo) & ~newLo)) >>> 63
    buf(hiIdx) += oHi + carry
    buf(loIdx) = newLo
  }

  override def eval(buf: Array[Long]): Any = {
    val sums = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      sums(i) = ExactSumKernel.finish(buf(sumHi(i)), buf(sumLo(i)), scale)
      i += 1
    }
    val gram = new Array[Any](dim * dim)
    i = 0
    var t = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = ExactSumKernel.finish(buf(prodHi(t)), buf(prodLo(t)), scale)
        gram(i * dim + j) = v
        gram(j * dim + i) = v
        j += 1; t += 1
      }
      i += 1
    }
    InternalRow(buf(0), new GenericArrayData(sums), new GenericArrayData(gram))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bufLen)
    var i = 0
    while (i < bufLen) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactGram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactGram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ExactGram =
    copy(child = newChild)
}
