package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998)
  * as a native bounded-state aggregate: per group (per query), collect
  * the candidate page — `(rel, id, vec)` triples, at most
  * `maxCandidates` of them, enforced LOUDLY — and greedily pick `k`
  *   pick_r = argmax_c [ λ·rel(c) − (1−λ)·max_{s∈picked} cos(c, s) ]
  * with ties (mmr, rel) desc then id asc. Output: array of
  * `(id, rnk, mmr)` structs in pick order.
  *
  * Why an aggregate and not a chain of higher-order-function rounds:
  * the greedy is inherently sequential in k with a data-dependent pick
  * each round — expressed as k chained `transform`/`array_max`
  * projections the optimizer re-inlines each round's pick into the
  * next round's lambdas (captured non-attribute expressions re-inline
  * PER ELEMENT) and evaluation goes combinatorial. Here the page
  * crosses the shuffle once and the greedy runs imperatively over
  * O(page) state — one pass, no plan depth in k at all.
  *
  * Exactness (oracle discipline): cosine is the identical
  * left-to-right double fold as [[Vectors.cosine]] / the oracle's
  * `list_reduce` (dot, normA, normB accumulated in element order,
  * then dot/(√na·√nb)), mmr is two IEEE ops on doubles, and argmax
  * compares doubles — so the recursive-CTE replay picks the same rows
  * and records bit-identical scores. Zero-norm vectors are the
  * caller's bug (NaN cosine), same as every other cosine path here.
  */
case class MmrSelect(
    rel: Expression,
    id: Expression,
    vec: Expression,
    k: Int,
    lambda: Double,
    maxCandidates: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long, Array[Float])]] {

  require(k > 0, s"graft_mmr requires k > 0, got $k")
  require(lambda >= 0.0 && lambda <= 1.0,
    s"graft_mmr requires lambda in [0, 1], got $lambda")
  require(maxCandidates > 0,
    s"graft_mmr requires maxCandidates > 0, got $maxCandidates")

  override def children: Seq[Expression] = Seq(rel, id, vec)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MmrSelect =
    copy(rel = newChildren(0), id = newChildren(1), vec = newChildren(2))

  /** Fail-by-name type contract: `toFloatArray()` on an UnsafeArrayData
    * backing an `array<double>` column would do a raw 4-byte-per-
    * element copy — silently plausible-but-wrong cosines. The vec
    * child must already BE float (callers cast; [[graft.operators
    * .Similarity.mmrRerank]] does), rel double, id long. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (rel.dataType != DoubleType)
      TypeCheckFailure(
        s"graft_mmr rel must be DOUBLE, got ${rel.dataType.sql}")
    else if (id.dataType != LongType)
      TypeCheckFailure(
        s"graft_mmr id must be BIGINT, got ${id.dataType.sql}")
    else vec.dataType match {
      case ArrayType(FloatType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        "graft_mmr vec must be ARRAY<FLOAT> (cast the column — a raw " +
          s"read of another element width is silent garbage), got " +
          other.sql)
    }
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("rnk", LongType, nullable = false),
    StructField("mmr", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mmr"

  override def createAggregationBuffer()
      : ArrayBuffer[(Double, Long, Array[Float])] =
    new ArrayBuffer[(Double, Long, Array[Float])]()

  private def bound(buf: ArrayBuffer[(Double, Long, Array[Float])]): Unit =
    if (buf.length > maxCandidates)
      throw new IllegalStateException(
        s"graft_mmr: ${buf.length} candidates for one query exceed " +
          s"maxCandidates=$maxCandidates — cut the page upstream " +
          "(this is a reranker over an already-cut page, not a search)")

  override def update(
      buf: ArrayBuffer[(Double, Long, Array[Float])],
      input: InternalRow): ArrayBuffer[(Double, Long, Array[Float])] = {
    val r = rel.eval(input)
    val i = id.eval(input)
    val v = vec.eval(input)
    if (r != null && i != null && v != null) {
      val arr = v.asInstanceOf[ArrayData].toFloatArray()
      // one length check per ROW (not per cosine): a mismatched
      // candidate page fails by name instead of truncating into a
      // wrong-but-plausible similarity
      requireSameDim(buf, arr)
      buf += ((r.asInstanceOf[Double], i.asInstanceOf[Long], arr))
      bound(buf)
    }
    buf
  }

  private def requireSameDim(
      buf: ArrayBuffer[(Double, Long, Array[Float])],
      v: Array[Float]): Unit =
    if (buf.nonEmpty && buf.head._3.length != v.length)
      throw new IllegalStateException(
        s"graft_mmr: candidate vectors disagree on dimension " +
          s"(${buf.head._3.length} vs ${v.length}) — a malformed page " +
          "must fail by name, not truncate into a plausible cosine")

  override def merge(
      buf: ArrayBuffer[(Double, Long, Array[Float])],
      other: ArrayBuffer[(Double, Long, Array[Float])])
      : ArrayBuffer[(Double, Long, Array[Float])] = {
    if (buf.nonEmpty) other.headOption.foreach(t =>
      requireSameDim(buf, t._3))
    buf ++= other
    bound(buf)
    buf
  }

  /** The oracle-exact cosine: dot/normA/normB each a left-to-right
    * double fold in element order — keep this op order in any SQL
    * mirror (`list_reduce` over `list_zip`). */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    // lengths are equal by the update()/merge() per-row contract
    val n = a.length
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  override def eval(
      buf: ArrayBuffer[(Double, Long, Array[Float])]): Any = {
    // deterministic regardless of arrival order
    val rem = buf.sortWith((a, b) =>
      if (a._1 != b._1) a._1 > b._1 else a._2 < b._2)
    val picked = new ArrayBuffer[InternalRow](math.min(k, rem.length))
    val selVecs = new ArrayBuffer[Array[Float]]()
    var rnk = 1L
    while (rnk <= k && rem.nonEmpty) {
      var bestIdx = 0
      var bestMmr = Double.NaN
      var idx = 0
      while (idx < rem.length) {
        val (r, i, v) = rem(idx)
        var maxSim = 0.0
        var s = 0
        var first = true
        while (s < selVecs.length) {
          val c = cos(v, selVecs(s))
          if (first || c > maxSim) { maxSim = c; first = false }
          s += 1
        }
        val mmr =
          if (selVecs.isEmpty) lambda * r
          else lambda * r - (1.0 - lambda) * maxSim
        val better = idx == 0 || mmr > bestMmr || (mmr == bestMmr && {
          val (br, bi, _) = rem(bestIdx)
          r > br || (r == br && i < bi)
        })
        if (better) { bestIdx = idx; bestMmr = mmr }
        idx += 1
      }
      val (_, bi, bv) = rem(bestIdx)
      picked += new GenericInternalRow(Array[Any](bi, rnk, bestMmr))
      selVecs += bv
      rem.remove(bestIdx)
      rnk += 1
    }
    new GenericArrayData(picked.toArray[Any])
  }

  override def serialize(
      buf: ArrayBuffer[(Double, Long, Array[Float])]): Array[Byte] = {
    val bb = ByteBuffer.allocate(
      4 + buf.map(t => 8 + 8 + 4 + 4 * t._3.length).sum)
    bb.putInt(buf.length)
    buf.foreach { case (r, i, v) =>
      bb.putDouble(r); bb.putLong(i); bb.putInt(v.length)
      v.foreach(bb.putFloat)
    }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): ArrayBuffer[(Double, Long, Array[Float])] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long, Array[Float])](n)
    var i = 0
    while (i < n) {
      val r = bb.getDouble; val id = bb.getLong
      val v = new Array[Float](bb.getInt)
      var j = 0
      while (j < v.length) { v(j) = bb.getFloat; j += 1 }
      buf += ((r, id, v))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MmrSelect =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MmrSelect =
    copy(inputAggBufferOffset = o)
}
