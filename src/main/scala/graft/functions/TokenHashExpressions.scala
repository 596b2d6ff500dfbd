package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd signature expressions over a pre-hashed token array
  * (`transform(tokens, t -> xxhash64(t))` upstream — strings are
  * hashed ONCE; these expressions only do integer mixing).
  *
  * The HOF formulation re-hashes every token per hash function /
  * per bit (64× redundant string hashing, interpreted per element);
  * these run the whole signature as one fused primitive loop.
  */

/** MinHash signature: out[j] = min over tokens of h_j(x) where
  * h_j(x) = (A·(2j+1))·x + j·B — a multiply-based universal-style
  * remix of the 64-bit token hash (odd multiplier per j). Constants
  * are fixed, so signatures are deterministic across runs/engines.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val A = 0x9E3779B97F4A7C15L // golden-ratio odd constant
  private val B = 0xBF58476D1CE4E5B9L // splitmix64 odd constant

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val mul = A * (2L * j + 1L); val add = B * j
      var best = Long.MaxValue; var i = 0
      while (i < n) {
        val v = mul * hs.getLong(i) + add
        if (v < best) best = v
        i += 1
      }
      out(j) = best; j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val (n, i, j, out, mul, add, best, v) = (ctx.freshName("n"),
        ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("out"),
        ctx.freshName("mul"), ctx.freshName("add"), ctx.freshName("best"),
        ctx.freshName("v"))
      s"""
         |int $n = $hs.numElements();
         |long[] $out = new long[$numHashes];
         |for (int $j = 0; $j < $numHashes; $j++) {
         |  long $mul = ${A}L * (2L * $j + 1L); long $add = ${B}L * $j;
         |  long $best = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = $mul * $hs.getLong($i) + $add;
         |    if ($v < $best) $best = $v;
         |  }
         |  $out[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 64-bit SimHash from token hashes: bit k of the result is set iff
  * Σ_tokens (±1 by bit k of the token hash) is positive. */
case class SimHashFromHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i); var k = 0
      while (k < 64) {
        counts(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1); k += 1
      }
      i += 1
    }
    var out = 0L; var k = 0
    while (k < 64) { if (counts(k) > 0) out |= (1L << k); k += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val (n, i, k, counts, h, out) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("k"), ctx.freshName("counts"), ctx.freshName("h"),
        ctx.freshName("out"))
      s"""
         |int $n = $hs.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $k = 0; $k < 64; $k++) {
         |    $counts[$k] += (((($h >>> $k) & 1L) == 1L) ? 1 : -1);
         |  }
         |}
         |long $out = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($counts[$k] > 0) $out |= (1L << $k);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** |a ∩ b| for two SORTED long arrays (one merge walk). Used to
  * verify candidate pairs: per-doc token/gram hash sets are sorted
  * once upstream, so each pair costs O(|a|+|b|) long compares instead
  * of a per-pair hash-set build over UTF8 strings. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (nx, ny, i, j, c, xv, yv) = (ctx.freshName("nx"), ctx.freshName("ny"),
        ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("c"),
        ctx.freshName("xv"), ctx.freshName("yv"))
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object TokenHashExpressions {
  def minHashSignature(tokenHashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(tokenHashes), numHashes))

  def simHash(tokenHashes: Column): Column =
    ColumnBridge.column(SimHashFromHashes(ColumnBridge.expression(tokenHashes)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
