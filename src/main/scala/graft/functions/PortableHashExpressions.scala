package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for the engine-portable polynomial hashes
  * (mod 1e9+7 — see [[Text.portableHash]] for the portability
  * rationale and the DuckDB mirrors in SparkEntry.sqlTokenHash).
  *
  * The HOF formulation (`aggregate(split(t, ''), ...)`) evaluates an
  * interpreted lambda PER CHARACTER per row — measured at 4.3s for
  * 500 docs on the fingerprint query. These kernels run the whole
  * hash as one JVM loop invoked from generated code (same move as
  * [[MinHashSignature]]), keeping semantics bit-identical:
  *
  *  - `split(t, '')` yields one element per Unicode code point and
  *    `ascii(elem)` returns that code point → the kernel folds code
  *    points directly.
  *  - `split(text, ' ')` uses Java limit=-1 semantics (consecutive /
  *    leading / trailing spaces produce empty tokens, and
  *    `"".split` yields `[""]`) → the kernel's manual splitter
  *    reproduces exactly that, including hash("") == 0.
  *  - `array_sort(array_distinct(tokens))` sorts strings in
  *    UTF8String binary order == code-point order → the canonical
  *    path sorts with a code-point comparator, not String.compareTo
  *    (which is UTF-16 order and differs for supplementary planes).
  */
object PortableHashKernel {
  final val Mod = 1000000007L
  final val CharB = 31L
  final val TokB = 131L

  /** acc = (acc*base + codePoint) % Mod over the string's code
    * points, 0-seeded (so the first step equals DuckDB's
    * list_reduce first-element seed). */
  def hashTokenBase(s: String, base: Long): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  private def hashRange(s: String, from: Int, until: Int): Long = {
    var acc = 0L
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i) // boundary is ' ', never a low surrogate
      acc = (acc * CharB + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Mirror of Text.tokenHash / SparkEntry.sqlTokenHash. */
  def portableHash(s: UTF8String): Long = hashTokenBase(s.toString, CharB)

  /** portableHash pushed through the equidistributing multiply —
    * see [[Text.portableMix]] for why the raw hash can't be used
    * as a uniform bucket key. */
  def portableMix(s: UTF8String): Long =
    (portableHash(s) * 2654435761L) % Mod

  /** UTF8String binary order == code-point order (UTF-8 byte
    * comparison preserves code-point ordering); String.compareTo
    * is UTF-16 order, which disagrees above the BMP. */
  private object CpOrder extends java.util.Comparator[String] {
    override def compare(a: String, b: String): Int = {
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }

  /** Rolling fingerprint over space-split tokens:
    * acc = (acc*131 + tokenHash) % Mod, 0-seeded. `canonical` folds
    * the sorted distinct token set instead of document order. */
  def fingerprint(text: UTF8String, canonical: Boolean): Long = {
    val s = text.toString
    val n = s.length
    if (!canonical) {
      var acc = 0L
      var start = 0
      var i = 0
      while (i <= n) {
        if (i == n || s.charAt(i) == ' ') {
          acc = (acc * TokB + hashRange(s, start, i)) % Mod
          start = i + 1
        }
        i += 1
      }
      acc
    } else {
      val set = new java.util.TreeSet[String](CpOrder)
      var start = 0
      var i = 0
      while (i <= n) {
        if (i == n || s.charAt(i) == ' ') {
          set.add(s.substring(start, i))
          start = i + 1
        }
        i += 1
      }
      var acc = 0L
      val it = set.iterator()
      while (it.hasNext) acc = (acc * TokB + hashTokenBase(it.next(), CharB)) % Mod
      acc
    }
  }

  /** Bases for the 4×16-bit portable SimHash. Distinct small odd-ish
    * bases; each yields an independent 30-bit polynomial hash whose
    * low 16 bits feed 16 signature positions. */
  final val SimBases: Array[Long] = Array(31L, 131L, 257L, 313L)

  /** Engine-portable 64-bit SimHash over the DISTINCT space-split
    * token set: bit k (k = 16j + b) is set iff
    * Σ_tokens ±1[bit b of hashTokenBase(token, SimBases(j))] > 0.
    * DuckDB mirror: SparkEntry's q_doc_simhash oracle builds the
    * same 64 bits from the same four list_reduce hashes. */
  def simHashPortable(text: UTF8String): Long = {
    val s = text.toString
    val n = s.length
    val set = new java.util.HashSet[String]()
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        set.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val counts = new Array[Int](64)
    val it = set.iterator()
    while (it.hasNext) {
      val tok = it.next()
      var j = 0
      while (j < 4) {
        val h = hashTokenBase(tok, SimBases(j))
        var b = 0
        while (b < 16) {
          counts(16 * j + b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        j += 1
      }
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (counts(k) > 0) out |= (1L << k)
      k += 1
    }
    out
  }
}

/** string → long portable polynomial hash (see [[PortableHashKernel]]). */
case class PortableHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    PortableHashKernel.portableHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHashKernel.portableHash($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** string → long rolling document fingerprint (ordered or canonical). */
case class FingerprintExpr(child: Expression, canonical: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    PortableHashKernel.fingerprint(input.asInstanceOf[UTF8String], canonical)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableHashKernel.fingerprint($c, $canonical)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** string → long engine-portable 64-bit SimHash. */
case class SimHashPortableExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    PortableHashKernel.simHashPortable(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHashKernel.simHashPortable($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PortableHashExpressions {
  def portableHash(c: Column): Column =
    ColumnBridge.column(PortableHashExpr(ColumnBridge.expression(c)))
  def fingerprint(c: Column, canonical: Boolean): Column =
    ColumnBridge.column(FingerprintExpr(ColumnBridge.expression(c), canonical))
  def simHashPortable(c: Column): Column =
    ColumnBridge.column(SimHashPortableExpr(ColumnBridge.expression(c)))
}
