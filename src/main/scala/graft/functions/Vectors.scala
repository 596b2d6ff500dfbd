package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Column
  * expressions (Catalyst higher-order functions — no UDFs, no
  * serialization off Tungsten rows).
  *
  * Determinism note (oracle discipline, SURVEY.md §5): every fold is
  * an explicit *sequential left fold* (`aggregate`) with a 0.0 seed,
  * elements cast to double before multiply — the same element order
  * and FP op sequence the DuckDB oracle's `list_reduce` uses, so
  * results are bit-identical across engines, not merely close.
  */
object Vectors {

  /** Σ aᵢ·bᵢ — fused codegen loop (VectorDot). */
  def dotD(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** Σ aᵢ² (squared L2 norm). */
  def normSq(a: Column): Column = dotD(a, a)

  /** Cosine similarity = dot/(sqrt(na)·sqrt(nb)) in one fused codegen
    * pass (VectorCosine) — keep this op order in any SQL mirror. */
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosine(a, b)

  /** Reference HOF formulation (interpreted; kept as the spec-tested
    * semantic twin of the codegen path). */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
      lit(0.0), (acc, t) => acc + t)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }
}
