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

  /** Σ aᵢ·bᵢ as a sequential double fold. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Σ aᵢ² (squared L2 norm). */
  def normSq(a: Column): Column = dotD(a, a)

  /** Cosine similarity; written exactly as dot/(sqrt(na)*sqrt(nb)) —
    * keep this op order in any SQL mirror. */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Cosine from a precomputed dot and per-side norms — lets callers
    * compute each row's norm once instead of once per pair (the
    * at-scale shape: norms are a projection before the join). */
  def cosineFromParts(dot: Column, sqrtNormA: Column, sqrtNormB: Column): Column =
    dot / (sqrtNormA * sqrtNormB)
}
