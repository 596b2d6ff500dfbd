package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable arithmetic.
  *
  * The driver hash-compares our results against a DuckDB oracle, so any
  * double we emit must be *bit-identical* across engines. Two hazards:
  *
  *  1. Summation order: `sum`/`avg` over doubles is association-order
  *     dependent; Spark's partial aggregation order differs from
  *     DuckDB's. Fix: accumulate in DECIMAL (the test data's money
  *     columns are exact 2-decimal values, so the cast is lossless and
  *     the sum exact), cast the final sum back to double — conversion
  *     of the same rational to double is correctly rounded in IEEE-754,
  *     hence identical everywhere.
  *
  *  2. round() semantics: Spark rounds the decimal expansion of the
  *     binary double (HALF_UP via BigDecimal) while DuckDB computes
  *     round(x·10^s)/10^s — they disagree on half-boundary values,
  *     which 2-decimal inputs hit constantly (avg of two .xx values).
  *     Fix: an explicit `floor(x·10^s + 0.5)/10^s` formula — pure IEEE
  *     ops that every engine evaluates identically.
  *
  * These helpers are plain Column expressions → whole-stage codegen.
  */
object Exact {

  /** floor(x·10^s + 0.5)/10^s — engine-independent round-half-up
    * (toward +inf for negatives; consistent everywhere).
    * SQL equivalent: `floor(x * 10^s + 0.5) / 10^s`. */
  def roundAt(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * f + 0.5) / f
  }

  def round2(c: Column): Column = roundAt(c, 2)

  /** Exact, order-independent sum of doubles with <= `scale` decimals.
    * SQL equivalent: `CAST(sum(CAST(x AS DECIMAL(38,scale))) AS DOUBLE)`.
    *
    * Small scales run on [[ExactSum128]] (two-long 128-bit integer
    * accumulator, HashAggregate codegen fast path) instead of a
    * decimal(30) sum, whose >18-digit precision forces BigDecimal
    * aggregation buffers — same bit-exact result, several times
    * faster (the round-2 "decimal tax" on q_corr/q_cube/q_rollup).
    * Large scales keep the decimal plan. */
  def sumExact(c: Column, scale: Int = 2): Column =
    if (scale <= 6)
      ColumnBridge.column(
        ExactSum128(ColumnBridge.expression(c.cast("double")), scale)
          .toAggregateExpression())
    else sum(c.cast(s"decimal(30,$scale)")).cast("double")

  /** The decimal-sum reference plan — differential-test twin of the
    * 128-bit path. */
  private[graft] def sumExactDecimal(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  /** Window-frame form of [[sumExact]]. Needed because the large-scale
    * decimal plan is `cast(sum(...))` — a cast-wrapped aggregate, on
    * which `.over(w)` fails analysis (only a bare aggregate accepts a
    * window spec). Branches like sumExact: bare ExactSum128 for small
    * scales, `sum(decimal).over(w)` with the double cast applied AFTER
    * the window for larger ones. */
  def sumExactOver(c: Column, scale: Int,
      w: org.apache.spark.sql.expressions.WindowSpec): Column =
    if (scale <= 6)
      ColumnBridge.column(
        ExactSum128(ColumnBridge.expression(c.cast("double")), scale)
          .toAggregateExpression()).over(w)
    else sum(c.cast(s"decimal(30,$scale)")).over(w).cast("double")

  /** Order-independent average built from the exact sum.
    * SQL: `CAST(sum(CAST(x AS DECIMAL(38,s))) AS DOUBLE) / count(*)`. */
  def avgExact(c: Column, scale: Int = 2): Column =
    sumExact(c, scale) / count(lit(1L))

  /** Pearson correlation from exact decimal sums:
    * (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²)(nΣy² − (Σy)²)).
    * Spark's built-in `corr` merges co-moments in partition order and
    * is not bit-stable across engines; this is. */
  def corrExact(x: Column, y: Column, sx: Int = 2, sy: Int = 2): Column = {
    val n = count(lit(1L)).cast("double")
    val sxs = sumExact(x, sx); val sys = sumExact(y, sy)
    val sxy = sumExact(x * y, sx + sy)
    val sxx = sumExact(x * x, 2 * sx); val syy = sumExact(y * y, 2 * sy)
    (n * sxy - sxs * sys) / sqrt((n * sxx - sxs * sxs) * (n * syy - sys * sys))
  }

  /** SQL-text twin of [[roundAt]] — the ONE source for every oracle's
    * rounding string (SparkEntry's sqlRound helpers and the
    * Regression text generators both delegate here, so the formula
    * cannot desynchronize between modules). */
  def roundAtSql(x: String, scale: Int): String = {
    val f = math.pow(10, scale).toLong
    s"floor(($x) * $f + 0.5) / $f"
  }

  /** SQL-text twin of [[sumExact]] (the decimal-sum plan — proven
    * bit-equal to the 128-bit path by ExactSum128Spec). */
  def sumExactSql(x: String, scale: Int): String =
    s"CAST(sum(CAST($x AS DECIMAL(30,$scale))) AS DOUBLE)"

  /** Sample covariance from exact decimal sums:
    * (Σxy − ΣxΣy/n) / (n−1). */
  def covarSampExact(x: Column, y: Column, sx: Int = 2, sy: Int = 2): Column = {
    val n = count(lit(1L)).cast("double")
    (sumExact(x * y, sx + sy) - sumExact(x, sx) * sumExact(y, sy) / n) / (n - lit(1.0))
  }
}
