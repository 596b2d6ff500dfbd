package graft

import org.apache.spark.sql.functions._
import graft.functions.{Exact, ExactSumKernel}

/** Differential spec: the 128-bit-accumulator sum must be
  * bit-identical to the decimal(30,s)-sum-cast-double plan it
  * replaced (which is oracle-proven vs DuckDB), including nulls,
  * negatives, empty groups, large partial counts, and window frames. */
class ExactSum128Spec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  test("sum128 == decimal sum on lineitem money columns (grouped)") {
    val li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
    for ((c, sc) <- Seq(("l_quantity", 2), ("l_extendedprice", 2), ("l_discount", 2),
        ("l_extendedprice", 4))) {
      val out = li.groupBy("l_returnflag", "l_linestatus").agg(
        Exact.sumExact(col(c), sc).as("fast"),
        Exact.sumExactDecimal(col(c), sc).as("ref"))
      val bad = out.filter(col("fast") =!= col("ref") ||
        (col("fast").isNull =!= col("ref").isNull)).count()
      assert(bad == 0L, s"$c scale $sc")
    }
  }

  test("sum128 == decimal sum on products (scale 4) incl. negatives and nulls") {
    val df = (1 to 20000).map { i =>
      val v = if (i % 97 == 0) None
      else Some(((i % 2001) - 1000) * 0.01 * (((i * 31) % 173) * 0.01))
      (i % 7, v.map(x => math.floor(x * 10000 + 0.5) / 10000))
    }.toDF("k", "v")
    val out = df.groupBy("k").agg(
      Exact.sumExact(col("v"), 4).as("fast"),
      Exact.sumExactDecimal(col("v"), 4).as("ref"))
    assert(out.filter(col("fast") =!= col("ref")).count() == 0L)
  }

  test("empty / all-null group yields NULL like sum does") {
    val df = Seq((1, Option.empty[Double]), (1, None), (2, Some(1.5)))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(Exact.sumExact(col("v"), 2).as("s"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1) == null)
    assert(out(2) == 1.5)
  }

  test("low-word carry propagates: partials crossing 2^63 in scaled units") {
    // 5e14 scaled at 2 → 5e16 each; 400 rows → 2e19 > 2^63 ≈ 9.2e18
    val df = (1 to 400).map(_ => 500000000000000.0).toDF("v")
    val got = df.agg(Exact.sumExact(col("v"), 2).as("s")).head.getDouble(0)
    assert(got == 2.0e17, s"got $got")
    val ref = df.agg(Exact.sumExactDecimal(col("v"), 2).as("s")).head.getDouble(0)
    assert(got == ref)
  }

  test("negative totals and sign-extension across the high word") {
    val df = ((1 to 300).map(_ => -500000000000000.0) ++ Seq(0.25))
      .toDF("v")
    val fast = df.agg(Exact.sumExact(col("v"), 2).as("s")).head.getDouble(0)
    val ref = df.agg(Exact.sumExactDecimal(col("v"), 2).as("s")).head.getDouble(0)
    assert(fast == ref, s"$fast vs $ref")
  }

  test("window-frame usage matches the decimal plan") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 1000).map(i => (i % 5, i, (i % 300) * 0.01)).toDF("k", "o", "v")
    val w = Window.partitionBy("k").orderBy("o").rowsBetween(-10, 0)
    val out = df.select(
      Exact.sumExact(col("v"), 2).over(w).as("fast"),
      // cast applied AFTER over(): .over needs the bare aggregate
      sum(col("v").cast("decimal(30,2)")).over(w).cast("double").as("ref"))
    assert(out.filter(col("fast") =!= col("ref")).count() == 0L)
  }

  test("kernel scaleTo matches the decimal-cast unscaled value on edge inputs") {
    for (x <- Seq(0.0, -0.0, 1.005, -1.005, 123.456, 1e13, -1e13, 0.015, 2.675);
         sc <- Seq(0, 2, 4)) {
      val expect = java.math.BigDecimal.valueOf(x)
        .setScale(sc, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
      assert(ExactSumKernel.scaleTo(x, sc) == expect, s"x=$x scale=$sc")
    }
  }

  test("scaleTo is decimal-exact for scaled magnitudes straddling 2^51..2^53") {
    // Around 2^52 the double product x·10^scale can be an exact
    // integer yet off by ±1 from the decimal-string value — those
    // magnitudes must take the BigDecimal path. Includes the observed
    // counterexample 81023871937164.1 (fast path gave ...09, decimal
    // ...10) plus a sweep across the boundary decades.
    val seeds = Seq(81023871937164.1, 2.2517998136852475e15, 4.5035996273704951e15,
      9.007199254740991e15, 1.23456789012345e13, 7.5e15, 3.3e15) ++
      (1 to 200).map(i => (2.0e13 + i * 4.4e13) + i * 0.37)
    for (x0 <- seeds; sgn <- Seq(1.0, -1.0); sc <- Seq(0, 2, 4, 6)) {
      val x = sgn * x0
      if (math.abs(x) <= 9.2e18 / math.pow(10, sc)) {
        val expect = java.math.BigDecimal.valueOf(x)
          .setScale(sc, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
        assert(ExactSumKernel.scaleTo(x, sc) == expect, s"x=$x scale=$sc")
      }
    }
  }

  test("large in-contract magnitudes agg-match the decimal plan (>= 4.5e13 at scale 2)") {
    val df = ((1 to 500).map(i => 4.5e13 + i * 1.0e12 + (i % 100) * 0.01) ++
      (1 to 500).map(i => -(8.1e13 + i * 7.7e11 + (i % 100) * 0.01))).toDF("v")
    val fast = df.agg(Exact.sumExact(col("v"), 2).as("s")).head.getDouble(0)
    val ref = df.agg(Exact.sumExactDecimal(col("v"), 2).as("s")).head.getDouble(0)
    assert(fast == ref, s"$fast vs $ref")
  }

  test("NaN/Infinity rows behave like the decimal cast: NULL, not a crash") {
    val df = Seq((1, Double.NaN), (1, 2.5), (2, Double.PositiveInfinity),
      (2, Double.NegativeInfinity), (3, Double.NaN), (4, 1.25), (4, -0.75))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(
      Exact.sumExact(col("v"), 2).as("fast"),
      Exact.sumExactDecimal(col("v"), 2).as("ref"))
      .collect().map(r => r.getInt(0) ->
        ((if (r.isNullAt(1)) null else r.getDouble(1)),
         (if (r.isNullAt(2)) null else r.getDouble(2)))).toMap
    for ((k, (fast, ref)) <- out) assert(fast == ref, s"k=$k: $fast vs $ref")
    assert(out(3)._1 == null)   // all-NaN group → NULL like sum-of-NULLs
    assert(out(2)._1 == null)   // all-Infinity group → NULL
  }

  test("magnitudes beyond the 64-bit scaled row degrade to NULL-row, not a crash") {
    // decimal(30,2) still sums 1e18-magnitude rows; the 128-bit path
    // can't carry |x·100| > ~9.2e18 in one signed long, so such
    // off-contract rows are skipped like NULLs — documented deviation,
    // and crucially no NumberFormatException/ArithmeticException.
    val df = Seq(1.0e18, 2.5, -3.0e18, 0.75).toDF("v")
    val fast = df.agg(Exact.sumExact(col("v"), 2).as("s")).head.getDouble(0)
    assert(fast == 3.25, s"got $fast")
  }

  test("rollingMean analyzes and matches for scale > 6 (decimal window path)") {
    import graft.operators.Relational
    val df = (1 to 500).map { i =>
      (i % 3, java.sql.Timestamp.valueOf(s"2024-01-01 00:${"%02d".format(i % 60)}:${"%02d".format(i % 60)}"),
        (i % 997) * 1e-7, i.toLong)
    }.toDF("k", "ts", "v", "id")
    val out = Relational.rollingMean(df, Seq("k"), "ts", "v", "id", 600L, scale = 8)
    assert(out.count() == 500)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy(unix_micros(col("ts")))
      .rangeBetween(-600L * 1000000L, 0)
    val ref = df.select((sum(col("v").cast("decimal(30,8)")).over(w).cast("double") /
        count(lit(1L)).over(w)).as("ref_avg"), col("id"))
    val got = out.select("id", "roll_avg")
    assert(got.join(ref, "id")
      .filter(col("roll_avg") =!= col("ref_avg")).count() == 0L)
  }
}
