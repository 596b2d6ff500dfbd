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
}
