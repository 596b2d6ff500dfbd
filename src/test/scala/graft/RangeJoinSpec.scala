package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("binned range join == naive inequality join, across bin widths") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random points/intervals straddling many
    // bin boundaries, including width-0 and negative-width intervals
    val pts = (0L until 300L).map(i => (i, i * 37 % 997)).toDF("pid", "p")
    val iv = (0L until 120L).map { i =>
      val lo = i * 53 % 991
      val w = (i * 29 % 40) - 3 // some negative widths
      (i, lo, lo + w)
    }.toDF("iid", "lo", "hi")
    val naive = pts.crossJoin(iv)
      .filter(col("p").between(col("lo"), col("hi")))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty, "test data must produce matches")
    for (w <- Seq(1L, 7L, 32L, 1000L)) {
      val got = Relational.rangeJoin(pts, "p", iv, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"binWidth=$w emitted duplicate pairs")
      assert(got.toSet == naive, s"binWidth=$w pair set diverged")
    }
  }

  test("pathologically wide intervals fail loud instead of exploding") {
    val s = spark
    import s.implicits._
    val pts = Seq((1L, 10L)).toDF("pid", "p")
    val iv = Seq((7L, 0L, 100000000L)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      Relational.rangeJoin(pts, "p", iv, "lo", "hi", binWidth = 2, maxBinsPerInterval = 1000)
        .collect()
    }
    assert(e.getMessage != null && e.toString.contains("rangeJoin") ||
      Option(e.getCause).exists(_.toString.contains("rangeJoin")),
      s"expected the rangeJoin guard, got $e")
    // and the same interval passes with a wide-enough bin
    val ok = Relational.rangeJoin(pts, "p", iv, "lo", "hi",
      binWidth = 1000000L, maxBinsPerInterval = 1000)
    assert(ok.count() == 1)
  }

  test("range join boundaries are inclusive and the plan is a hash join, not NLJ") {
    val s = spark
    import s.implicits._
    val pts = Seq((1L, 10L), (2L, 20L), (3L, 21L)).toDF("pid", "p")
    val iv = Seq((7L, 10L, 20L)).toDF("iid", "lo", "hi")
    val out = Relational.rangeJoin(pts, "p", iv, "lo", "hi", 8L)
    assert(out.select("pid").as[Long].collect().toSet == Set(1L, 2L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degraded to a nested loop:\n$plan")
  }
}
