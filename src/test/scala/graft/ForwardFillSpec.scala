package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** The bucketed (scale-path) forward fill must equal the plain
  * windowed one row-for-row — including carries across buckets whose
  * column is entirely null, leading nulls before any observation, and
  * the keyless single-global-series case the plain variant cannot
  * distribute. */
class ForwardFillSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("bucketed fill == plain fill across sparse keyed series") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(20260814L)
    // 3 keys x 200 ticks, two columns with independent ~70% null rates
    // → many all-null buckets, so carries must hop empty buckets
    val rows = for (k <- 1 to 3; t <- 1 to 200) yield (
      k.toLong, t.toLong,
      if (rnd.nextDouble() < 0.7) null else java.lang.Double.valueOf(rnd.nextInt(100)),
      if (rnd.nextDouble() < 0.7) null else java.lang.Double.valueOf(rnd.nextInt(100)))
    val df = rows.toDF("k", "ord", "x", "y")
    val plain = Relational.forwardFill(df, Seq("k"), "ord", Seq("x", "y"))
    val bucketed = Relational.forwardFillBucketed(df, Seq("k"), "ord",
      Seq("x", "y"), bucket = floor(col("ord") / 7))
    assert(canon(bucketed) == canon(plain))
  }

  test("keyless global series: the case the plain window cannot distribute") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7L)
    val rows = (1 to 500).map(t => (t.toLong,
      if (rnd.nextDouble() < 0.8) null else java.lang.Double.valueOf(rnd.nextInt(100))))
    val df = rows.toDF("ord", "x")
    val plain = Relational.forwardFill(df, Nil, "ord", Seq("x"))
    val bucketed = Relational.forwardFillBucketed(df, Nil, "ord",
      Seq("x"), bucket = floor(col("ord") / 50))
    assert(canon(bucketed) == canon(plain))
    // the data-level window really partitions by the bucket: the plan
    // carries the bucket column into the window spec
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(plan.contains("__ffb"), "bucket column missing from the plan")
  }
}
