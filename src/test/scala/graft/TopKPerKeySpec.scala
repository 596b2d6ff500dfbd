package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerKey

class TopKPerKeySpec extends SparkSpec {

  test("heap top-k equals window row_number + filter on real orders") {
    val orders = Tables.orders(spark, sf("sf0.001"))
    val heap = TopKPerKey(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
      .collect().map(_.toSeq).toSet
    val window = orders
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))).cast("long"))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
      .collect().map(_.toSeq).toSet
    assert(heap == window)
    assert(heap.nonEmpty)
  }

  test("physical plan uses TopKPerKeyExec with one hash exchange and no sort") {
    val orders = Tables.orders(spark, sf("sf0.001"))
    val df = TopKPerKey(orders, Seq("o_custkey"), Seq("o_totalprice" -> false), k = 2)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey"))
    assert(!physical.toLowerCase.contains("sortexec"))
  }

  test("groups smaller than k emit all rows; ties broken by order columns") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 10L, 1L), ("a", 10L, 2L), ("a", 5L, 3L), ("a", 1L, 4L),
      ("b", 7L, 5L)).toDF("k", "score", "id")
    val out = TopKPerKey(df, Seq("k"), Seq("score" -> false, "id" -> true), k = 3)
      .select("k", "id", "rnk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("b", 5L, 1L)))
  }

  test("autoTopK rule rewrites row_number+filter to the heap plan, results unchanged") {
    val orders = Tables.orders(spark, sf("sf0.001"))
    def idiom = orders
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))).cast("long"))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    val off = idiom.collect().map(_.toSeq).toSet
    assert(!idiom.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    spark.conf.set("spark.graft.autoTopK", "true")
    try {
      val p = idiom.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerKey"), s"rule did not fire:\n$p")
      assert(!p.toLowerCase.contains("sortexec"), s"sort survived:\n$p")
      assert(idiom.collect().map(_.toSeq).toSet == off)
    } finally spark.conf.set("spark.graft.autoTopK", "false")
  }
}
