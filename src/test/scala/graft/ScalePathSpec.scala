package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Relational
import graft.sources.Bucketed
import graft.streaming.StreamDedup

class ScalePathSpec extends SparkSpec {

  test("bucketed co-located join: SortMergeJoin with zero Exchange on either side") {
    val orders = Tables.orders(spark, sf("sf0.001"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf("sf0.001"))
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    // fresh in-memory catalog each JVM: drop any orphaned managed-table
    // location a previous test run left in the warehouse dir
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Bucketed.write(orders, "b_orders", 8, Seq("o_orderkey"), Seq("o_orderkey"))
    Bucketed.write(lineitem, "b_lineitem", 8, Seq("o_orderkey"), Seq("o_orderkey"))
    // at sf0.001 both sides fit the broadcast threshold, which would
    // hide the layout; disable it to surface the fact-fact plan shape
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.cojoin(spark, "b_orders", "b_lineitem", Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it is the same result a plain join computes
      val plain = orders.join(lineitem, "o_orderkey")
      assert(joined.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("approx distribution stats track exact within sketch tolerance") {
    val events = Tables.events(spark, sf("sf0.001"))
    val exact = Relational.distributionStats(events, Seq("event_type"), "value")
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Relational.distributionStatsApprox(events, Seq("event_type"), "value")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    val values = events.select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (k, rs) =>
        k -> rs.map(_.getDouble(1)).sorted
      }
    // exact cols: key, avg, p50, p95, p99, min, max, stddev, count
    // approx cols: key, avg, p50, p95, p99, min, max, count
    exact.foreach { case (k, e) =>
      val a = approx(k)
      // same count/min/max; percentiles within the sketch's rank
      // guarantee: approx returns an ACTUAL element whose rank is
      // within ±1 of the target (accuracy 10000 ⇒ rank error < 1 at
      // this n), where exact interpolates — so the approx value must
      // lie inside the element bracket around the target rank
      assert(a.getLong(7) == e.getLong(8))
      assert(a.getDouble(5) == e.getDouble(5) && a.getDouble(6) == e.getDouble(6))
      val sorted = values(k)
      Seq(0.5 -> 2, 0.95 -> 3, 0.99 -> 4).foreach { case (p, i) =>
        val rank = p * (sorted.length - 1)
        val lo = sorted(math.max(math.floor(rank).toInt - 1, 0))
        val hi = sorted(math.min(math.ceil(rank).toInt + 1, sorted.length - 1))
        assert(a.getDouble(i) >= lo && a.getDouble(i) <= hi,
          s"$k p$p: approx ${a.getDouble(i)} outside [$lo, $hi]")
      }
    }
  }

  test("partitionBy write + filtered read prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf("sf0.001"))
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = back.queryExecution.executedPlan.toString
    // the filter must become a PartitionFilters entry (directory
    // pruning — zero bytes read from other event types), not a scan
    // over everything plus a Filter
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert(back.count() ==
      Tables.events(spark, sf("sf0.001")).filter("event_type = 'click'").count())
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
  }

  test("salted join: identical results to plain join, hot key spread over many partitions") {
    val s = spark
    import s.implicits._
    // 90% of left rows carry one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong))
      .toDF("k", "row_id")
    val right = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "label")
    val plain = left.join(right, Seq("k"))
    val salted = Relational.saltedJoin(left, right, Seq("k"), "row_id", 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      plain.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    // with AQE coalescing off, the hot key's rows occupy many shuffle
    // partitions instead of one
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import org.apache.spark.sql.functions.spark_partition_id
      def hotParts(df: org.apache.spark.sql.DataFrame) =
        df.filter("k = 42").select(spark_partition_id()).distinct().count()
      val saltedParts = hotParts(Relational.saltedJoin(left, right, Seq("k"), "row_id", 8))
      val plainParts = hotParts(left.join(right, Seq("k")))
      assert(plainParts == 1L, s"plain join spread hot key over $plainParts")
      assert(saltedParts >= 4L, s"salted join only used $saltedParts partitions")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    }
  }

  test("streaming quantile sketch == batch sketch after draining the same rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def t(x: String) = Timestamp.valueOf(x)
    // two 1-hour windows × two keys; values chosen so approx_percentile
    // (which returns actual elements) is deterministic at high accuracy
    val rows = (0 until 40).map { i =>
      Ev(t(f"2024-01-01 ${10 + i % 2}%02d:${i % 30}%02d:00"),
        if (i % 4 < 2) "a" else "b", (i * 7 % 23).toDouble, 100L + i)
    }
    val mem = MemoryStream[Ev]
    mem.addData(rows)
    val out = Relational.distributionStatsApproxStream(
      mem.toDF, "ts", "1 hour", Seq("k"), "v")
    val q = out.writeStream.format("memory").queryName("approx_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.toSeq.map(String.valueOf(_)).mkString("|")).sorted.toSeq
    val streamed = canon(s.table("approx_stream"))
    val batch = canon(Relational.distributionStatsApproxStream(
      rows.toDF, "ts", "1 hour", Seq("k"), "v"))
    assert(streamed == batch)
    assert(streamed.size == 4, s"expected 2 windows x 2 keys, got $streamed")
  }

  test("streaming dedup within watermark drops redelivered ids, == batch dedup") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def t(x: String) = Timestamp.valueOf(x)
    val rows = Seq(
      Ev(t("2024-01-01 10:00:00"), "a", 1.0, 100),
      Ev(t("2024-01-01 10:00:30"), "a", 1.0, 100), // redelivery of 100
      Ev(t("2024-01-01 10:01:00"), "b", 2.0, 101),
      Ev(t("2024-01-01 10:01:30"), "b", 2.0, 101), // redelivery of 101
      Ev(t("2024-01-01 10:02:00"), "c", 3.0, 102))
    val mem = MemoryStream[Ev]
    mem.addData(rows)
    val out = StreamDedup.byKeyWithinWatermark(mem.toDF, "ts", "5 minutes", Seq("o"))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = s.table("dedup_out").select("o").collect().map(_.getLong(0)).sorted
    val batch = StreamDedup.byKeyWithinWatermark(rows.toDF, "ts", "5 minutes", Seq("o"))
      .select("o").collect().map(_.getLong(0)).sorted
    assert(streamed.toSeq == Seq(100L, 101L, 102L))
    assert(streamed.toSeq == batch.toSeq)
  }
}
