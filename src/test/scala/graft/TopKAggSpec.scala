package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class TopKAggSpec extends SparkSpec {

  private def events = Tables.events(spark, sf("sf0.001"))

  test("BoundedTopK matches sort_array(collect_list) reference across partitions") {
    val s = spark
    import s.implicits._
    // 40 partitions over planted data forces partial buffers + merges
    val df = (1 to 10000).map(i => (i % 7L, (i * 2654435761L % 1000).toDouble))
      .toDF("k", "v").repartition(40)
    val ours = df.groupBy("k")
      .agg(Relational.topK(col("v"), 5).as("t"))
    val ref = df.groupBy("k")
      .agg(slice(reverse(array_sort(collect_list(col("v")))), 1, 5).as("t"))
    assert(ours.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toMap == ref.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap)
  }

  test("topKDistinct dedups: planted duplicates collapse to distinct ranks") {
    val s = spark
    import s.implicits._
    val df = Seq.fill(50)(Seq(9L, 9L, 7L, 5L, 5L, 3L, 1L)).flatten
      .map(("g", _)).toDF("k", "v").repartition(8)
    val out = df.groupBy("k")
      .agg(Relational.topKDistinct(col("v"), 3).as("t"))
      .head.getSeq[Long](1)
    assert(out == Seq(9L, 7L, 5L))
    val plain = df.groupBy("k")
      .agg(Relational.topK(col("v"), 3).as("t"))
      .head.getSeq[Long](1)
    assert(plain == Seq(9L, 9L, 9L))
  }

  test("string values and null handling") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", "pear"), ("g", null), ("g", "apple"), ("g", "zeta"),
      ("g", "mango")).toDF("k", "v")
    val out = df.groupBy("k")
      .agg(Relational.topK(col("v"), 2).as("t"))
      .head.getSeq[String](1)
    assert(out == Seq("zeta", "pear"))
  }

  test("graft_topk / graft_topk_distinct are SQL-callable via extensions") {
    events.createOrReplaceTempView("ev_topk")
    val r = spark.sql(
      """SELECT event_type,
        |       graft_topk(value, 3) AS tv,
        |       graft_topk_distinct(user_id, 3) AS tu
        |FROM ev_topk WHERE value IS NOT NULL GROUP BY event_type""".stripMargin)
    assert(r.count() > 0)
    val row = r.head
    assert(row.getSeq[Double](1).size <= 3)
    val tu = row.getSeq[Long](2)
    assert(tu == tu.distinct && tu == tu.sorted.reverse)
  }

  test("graft_frequent_items is SQL-callable and exact at k >= distinct") {
    val s = spark
    import s.implicits._
    events.createOrReplaceTempView("ev_fi")
    val r = s.sql(
      """SELECT x.item AS t, x.est AS est
        |FROM (SELECT explode(graft_frequent_items(event_type, 50)) AS x
        |      FROM ev_fi)""".stripMargin)
      .as[(String, Long)].collect().toMap
    val exact = events.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(r == exact)
  }

  test("BoundedTopK aggregates under Structured Streaming state: windowed stream == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import java.sql.Timestamp
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def t(x: String) = Timestamp.valueOf(x)
    val rows = Seq(
      Ev(t("2024-01-01 10:05:00"), "wind", 1.25, 1),
      Ev(t("2024-01-01 10:10:00"), "wind", 9.00, 2),
      Ev(t("2024-01-01 10:20:00"), "wind", 4.50, 3),
      Ev(t("2024-01-01 10:25:00"), "wind", 7.75, 4),
      Ev(t("2024-01-01 11:05:00"), "wind", 3.00, 5),
      Ev(t("2024-01-01 10:30:00"), "sun", 5.50, 6))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(Relational.topK(col("v"), 2).as("top2"))
      .select(col("window.start").as("ws"), col("k"), col("top2"))
    val mem = MemoryStream[Ev]
    mem.addData(rows)
    val q = agg(mem.toDF.withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = s.table("topk_stream")
      .as[(Timestamp, String, Seq[Double])].collect().toSet
    val batch = agg(rows.toDF)
      .as[(Timestamp, String, Seq[Double])].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    // the map-side O(k) trim really happened: top2 of the 4-event
    // window is exactly the two largest, descending
    assert(streamed.exists(r => r._3 == Seq(9.00, 7.75)))
  }

  test("FrequentItems is exact (== groupBy count) when k >= distinct, sorted est-desc item-asc") {
    val s = spark
    import s.implicits._
    val toks = events.select(col("event_type").as("t"))
    val got = toks.agg(Relational.frequentItems(col("t"), 100).as("fi"))
      .select(explode(col("fi")).as("x"))
      .select(col("x.item").as("t"), col("x.est"))
      .as[(String, Long)].collect()
    val exact = toks.groupBy("t").count().as[(String, Long)].collect().toMap
    assert(got.toMap == exact)
    got.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0)._2 > w(1)._2 || (w(0)._2 == w(1)._2 && w(0)._1 < w(1)._1))
    }
  }

  test("Misra-Gries bounds at k < distinct: heavy items present, undercount <= n/(k+1)") {
    val s = spark
    import s.implicits._
    // 50 a's + 30 b's + 60 distinct noise items, k = 3: n/(k+1) = 35,
    // so a (50 > 35) must survive any eviction pattern
    val data = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ (0 until 60).map(i => f"c$i%02d")
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size
    for (parts <- Seq(1, 4, 13)) {
      val out = data.toDF("t").repartition(parts)
        .agg(Relational.frequentItems(col("t"), 3).as("fi"))
        .select(explode(col("fi")).as("x"))
        .select(col("x.item").as("t"), col("x.est"))
        .as[(String, Long)].collect()
      assert(out.length <= 3, s"state bound violated at parts=$parts")
      assert(out.exists(_._1 == "a"), s"guaranteed heavy item evicted at parts=$parts")
      out.foreach { case (item, est) =>
        assert(est <= truth(item), s"$item overcounted at parts=$parts")
        assert(est >= truth(item) - n / (3 + 1), s"$item undercount bound broken at parts=$parts")
      }
    }
  }

  test("approx_count_distinct tracks exact within 5%") {
    val exact = events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val approx = events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.05, s"$k: exact=$n approx=$a")
    }
  }
}
