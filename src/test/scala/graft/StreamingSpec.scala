package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{KafkaIO, ReplayProducer, WeatherPipeline}
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  private def t(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    Ev(t("2024-01-01 10:05:00"), "wind", 1.25, 1),
    Ev(t("2024-01-01 10:45:00"), "wind", 2.75, 2),
    Ev(t("2024-01-01 11:05:00"), "sun", 10.00, 3),
    Ev(t("2024-01-01 10:30:00"), "sun", 5.50, 4))

  test("streaming windowed agg == batch windowed agg (parity)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[Ev]
    mem.addData(rows)
    val streamOut = WeatherPipeline.windowed(
      Seq(mem.toDF), "ts", Seq("k"), "v", "o", "1 hour")
    val q = streamOut.writeStream.format("memory")
      .queryName("parity_out").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val cols = Seq("window_start", "window_end", "k",
      "avg_value", "min_value", "max_value", "message_count", "min_ord")
    val streamed = s.table("parity_out")
      .select(cols.head, cols.tail: _*).collect().toSet
    val batch = WeatherPipeline.windowed(
      Seq(rows.toDF), "ts", Seq("k"), "v", "o", "1 hour")
      .select(cols.head, cols.tail: _*).collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming session windows (stateful merge) == batch session agg") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val sessRows = Seq(
      Ev(t("2024-01-01 10:00:00"), "a", 1, 1),
      Ev(t("2024-01-01 10:10:00"), "a", 2, 2), // same session
      Ev(t("2024-01-01 12:00:00"), "a", 3, 3), // new session
      Ev(t("2024-01-01 10:05:00"), "b", 4, 4))
    // anchor advances the watermark far past every session above, so
    // append mode (the only mode session windows support besides
    // complete) closes and emits them; the anchor's own session stays
    // open and is withheld
    val anchor = Ev(t("2024-01-02 00:00:00"), "z", 0, 9)
    val mem = MemoryStream[Ev]
    mem.addData(sessRows :+ anchor)
    val out = operators.Windows.sessionAgg(
      mem.toDF.withWatermark("ts", "2 minutes"),
      "ts", Seq("k"), "v", "o", "30 minutes")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = s.table("sess_out").collect().map(_.toSeq).toSet
    val batch = operators.Windows.sessionAgg(
      sessRows.toDF, "ts", Seq("k"), "v", "o", "30 minutes")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.size == 3)
  }

  test("EMIT FINAL analog: append-mode tumbling agg emits each closed window once, == batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // anchor advances the watermark past every real window so append
    // mode (ksqlDB EMIT FINAL) closes and emits them exactly once
    val anchor = Ev(t("2024-01-02 00:00:00"), "z", 0, 9)
    val mem = MemoryStream[Ev]
    mem.addData(rows :+ anchor)
    val out = operators.Windows.tumblingAgg(
      mem.toDF.withWatermark("ts", "2 minutes"),
      "ts", Seq("k"), "v", "o", "1 hour")
    val q = out.writeStream.format("memory").queryName("final_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = s.table("final_out").collect().map(_.toSeq).toSet
    val batch = operators.Windows.tumblingAgg(
      rows.toDF, "ts", Seq("k"), "v", "o", "1 hour")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.size == 3) // one row per closed (window, key)
  }

  test("update-mode writer carries the reference trigger/output config") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(rows)
    val out = WeatherPipeline.windowed(Seq(mem.toDF), "ts", Seq("k"), "v", "o", "1 hour")
    val q = WeatherPipeline.writer(out, "memory", "100 milliseconds")
      .queryName("update_out").start()
    try {
      q.processAllAvailable()
      assert(s.table("update_out").count() > 0)
    } finally q.stop()
  }

  test("KafkaIO builders carry the reference's option keys") {
    val src = KafkaIO.source("b:9092", Seq("wind", "sun"),
      startingOffsets = "earliest", maxOffsetsPerTrigger = Some(1000))
    assert(src("kafka.bootstrap.servers") == "b:9092")
    assert(src("subscribe") == "wind,sun")
    assert(src("startingOffsets") == "earliest")
    assert(src("maxOffsetsPerTrigger") == "1000")
    val snk = KafkaIO.sink("b:9092", "agg-out", "/tmp/ckpt")
    assert(snk("topic") == "agg-out" && snk.contains("checkpointLocation"))
  }

  test("replay producer: deterministic indexing, rate-source replay emits rows") {
    val s = spark
    import s.implicits._
    val table = rows.toDF
    val idx = ReplayProducer.indexed(table, Seq("o")).select("__idx", "o")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(idx == Map(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L))

    val stream = ReplayProducer.replay(s, table, Seq("o"), rowsPerSecond = 100)
    val q = stream.writeStream.format("memory").queryName("replay_out")
      .outputMode("append").start()
    try {
      // let a couple of micro-batches run
      val deadline = System.currentTimeMillis() + 30000
      while (s.table("replay_out").count() < 4 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
      }
      assert(s.table("replay_out").count() >= 4)
    } finally q.stop()
  }
}
