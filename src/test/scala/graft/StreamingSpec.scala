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

  test("KafkaIO builders carry the reference's exact option keys") {
    // reader keys of SparkWeatherConsumer.scala:163-183, writer keys
    // of :128-142 — key-set equality, not subset, so a drifting
    // builder fails here
    val src = KafkaIO.source("b:9092", Seq("wind", "sun"),
      startingOffsets = "earliest", maxOffsetsPerTrigger = Some(1000),
      minPartitions = Some(5))
    assert(src.keySet == Set(
      "kafka.bootstrap.servers", "subscribe", "startingOffsets",
      "failOnDataLoss", "kafka.fetch.min.bytes", "kafka.fetch.max.wait.ms",
      "maxOffsetsPerTrigger", "minPartitions"))
    assert(src("kafka.bootstrap.servers") == "b:9092")
    assert(src("subscribe") == "wind,sun")
    assert(src("startingOffsets") == "earliest")
    assert(src("maxOffsetsPerTrigger") == "1000")
    assert(src("failOnDataLoss") == "false")
    assert(src("minPartitions") == "5")
    val snk = KafkaIO.sink("b:9092", "agg-out", "/tmp/ckpt")
    assert(snk.keySet == Set(
      "kafka.bootstrap.servers", "topic", "checkpointLocation",
      "kafka.compression.type", "kafka.batch.size", "kafka.linger.ms",
      "kafka.acks"))
    assert(snk("topic") == "agg-out" && snk.contains("checkpointLocation"))
    assert(snk("kafka.compression.type") == "snappy" && snk("kafka.acks") == "1")
  }

  test("kafka reader/writer plans build through StreamIO without the connector jar") {
    val s = spark
    // reader: the builder path accepts the full kafka option set;
    // provider-class resolution happens at load() — in this
    // environment (no kafka jar) that is the one failure point, and
    // the error must be the missing DATA SOURCE, not an option/plan
    // problem upstream of it
    val rd = graft.streaming.StreamIO.reader(
      s, "kafka", KafkaIO.source("b:9092", Seq("wind")))
    val e = intercept[Exception] { rd.load() }
    assert(String.valueOf(e.getMessage).toLowerCase.contains("kafka"),
      s"unexpected failure: ${e.getMessage}")
    // writer: full reference sink config + update mode + trigger
    // builds a DataStreamWriter fine; start() is the resolution point
    val streamDf = s.readStream.format("rate").option("rowsPerSecond", "1").load()
    val w = WeatherPipeline.writer(streamDf, "kafka",
      options = KafkaIO.sink("b:9092", "agg-out", "/tmp/ckpt_kafka_spec"))
    val e2 = intercept[Exception] { w.start() }
    assert(String.valueOf(e2.getMessage).toLowerCase.contains("kafka"),
      s"unexpected failure: ${e2.getMessage}")
    // file branch of the same dispatch opens and streams for real
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val evSchema = s.read.parquet(sf("sf0.001") + "/events.parquet").schema
    val fileDf = graft.streaming.StreamIO.open(
      s, "parquet", Map("pathGlobFilter" -> "events.parquet"),
      schema = Some(evSchema), path = Some(sf("sf0.001")))
    assert(fileDf.isStreaming)
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
