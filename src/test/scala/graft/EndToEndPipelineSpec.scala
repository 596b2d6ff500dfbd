package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.AvroWire
import graft.sources.AvroWire.WeatherReading
import graft.streaming.WeatherPipeline

/** The whole reference pipeline, end to end, in one streaming test:
  * producer-encode (Confluent wire framing + Avro) → two "topics" →
  * consumer-decode → union → watermark → tumbling window agg →
  * monitor-side distribution stats — the full
  * producer/ksqlDB-or-spark-consumer/latency-monitor chain of the
  * reference, driven through MemoryStream instead of Kafka (no broker
  * in this environment; the byte format on the wire is identical).
  */
class EndToEndPipelineSpec extends SparkSpec {

  private def readings(metric: String, n: Int): Seq[WeatherReading] =
    (0 until n).map { i =>
      WeatherReading(
        station_id = s"st${i % 3}", station_name = s"Station ${i % 3}",
        metric = metric, value = (i % 50) + 0.25,
        producer_ts = 1704100000000L + i * 7000L) // 7s apart
    }

  test("wire-encoded producer → streaming decode → union → windowed agg == batch; monitor stats close the loop") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val wind = readings("wind", 120)
    val sun = readings("sunshine", 120)

    // producer side: typed rows → Confluent-framed Avro bytes
    def wire(rs: Seq[WeatherReading]): Seq[Array[Byte]] =
      AvroWire.encodeWeather(rs.toDS, schemaId = 7)
        .select("value").as[Array[Byte]].collect().toSeq

    // consumer side: two byte streams, decoded independently (the
    // reference reads two topics), then unioned into one windowed agg
    val memW = MemoryStream[Array[Byte]]; memW.addData(wire(wind))
    val memS = MemoryStream[Array[Byte]]; memS.addData(wire(sun))
    def decoded(m: MemoryStream[Array[Byte]]) =
      AvroWire.decodeWeather(m.toDF.select(col("value")))
        .withColumn("ts", timestamp_millis(col("producer_ts")))
    val streamed = WeatherPipeline.windowed(
      Seq(decoded(memW).toDF, decoded(memS).toDF),
      "ts", Seq("station_id", "metric"), "value", "producer_ts", "1 minute")
    val q = streamed.writeStream.format("memory").queryName("e2e_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val cols = Seq("window_start", "window_end", "station_id", "metric",
      "avg_value", "min_value", "max_value", "message_count", "min_ord")
    val got = s.table("e2e_out").select(cols.head, cols.tail: _*)
      .collect().map(_.toSeq).toSet

    // batch reference path over the original (pre-wire) rows
    val batch = WeatherPipeline.windowed(
      Seq((wind ++ sun).toDF.withColumn("ts", timestamp_millis(col("producer_ts")))),
      "ts", Seq("station_id", "metric"), "value", "producer_ts", "1 minute")
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(got == batch)
    assert(got.nonEmpty)

    // monitor side: per-window latency analog (close − earliest
    // producer stamp) distribution over the aggregated output
    val monitored = s.table("e2e_out")
      .withColumn("latency_ms",
        unix_millis(to_timestamp(col("window_end"))) - col("min_ord"))
      .filter(col("latency_ms") > 0)
    val stats = graft.operators.Relational.distributionStats(
      monitored, Seq.empty, "latency_ms").head
    assert(stats.getLong(7) == monitored.count()) // sample_count
    assert(stats.getLong(4) > 0)                  // min latency positive
  }

  test("the windowed output table lands in the storage layer: " +
    "update-mode stream → snapshot merge sink == batch recompute") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_e2e_tbl").toString
    val dst = s"$root/out"; val ckpt = s"$root/ckpt"

    val wind = readings("wind", 120)
    val sun = readings("sunshine", 120)
    val mem = MemoryStream[WeatherReading]
    val streamed = WeatherPipeline.windowed(
      Seq(mem.toDF.withColumn("ts", timestamp_millis(col("producer_ts")))),
      "ts", Seq("station_id", "metric"), "value", "producer_ts", "1 minute")
      .drop("processing_end_ts") // wall-clock stamp, not comparable
    // ksqlDB's output TABLE, re-expressed: evolving windows upsert into
    // a snapshot table keyed by (window, station, metric) — the sink
    // defaults op-less rows to batch-sequenced upserts (LWW per key)
    val q = streamed.writeStream.outputMode("update")
      .format("graft-snapshot")
      .option("dir", dst).option("mode", "merge")
      .option("keyCols", "window_start,station_id,metric")
      .option("checkpointLocation", ckpt).start()
    try {
      // two triggers split by event time: trigger 2 REVISES the split
      // window, so the sink must upsert, not append
      mem.addData(wind.take(60) ++ sun.take(60))
      q.processAllAvailable()
      mem.addData(wind.drop(60) ++ sun.drop(60))
      q.processAllAvailable()
    } finally q.stop()

    val cols = Seq("window_start", "window_end", "station_id", "metric",
      "avg_value", "min_value", "max_value", "message_count", "min_ord")
    val table = graft.sources.Snapshots.read(spark, dst)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val batch = WeatherPipeline.windowed(
      Seq((wind ++ sun).toDF.withColumn("ts", timestamp_millis(col("producer_ts")))),
      "ts", Seq("station_id", "metric"), "value", "producer_ts", "1 minute")
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(table == batch,
      "the maintained output table must equal the batch recompute")
    assert(table.nonEmpty)
  }
}
