package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stateful recovery across query restarts — the exactly-once story a
  * production stream needs: stop a windowed aggregation mid-stream,
  * restart it from the checkpoint with new data, and the recovered
  * state must produce exactly the batch answer over ALL data (no lost
  * windows, no double counting). */
class CheckpointRecoverySpec extends SparkSpec {
  private def t(s: String) = Timestamp.valueOf(s)

  test("windowed agg state survives a query restart from checkpoint") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val batch1 = Seq(
      Ev(t("2024-01-01 10:05:00"), "wind", 1.0, 1),
      Ev(t("2024-01-01 10:10:00"), "wind", 3.0, 2),
      Ev(t("2024-01-01 10:20:00"), "sun", 5.0, 3))
    // batch2 lands in the SAME window as batch1's wind rows — merging
    // them correctly is only possible if the restarted query recovered
    // the window state (complete mode on a fresh query would otherwise
    // show only batch2)
    val batch2 = Seq(
      Ev(t("2024-01-01 10:25:00"), "wind", 5.0, 4),
      Ev(t("2024-01-01 11:05:00"), "sun", 7.0, 5))

    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val mem = MemoryStream[Ev]
    def outDf = streaming.WeatherPipeline
      .windowed(Seq(mem.toDF), "ts", Seq("k"), "v", "o", "1 hour")
      .drop("processing_end_ts") // wall-clock stamp; irrelevant here
    def start() = outDf.writeStream.format("memory")
      .queryName("ckpt_out").outputMode("complete")
      .option("checkpointLocation", ckpt).start()

    val q1 = start()
    mem.addData(batch1)
    q1.processAllAvailable()
    q1.stop()

    mem.addData(batch2)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val cols = Seq("window_start", "window_end", "k",
      "avg_value", "min_value", "max_value", "message_count", "min_ord")
    val streamed = s.table("ckpt_out")
      .select(cols.head, cols.tail: _*).collect().toSet
    val batchAll = streaming.WeatherPipeline.windowed(
      Seq((batch1 ++ batch2).toDF), "ts", Seq("k"), "v", "o", "1 hour")
      .drop("processing_end_ts")
      .select(cols.head, cols.tail: _*).collect().toSet
    assert(streamed == batchAll)
    // the merged 10:00 wind window must aggregate rows from BOTH runs
    val merged = s.table("ckpt_out")
      .filter(col("k") === "wind" && col("window_start") === "2024-01-01 10:00:00")
      .select("message_count").as[Long].head()
    assert(merged === 3L, "restart lost or doubled pre-restart state")
  }
}
