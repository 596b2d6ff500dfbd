package graft

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.LatencyTracker
import graft.streaming.LatencyTracker.{LatencySample, Obs}

class LatencyTrackerSpec extends SparkSpec {

  private val obs = Seq(
    Obs(1000L, "wind", producer_ts = 1000L, observed_ts = 1500L),
    Obs(1000L, "wind", producer_ts = 1100L, observed_ts = 1900L), // latency 900
    Obs(1000L, "sun", producer_ts = 1050L, observed_ts = 1250L),  // latency 200
    Obs(2000L, "wind", producer_ts = 2000L, observed_ts = 2400L)) // latency 400

  private val expected = Set(
    LatencySample(1000L, "wind", 900L, 2),
    LatencySample(1000L, "sun", 200L, 1),
    LatencySample(2000L, "wind", 400L, 1))

  test("batch twin computes per-window latency from min producer / max observed") {
    val s = spark
    import s.implicits._
    val out = LatencyTracker.trackBatch(s, obs.toDS).collect().toSet
    assert(out == expected)
  }

  test("flatMapGroupsWithState emits each window once its group goes quiet") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Obs]
    mem.addData(obs)
    val q = LatencyTracker.track(s, mem.toDS, quietMs = 300)
      .writeStream.format("memory").queryName("lat_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (s.table("lat_out").count() < 3 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
      }
      val streamed = s.table("lat_out").as[LatencySample].collect().toSet
      assert(streamed == expected)
    } finally q.stop()
  }
}
