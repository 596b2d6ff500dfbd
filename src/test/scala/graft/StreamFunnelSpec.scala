package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import graft.streaming.StreamFunnel
import graft.streaming.StreamFunnel.FunnelEvent
import graft.operators.Relational

class StreamFunnelSpec extends SparkSpec {

  private val stages = Seq("view", "click", "purchase")

  /** Final (monotone-max) emitted row per user from the update stream. */
  private def finalRows(table: String): Map[Long, (Seq[Long], Long)] = {
    val s = spark
    import s.implicits._
    s.table(table).as[(Long, Seq[Long], Long)].collect()
      .groupBy(_._1).view.mapValues { rows =>
        val best = rows.maxBy(r => (r._3, r._2.sum))
        (best._2, best._3)
      }.toMap
  }

  test("streaming funnel drained over the events table == batch funnel") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ev = Tables.events(s, sf("sf0.001"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .as[FunnelEvent].collect()
    val mem = MemoryStream[FunnelEvent]
    mem.addData(ev.toSeq)
    val q = StreamFunnel.funnel(s, mem.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = finalRows("funnel_stream")
    val batch = Relational.funnel(
      Tables.events(s, sf("sf0.001")), "user_id", "ts", "event_type", stages)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((Seq(r._2, r._3, r._4), r._5))).toMap
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming sessionize drained over the events table == batch sessionize") {
    import graft.streaming.StreamSessionize
    import graft.streaming.StreamSessionize.SessEvent
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ev = Tables.events(s, sf("sf0.001"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .as[SessEvent].collect()
    val mem = MemoryStream[SessEvent]
    mem.addData(ev.toSeq)
    val q = StreamSessionize.sessionize(s, mem.toDS(), maxGapSec = 1800)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = s.table("sess_stream")
      .select("event_id", "session_idx").as[(Long, Long)].collect()
    assert(streamed.length == streamed.toSet.size, "each event labeled exactly once")
    val batch = Relational.sessionize(
      Tables.events(s, sf("sf0.001")), "user_id", "ts", "event_id", 1800)
      .select(col("event_id"), col("session_idx")).as[(Long, Long)].collect()
    assert(streamed.toSet == batch.toSet && batch.nonEmpty)
  }

  test("state persists across micro-batches; in-batch disorder is sorted away") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = StreamFunnel.funnel(s, mem.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_stream2")
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
    // batch 1: click arrives BEFORE view in arrival order but after in
    // event time — the in-batch sort must still complete both stages
    mem.addData(FunnelEvent(7L, 20L, "click"), FunnelEvent(7L, 10L, "view"))
    q.processAllAvailable()
    assert(finalRows("funnel_stream2")(7L) == ((Seq(10L, 20L, 0L), 2L)))
    // batch 2: purchase completes stage 3 using state from batch 1
    mem.addData(FunnelEvent(7L, 30L, "purchase"))
    q.processAllAvailable()
    assert(finalRows("funnel_stream2")(7L) == ((Seq(10L, 20L, 30L), 3L)))
    // an event for an already-completed stage emits nothing new
    mem.addData(FunnelEvent(7L, 40L, "view"))
    q.processAllAvailable()
    assert(finalRows("funnel_stream2")(7L) == ((Seq(10L, 20L, 30L), 3L)))
    q.stop()
  }
}
