package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamJoin

case class Click(user_id: Long, ts: Timestamp, click_id: Long)
case class Buy(user_id: Long, ts: Timestamp, buy_id: Long)

class StreamJoinSpec extends SparkSpec {
  private def t(s: String) = Timestamp.valueOf(s)

  private val clicks = Seq(
    Click(1, t("2024-01-01 10:00:00"), 100),
    Click(1, t("2024-01-01 12:00:00"), 101),
    Click(2, t("2024-01-01 10:30:00"), 102))
  private val buys = Seq(
    Buy(1, t("2024-01-01 10:40:00"), 900), // within 1h of click 100
    Buy(1, t("2024-01-01 13:30:00"), 901), // outside 1h of click 101
    Buy(2, t("2024-01-01 10:35:00"), 902), // within 1h of click 102
    Buy(3, t("2024-01-01 10:00:00"), 903)) // no clicking user

  test("streaming interval join == batch interval join (parity)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mc = MemoryStream[Click]; mc.addData(clicks)
    val mb = MemoryStream[Buy]; mb.addData(buys)
    val streamed = StreamJoin.withinJoin(
      StreamJoin.marked(mc.toDF, "ts", "10 minutes"),
      StreamJoin.marked(mb.toDF, "ts", "10 minutes"),
      Seq("user_id"), "ts", before = "0 seconds", after = "1 hour")
      .select("user_id", "click_id", "buy_id_r")
    val q = streamed.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = s.table("ij_out").collect().map(_.toSeq).toSet
    val batch = StreamJoin.withinJoin(clicks.toDF, buys.toDF,
      Seq("user_id"), "ts", "0 seconds", "1 hour")
      .select("user_id", "click_id", "buy_id_r").collect().map(_.toSeq).toSet
    assert(got == batch)
    assert(got == Set(Seq(1L, 100L, 900L), Seq(2L, 102L, 902L)))
  }

  test("left-outer WITHIN join: streaming emits null-padded rows on watermark close, == batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // anchors push the watermark past every real row's interval so the
    // unmatched left rows' nulls are emitted; the anchors' own rows
    // stay open, so exclude them from the comparison
    val aC = Click(99, t("2024-01-03 00:00:00"), 999)
    val aB = Buy(98, t("2024-01-03 00:00:00"), 998)
    val mc = MemoryStream[Click]; mc.addData(clicks :+ aC)
    val mb = MemoryStream[Buy]; mb.addData(buys :+ aB)
    val streamed = StreamJoin.withinJoin(
      StreamJoin.marked(mc.toDF, "ts", "10 minutes"),
      StreamJoin.marked(mb.toDF, "ts", "10 minutes"),
      Seq("user_id"), "ts", "0 seconds", "1 hour", joinType = "left_outer")
      .select("user_id", "click_id", "buy_id_r")
    val q = streamed.writeStream.format("memory").queryName("loj_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = s.table("loj_out").filter("user_id < 90")
      .collect().map(_.toSeq).toSet
    val batch = StreamJoin.withinJoin(clicks.toDF, buys.toDF,
      Seq("user_id"), "ts", "0 seconds", "1 hour", joinType = "left_outer")
      .select("user_id", "click_id", "buy_id_r").collect().map(_.toSeq).toSet
    assert(got == batch)
    // click 101 (13:30 buy is outside its hour) survives null-padded
    assert(got.contains(Seq(1L, 101L, null)))
    assert(got.size == 3)
  }

  test("interval-join plan carries the time bound in the join condition (bounded state)") {
    val s = spark
    import s.implicits._
    val plan = StreamJoin.withinJoin(clicks.toDF, buys.toDF,
      Seq("user_id"), "ts", "0 seconds", "1 hour")
      .queryExecution.optimizedPlan.toString
    // the bound must sit in the join, not a post-join Filter node
    assert(!plan.split("\n").exists(l => l.trim.startsWith("Filter") && l.contains("ts")),
      s"time bound leaked into a Filter:\n$plan")
  }

  test("stream-table enrich: latest-per-key compaction + broadcast join, parity") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // changelog with updates: user 1's value moves 5.0 -> 7.5
    val changelog = Seq((1L, 10L, 5.0), (1L, 20L, 7.5), (2L, 15L, 3.0))
      .toDF("user_id", "event_id", "value")
    val mc = MemoryStream[Click]; mc.addData(clicks)
    val streamed = StreamJoin.enrich(mc.toDF, changelog,
      Seq("user_id"), "event_id", Seq("value"))
      .select("user_id", "click_id", "latest_value")
    val q = streamed.writeStream.format("memory").queryName("en_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = s.table("en_out").collect().map(_.toSeq).toSet
    assert(got == Set(Seq(1L, 100L, 7.5), Seq(1L, 101L, 7.5), Seq(2L, 102L, 3.0)))
    // batch shape broadcasts the compacted dimension
    val phys = StreamJoin.enrich(clicks.toDF, changelog,
      Seq("user_id"), "event_id", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), phys)
  }
}
