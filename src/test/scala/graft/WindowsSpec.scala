package graft

import org.apache.spark.sql.functions._
import graft.operators.Windows
import java.sql.Timestamp

case class Ev(ts: Timestamp, k: String, v: Double, o: Long)

class WindowsSpec extends SparkSpec {
  private def t(s: String) = Timestamp.valueOf(s)

  private def sample = {
    val s = spark
    import s.implicits._
    Seq(
      Ev(t("2024-01-01 10:05:00"), "a", 1.25, 1),
      Ev(t("2024-01-01 10:45:00"), "a", 2.75, 2),
      Ev(t("2024-01-01 11:05:00"), "a", 10.00, 3),
      Ev(t("2024-01-01 10:30:00"), "b", 5.50, 4)).toDF
  }

  test("tumbling window: bounds, avg/min/max/count/min-ord per key") {
    val out = Windows.tumblingAgg(sample, "ts", Seq("k"), "v", "o", "1 hour")
      .orderBy("k", "window_start").collect()
    assert(out.length == 3)
    val first = out.head
    assert(first.getAs[String]("window_start") == "2024-01-01 10:00:00")
    assert(first.getAs[String]("window_end") == "2024-01-01 11:00:00")
    assert(first.getAs[Double]("avg_value") == 2.0) // (1.25+2.75)/2
    assert(first.getAs[Double]("min_value") == 1.25)
    assert(first.getAs[Double]("max_value") == 2.75)
    assert(first.getAs[Long]("message_count") == 2)
    assert(first.getAs[Long]("min_ord") == 1)
  }

  test("hopping window: each event lands in size/slide windows") {
    val out = Windows.hoppingAgg(sample, "ts", Seq("k"), "v", "o", "2 hours", "1 hour")
    // every event is in exactly 2 windows → total count doubles
    assert(out.agg(sum("message_count")).head.getLong(0) == 8)
  }

  test("session window: gap splits sessions per key") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Ev(t("2024-01-01 10:00:00"), "a", 1, 1),
      Ev(t("2024-01-01 10:10:00"), "a", 2, 2), // same session (10 min gap)
      Ev(t("2024-01-01 12:00:00"), "a", 3, 3)  // new session
    ).toDF
    val out = Windows.sessionAgg(df, "ts", Seq("k"), "v", "o", "30 minutes")
    assert(out.count() == 2)
  }

  test("unionAll merges homogeneous frames without loss") {
    val u = Windows.unionAll(Seq(sample, sample))
    assert(u.count() == 8)
  }

  test("event-time vs processing-time clock switch (reference USE_EVENT_TIME)") {
    val (evDf, evCol) = Windows.withClock(sample, Windows.EventTime, "ts")
    assert(evCol == "ts" && evDf.columns.sameElements(sample.columns))
    val (procDf, procCol) = Windows.withClock(sample, Windows.ProcessingTime, "ts")
    assert(procCol == "processing_time" && procDf.columns.contains("processing_time"))
    // aggregating on the stamped processing-time column yields one
    // current-time window holding all rows
    val out = Windows.tumblingAgg(procDf, procCol, Seq("k"), "v", "o", "1 hour")
    assert(out.agg(sum("message_count")).head.getLong(0) == 4)
  }
}
