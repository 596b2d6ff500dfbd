package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {

  private def ev = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 0L, 100L), (1L, 10L, 101L), (1L, 1810L, 102L), // 1810-10=1800: NOT > gap
      (1L, 3611L, 103L),                                  // 3611-1810=1801 > 1800: new
      (2L, 5L, 200L)
    ).toDF("user_id", "sec", "event_id")
      .withColumn("ts", timestamp_micros(col("sec") * 1000000L))
  }

  test("sessionize breaks strictly after maxGap and numbers sessions per user from 1") {
    val s = spark
    import s.implicits._
    val out = Relational.sessionize(ev, "user_id", "ts", "event_id", maxGapSec = 1800)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(out(100L) == 1L && out(101L) == 1L)
    assert(out(102L) == 1L, "gap == maxGap must NOT break the session")
    assert(out(103L) == 2L, "gap > maxGap must break")
    assert(out(200L) == 1L)
  }

  test("sessionStats aggregates count/start/end/duration per session") {
    val s = spark
    import s.implicits._
    val out = Relational.sessionStats(ev, "user_id", "ts", "event_id", maxGapSec = 1800)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(out((1L, 1L)) === ((3L, 0L, 1810000000L, 1810000000L)))
    assert(out((1L, 2L)) === ((1L, 3611000000L, 3611000000L, 0L)))
    assert(out((2L, 1L)) === ((1L, 5000000L, 5000000L, 0L)))
  }

  test("funnel: strict ordering, earliest completion, entrants-only, 0 for unreached") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // user 1: full funnel; click BEFORE the view must be ignored
      (1L, 5L, "b"), (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      // user 2: view + SIMULTANEOUS click (strictly-after → not counted)
      (2L, 10L, "a"), (2L, 10L, "b"),
      // user 3: c then a — enters, never progresses
      (3L, 1L, "c"), (3L, 2L, "a"),
      // user 4: no stage-1 event at all → absent from the output
      (4L, 1L, "b"), (4L, 2L, "c")
    ).toDF("user_id", "sec", "event_type")
      .withColumn("ts", timestamp_micros(col("sec") * 1000000L))
    val out = Relational.funnel(df, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(out(1L) === ((10000000L, 20000000L, 30000000L, 3L)))
    assert(out(2L) === ((10000000L, 0L, 0L, 1L)), "same-ts event must not advance")
    assert(out(3L) === ((2000000L, 0L, 0L, 1L)))
    assert(!out.contains(4L), "non-entrants are excluded")
  }

  test("retention: cohort = first week, cells count distinct active users per offset") {
    val s = spark
    import s.implicits._
    val wkUs = 604800000000L
    val df = Seq(
      (1L, 0L), (1L, 0L), (1L, 1L), (1L, 3L), // dup in week 0 counts once
      (2L, 1L), (2L, 1L)
    ).toDF("user_id", "wk")
      .withColumn("ts", timestamp_micros(col("wk") * wkUs + col("user_id")))
    val out = Relational.retention(df, "user_id", "ts")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out === Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L))
  }

  test("patternSearch: scaled+shifted pattern copy scores dist 0, constants excluded") {
    val s = spark
    import s.implicits._
    val pattern = Seq(1.0, 1.0, 2.0, 4.0, 2.0, 1.0)
    // user 1 carries 2*pattern+10 at positions 4..9 (z-norm invariant
    // to affine maps → exact 0 distance); user 2 is constant
    val u1 = Seq(5.0, 7.0, 6.0, 5.5) ++ pattern.map(2 * _ + 10) ++ Seq(6.0, 5.0)
    val rows =
      u1.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) } ++
        (0 until 8).map(i => (2L, i.toLong, 3.0))
    val df = rows.toDF("user_id", "sec", "value")
      .withColumn("ts", timestamp_micros(col("sec") * 1000000L))
      .withColumn("event_id", col("sec"))
    val out = Relational.patternSearch(df, Seq("user_id"), "ts", "event_id",
      "value", pattern, k = 3)
      .as[(Long, Long, Double)].collect()
    // best hit: the window ENDING at the copy's last point (sec 9)
    assert(out.head === ((1L, 9L, 0.0)))
    assert(out.forall(_._1 == 1L), "constant series must never match")
    assert(out.tail.forall(_._3 > 0.0))
  }

  test("qualityChecks: one pass, NULL predicate counts as violation, exact rates") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "ok"), (60L, "ok"), (null, "ok"), (5L, "bad")
    ).toDF("qty", "flag")
    val out = Relational.qualityChecks(df, Seq(
      "qty_band" -> col("qty").between(1, 50),
      "flag_ok" -> (col("flag") === "ok")))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // 60 violates, NULL is a violation (unknown is not a pass)
    assert(out("qty_band") === ((4L, 2L, 0.5)))
    assert(out("flag_ok") === ((4L, 1L, 0.25)))
    // single aggregation pass: one partial+final pair, <= 1 exchange
    val plan = Relational.qualityChecks(df, Seq("a" -> col("qty").isNotNull))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length <= 2 && plan.contains("partial_"),
      s"qualityChecks grew a second pass:\n$plan")
  }

  test("rollingAnomaly flags only a spike after the window has minN points") {
    val s = spark
    import s.implicits._
    // 9 stable points then a spike, 1s apart inside one 3600s window
    val vals = Seq(10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 10.2, 9.8, 10.0, 50.0)
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("user_id", "sec", "value")
      .withColumn("ts", timestamp_micros(col("sec") * 1000000L))
      .withColumn("event_id", col("sec"))
    val out = Relational.rollingAnomaly(df, Seq("user_id"), "ts", "value",
      "event_id", trailingSeconds = 3600, z = 3.0, minN = 5)
      .select("event_id", "is_anomaly").as[(Long, Boolean)].collect().toMap
    assert(out(9L), "the spike must flag")
    (0L to 8L).foreach(i => assert(!out(i), s"stable point $i flagged"))
    // under minN nothing can flag even with a huge early deviation
    val early = Seq((1L, 0L, 10.0), (1L, 1L, 500.0))
      .toDF("user_id", "sec", "value")
      .withColumn("ts", timestamp_micros(col("sec") * 1000000L))
      .withColumn("event_id", col("sec"))
    val out2 = Relational.rollingAnomaly(early, Seq("user_id"), "ts", "value",
      "event_id", 3600, z = 3.0, minN = 5)
      .select("is_anomaly").as[Boolean].collect()
    assert(out2.forall(!_))
  }

  test("topPaths: in-session type sequences in (ts,id) order, deterministic top-k") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 0L, 1L, "a"), (1L, 10L, 2L, "b"),      // session: a->b
      (1L, 5000L, 3L, "a"), (1L, 5010L, 4L, "b"), // session: a->b
      (2L, 0L, 5L, "a"), (2L, 10L, 6L, "c"),      // session: a->c
      (3L, 7L, 7L, "z")                           // session: z
    ).toDF("user_id", "sec", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("sec") * 1000000L))
    val out = Relational.topPaths(df, "user_id", "ts", "event_id", "event_type",
      maxGapSec = 1800, k = 2)
      .as[(String, Long)].collect().toSeq
    // a->b twice; tie between a->c and z broken by path asc
    assert(out === Seq(("a->b", 2L), ("a->c", 1L)))
  }

  test("quantileBin: population-balanced 0-based bins from exact percentile cutpoints") {
    val s = spark
    import s.implicits._
    val df = (1 to 16).map(i => (i.toLong, i.toDouble)).toDF("id", "value")
      .repartition(5)
    val out = Relational.quantileBin(df, "value", nBins = 4)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    // cutpoints of 1..16 at (.25,.5,.75) interpolate to 4.75/8.5/12.25
    (1 to 16).foreach { i =>
      val expect = if (i <= 4) 0L else if (i <= 8) 1L else if (i <= 12) 2L else 3L
      assert(out(i.toLong) == expect, s"value $i -> bin ${out(i.toLong)}")
    }
    assert(out.values.groupBy(identity).values.map(_.size).toSet == Set(4),
      "equi-depth bins must be balanced")
  }

  test("sessionize plans ONE exchange (both window passes share the user partitioning)") {
    val plan = Relational.sessionize(
      Tables.events(spark, sf("sf0.001")), "user_id", "ts", "event_id", 1800)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length == 2,
      s"sessionize should shuffle exactly once:\n$plan")
  }
}
