package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Sketches

/** Sketch rollup tables: exact-regime equalities (the oracle
  * contract), lossless mergeability across partitionings, binary
  * round-trip through parquet, and sampling-regime error bounds. */
class SketchesSpec extends SparkSpec {

  private lazy val ev = Tables.events(spark, sf("sf0.001"))

  test("theta rollup from daily sketches == exact distinct count (exact regime)") {
    val daily = Sketches.distinctSketchTable(
      ev.withColumn("day", to_date(col("ts"))),
      Seq("event_type", "day"), "user_id")
    val rolled = Sketches.rollupDistinct(daily, Seq("event_type"), "user_id")
      .collect().map(r => (r.getString(0),
        r.getAs[Any]("user_id_distinct_theta").toString.toDouble.round,
        r.getAs[Any]("user_id_distinct_hll").toString.toDouble.round,
        r.getAs[Long]("n_rows"))).sortBy(_._1)
    val exact = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("d"), count(lit(1L)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rolled.map(r => (r._1, r._2, r._4)).toSeq ==
      exact.map(e => (e._1, e._2, e._3)).toSeq,
      s"theta rollup != exact: $rolled vs $exact")
    // HLL keeps exact coupons at these cardinalities too
    assert(rolled.map(r => (r._1, r._3)).toSeq ==
      exact.map(e => (e._1, e._2)).toSeq,
      s"hll rollup != exact: $rolled vs $exact")
  }

  test("rollup is partitioning-invariant: same estimates from any daily split") {
    val byDay = Sketches.distinctSketchTable(
      ev.withColumn("day", to_date(col("ts"))),
      Seq("event_type", "day"), "user_id")
    val byUserMod = Sketches.distinctSketchTable(
      ev.withColumn("day", pmod(col("user_id"), lit(7))),
      Seq("event_type", "day"), "user_id")
    def roll(t: org.apache.spark.sql.DataFrame) =
      Sketches.rollupDistinct(t, Seq("event_type"), "user_id")
        .select("event_type", "user_id_distinct_theta", "user_id_distinct_hll")
        .collect().map(_.toSeq.map(String.valueOf(_))).sortBy(_.mkString)
    assert(roll(byDay).toSeq == roll(byUserMod).toSeq)
  }

  test("cohortOverlap refuses a cohort key beyond the metadata bound") {
    val sk = Sketches.distinctSketchTable(ev, Seq("event_type"), "user_id")
    val e = intercept[IllegalArgumentException](
      Sketches.cohortOverlap(sk, "event_type", "user_id", maxCohorts = 2))
    assert(e.getMessage.contains("pairs every two"),
      s"guard should explain the quadratic blowup: ${e.getMessage}")
    // at the default bound the same call is fine
    assert(Sketches.cohortOverlap(sk, "event_type", "user_id").count() > 0)
  }

  test("cohort overlap: exact set algebra without touching raw data") {
    val sk = Sketches.distinctSketchTable(ev, Seq("event_type"), "user_id")
    val overlaps = Sketches.cohortOverlap(sk, "event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Any]("n_a").toString.toDouble.round,
        r.getAs[Any]("n_b").toString.toDouble.round,
        r.getAs[Any]("n_union").toString.toDouble.round,
        r.getAs[Any]("n_intersect").toString.toDouble.round,
        r.getAs[Any]("n_only_a").toString.toDouble.round))
    assert(overlaps.nonEmpty)
    val sets = ev.select("event_type", "user_id").distinct().collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    overlaps.foreach { case (a, b, na, nb, nu, ni, nd) =>
      val (sa, sb) = (sets(a), sets(b))
      assert(na == sa.size && nb == sb.size, s"sizes wrong for ($a,$b)")
      assert(nu == (sa ++ sb).size, s"union wrong for ($a,$b)")
      assert(ni == (sa & sb).size, s"intersect wrong for ($a,$b)")
      assert(nd == (sa -- sb).size, s"difference wrong for ($a,$b)")
      assert(nu == na + nb - ni) // inclusion-exclusion closes
    }
  }

  test("sketch table round-trips through parquet (binary columns persist)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch").toString
    val daily = Sketches.distinctSketchTable(
      ev.withColumn("day", to_date(col("ts"))),
      Seq("event_type", "day"), "user_id")
    daily.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    def roll(t: org.apache.spark.sql.DataFrame) =
      Sketches.rollupDistinct(t, Seq("event_type"), "user_id")
        .collect().map(_.toSeq.map(String.valueOf(_))).sortBy(_.mkString)
    assert(roll(reloaded).toSeq == roll(daily).toSeq)
  }

  test("KLL quantile rollup == exact order statistics (exact regime)") {
    // k=4096 > total rows at sf0.001, so per-day sketches AND their
    // merge retain every value: quantiles are exact order statistics
    // under inclusive-rank semantics (item at ceil(p*n), 1-based)
    val daily = Sketches.quantileSketchTable(
      ev.withColumn("day", to_date(col("ts"))),
      Seq("event_type", "day"), "value", k = 4096)
    val rolled = Sketches.rollupQuantiles(daily, Seq("event_type"), "value",
      Seq(0.5, 0.95), k = 4096)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val exact = ev.select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        val v = rs.map(_.getDouble(1)).sorted
        def q(p: Double) = v(math.ceil(p * v.length).toInt - 1)
        (t, q(0.5), q(0.95))
      }.toSeq.sortBy(_._1)
    assert(rolled.toSeq == exact, s"$rolled vs $exact")
  }

  test("streaming windowed sketch table == batch after draining (RocksDB state)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def t(x: String) = Timestamp.valueOf(x)
    // two 1-hour windows x two keys; ids overlap across rows so the
    // sketches do real distinct work
    val rows = (0 until 60).map { i =>
      Ev(t(f"2024-03-01 ${9 + i % 2}%02d:${i % 50}%02d:00"),
        if (i % 4 < 2) "a" else "b", (i % 13).toDouble, (i % 11).toLong)
    }
    val mem = MemoryStream[Ev]
    mem.addData(rows)
    // sketch the o column (longs with duplicates)
    val out = Sketches.distinctSketchStream(mem.toDF, "ts", "1 hour", Seq("k"), "o")
    val q = out.writeStream.format("memory").queryName("sketch_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // compare post-rollup estimates (buffer bytes may differ by merge
    // order; estimates in the exact regime cannot)
    def est(df: org.apache.spark.sql.DataFrame) =
      df.select(col("window_start"), col("k"),
          theta_sketch_estimate(col("o_theta")).as("d_theta"),
          hll_sketch_estimate(col("o_hll")).as("d_hll"),
          col("n_rows"))
        .collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).sorted.toSeq
    val streamed = est(s.table("sketch_stream"))
    val batch = est(Sketches.distinctSketchStream(rows.toDF, "ts", "1 hour", Seq("k"), "o"))
    assert(streamed == batch)
    assert(streamed.size == 4, s"expected 2 windows x 2 keys, got $streamed")
    // and the streamed sketch rows are exact in this regime
    val exact = rows.groupBy(r => (r.ts.getTime / 3600000, r.k))
      .map { case (_, rs) => rs.map(_.o).toSet.size }.toSeq.sorted
    val got = s.table("sketch_stream")
      .select(theta_sketch_estimate(col("o_theta")))
      .collect().map(_.get(0).toString.toDouble.round.toInt).toSeq.sorted
    assert(got == exact, s"$got vs $exact")
  }

  test("plan shape: one map-side-combined agg pass, single Exchange each stage") {
    val daily = Sketches.distinctSketchTable(
      ev.withColumn("day", to_date(col("ts"))),
      Seq("event_type", "day"), "user_id")
    val p1 = daily.queryExecution.executedPlan.toString
    // partial + final aggregate around exactly one shuffle
    assert("ObjectHashAggregate|HashAggregate".r.findAllIn(p1).size >= 2,
      s"no partial/final agg pair:\n$p1")
    assert("Exchange".r.findAllIn(p1).size <= 1, s"more than one Exchange:\n$p1")
    val rolled = Sketches.rollupDistinct(daily, Seq("event_type"), "user_id")
    val p2 = rolled.queryExecution.executedPlan.toString
    // the rollup adds at most one more shuffle over the CELLS
    assert("Exchange".r.findAllIn(p2).size <= 2,
      s"rollup added more than one Exchange:\n$p2")
  }

  test("property: theta estimate exact below capacity for seeded-random multisets") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260813L)
    (1 to 3).foreach { trial =>
      // multiset with duplicates; distinct count stays < 4096 capacity
      val rows = Seq.fill(500 + rnd.nextInt(3000))(
        (rnd.nextInt(1 + rnd.nextInt(2000)).toLong, rnd.nextInt(3)))
      val sk = Sketches.distinctSketchTable(rows.toDF("id", "g"), Seq("g"), "id")
      val est = Sketches.rollupDistinct(sk, Seq("g"), "id")
        .collect().map(r => (r.getInt(0),
          r.getAs[Any]("id_distinct_theta").toString.toDouble.round)).toMap
      val exact = rows.distinct.groupBy(_._2).map { case (g, rs) =>
        (g, rs.map(_._1).distinct.size.toLong) }
      assert(est == exact, s"trial $trial: $est vs $exact")
    }
  }

  test("live rollup: streamed sketch rows commit into the stored table and roll up with history") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch_tbl").toString
    val cols = Seq("event_id", "user_id", "event_type", "value", "ts")
    val all = ev.select(cols.map(col): _*)
    val historical = all.filter(col("event_id") % 2 === 0)
    val live = all.filter(col("event_id") % 2 === 1)
    // historical half: the batch path of the SAME operator, committed
    // as the stored sketch table's first snapshot
    graft.sources.Snapshots.commit(
      Sketches.distinctSketchStream(historical, "ts", "1 hour",
        Seq("event_type"), "user_id"), dir)
    // live half: a real stream through the streaming twin, sunk into
    // the SAME table via the exactly-once snapshot sink
    val mem = MemoryStream[(Long, Long, String, Double, Timestamp)]
    mem.addData(live.collect().toSeq.map(r => (r.getLong(0), r.getLong(1),
      r.getString(2), r.getDouble(3), r.getTimestamp(4))): _*)
    val q = Sketches.distinctSketchStream(
        mem.toDF.toDF(cols: _*), "ts", "1 hour", Seq("event_type"), "user_id")
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.sources.Snapshots.commitStreamBatch(b, dir, id); ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sketch_cp").toString)
      .start()
    q.awaitTermination(120000)
    // the PROMISE: a historical rollup over the STORED table now
    // includes the live data — estimates equal the exact distincts
    // over ALL events (exact regime), with no batch backfill
    val rolled = Sketches.rollupDistinct(
        graft.sources.Snapshots.read(spark, dir), Seq("event_type"), "user_id")
      .collect().map(r => (r.getString(0),
        r.getAs[Any]("user_id_distinct_theta").toString.toDouble.round,
        r.getAs[Any]("user_id_distinct_hll").toString.toDouble.round,
        r.getAs[Long]("n_rows"))).sortBy(_._1).toSeq
    val exact = all.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("d"), count(lit(1L)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(1),
        r.getLong(2))).sortBy(_._1).toSeq
    assert(rolled == exact, s"stored+streamed rollup $rolled != exact $exact")
  }

  test("q_approx_distinct exact regime holds at the verify SFs; bounded beyond") {
    // the oracle bar: at sf0.001/sf0.01 the DataSketches HLL (lgK=14)
    // is still in coupon mode — an exact hash set — so the estimate
    // IS the exact distinct count; this is what lets the driver
    // hash-compare the query against DuckDB's count(DISTINCT)
    for (sfn <- Seq("sf0.001", "sf0.01")) {
      val got = SparkEntry.queries("q_approx_distinct")(spark, sf(sfn))
        .join(Tables.events(spark, sf(sfn)).groupBy("event_type")
            .agg(countDistinct(col("user_id")).as("exact")),
          Seq("event_type"))
      assert(got.filter(col("approx_users") =!= col("exact")).count() == 0,
        s"HLL estimate not exact at $sfn")
    }
    // beyond the exact regime the estimate stays inside the sketch's
    // published error (lgK=14 RSE ≈ 0.8%/σ; 1500 distinct may still
    // sit in the coupon-exact zone, so 1% is a roomy determinism-safe
    // bound either way)
    val big = SparkEntry.queries("q_approx_distinct")(spark, sf("sf0.1"))
      .join(Tables.events(spark, sf("sf0.1")).groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("exact")),
        Seq("event_type"))
      .withColumn("rel_err",
        abs(col("approx_users") - col("exact")) / col("exact"))
    assert(big.filter(col("rel_err") > 0.01).count() == 0)
  }

  test("sampling regime: theta/HLL within published RSE at k << n") {
    // force sampling with tiny sketches (lgK=4 -> 16 nominal entries)
    // over 10x more distinct ids; 3-sigma RSE bounds
    val distinct = ev.select("user_id").distinct().count().toDouble
    val sk = Sketches.distinctSketchTable(ev, Seq.empty, "user_id", lgK = 4)
    val est = Sketches.rollupDistinct(sk, Seq.empty, "user_id", lgK = 4)
      .head()
    val theta = est.getAs[Any]("user_id_distinct_theta").toString.toDouble
    val hll = est.getAs[Any]("user_id_distinct_hll").toString.toDouble
    val rseTheta = 3.0 / math.sqrt(16)   // 3σ, 1/sqrt(k)
    val rseHll = 3.0 * 1.04 / math.sqrt(16)
    assert(math.abs(theta - distinct) / distinct <= rseTheta,
      s"theta $theta vs $distinct")
    assert(math.abs(hll - distinct) / distinct <= rseHll,
      s"hll $hll vs $distinct")
  }
}
