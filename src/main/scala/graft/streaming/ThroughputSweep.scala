package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Multi-throughput benchmark sweep — the analog of the reference
  * producer's BenchmarkRunner (producer BenchmarkRunner.scala:1-157),
  * which steps through target throughputs and emits a per-level
  * latency report (benchmark-results/latency-report-100msg-s-*.txt).
  *
  * Per target rate: the events table is replayed through the built-in
  * `rate` source at `rowsPerSecond` (wrap-around modulo join, so the
  * stream never runs dry), watermarked and windowed by EMIT time, and
  * every update-mode window row yields one end-to-end latency sample
  * `observed_wallclock − min(emit_ts in window)` — the same
  * "window update vs oldest producer timestamp" semantics as the
  * reference latency monitor (LatencyMonitor.collectLatencyData).
  * Achieved throughput comes from the stream's own progress counters
  * (numInputRows / elapsed), not from the target.
  *
  * Driver state is bounded: only per-update (window × key) stat rows
  * are collected (tens per batch), never the stream itself.
  */
object ThroughputSweep {

  case class SweepLevel(
      target: Int, achievedPerS: Double,
      p50Ms: Long, p95Ms: Long, p99Ms: Long, samples: Long)

  case class SweepResult(
      levels: Seq[SweepLevel], errors: Map[Int, String] = Map.empty) {
    /** Full per-level record for BENCH_FULL.json. A dead level (zero
      * post-startup samples even after retry) appears ONLY in
      * `errors`, never as a `{achieved: 0, p50: -1}` data row — round
      * 7's driver run recorded an environmental stall as a measured
      * throughput collapse because the two were indistinguishable. */
    def json: String = {
      val ls = levels.map { l =>
        s"""{"target":${l.target},"achieved_msgs_per_s":${math.round(l.achievedPerS)},""" +
          s""""p50_ms":${l.p50Ms},"p95_ms":${l.p95Ms},"p99_ms":${l.p99Ms},"samples":${l.samples}}"""
      }.mkString("[", ",", "]")
      // one STABLE shape whatever the error state: always the
      // {levels, errors} object (errors possibly empty) — a consumer
      // written against the happy path must not break the first time
      // a level stalls
      val es = errors.map { case (t, m) =>
        "\"" + t + "\":\"" + m.replaceAll("[\"\\\\\n\r\t]", " ") + "\""
      }.mkString("{", ",", "}")
      s"""{"levels":$ls,"errors":$es}"""
    }
    /** Tiny `{target:[achieved,p95_ms]}` block for the driver's
      * bounded-tail bench line. */
    def compactJson: String = levels.map { l =>
      "\"" + l.target + "\":[" + math.round(l.achievedPerS) + "," + l.p95Ms + "]"
    }.mkString("{", ",", "}")
  }

  /** Retry/classify policy around a per-level measurement: a level
    * whose post-startup sample count is zero is re-measured once
    * (stream-start scheduling on a contended machine can starve an
    * entire short level), and if still empty it is recorded as an
    * ERROR, not as data — `achieved: 0, p50: -1` must never
    * masquerade as a measured collapse. Factored from `run` so the
    * policy is testable with an injected measure function. */
  private[graft] def sweepWithMeasure(
      targets: Seq[Int],
      measure: Int => SweepLevel,
      retries: Int = 1,
      fullRetries: Int = 0): SweepResult = {
    val errs = scala.collection.mutable.LinkedHashMap[Int, String]()
    val good = targets.flatMap { t =>
      var lastErr = "zero post-startup samples"
      val found = (0 to retries).iterator.map { _ =>
        try {
          val l = measure(t)
          if (l.samples > 0) Some(l) else None
        } catch {
          case e: Throwable =>
            lastErr = e.getClass.getSimpleName + ": " +
              String.valueOf(e.getMessage).take(60)
            None
        }
      }.collectFirst { case Some(l) => l }
      if (found.isEmpty)
        errs(t) = s"$lastErr in ${retries + 1} attempts " +
          "(environmental stall; level not measured)"
      found
    }
    val result = SweepResult(good, errs.toMap)
    // an ALL-levels stall is a sick window, not a measurement — the
    // r18 artifact recorded exactly one (its window healed minutes
    // later): re-run the whole sweep once rather than shipping a
    // five-error block when the machine was merely busy for a moment
    if (fullRetries > 0 && targets.nonEmpty && result.levels.isEmpty)
      sweepWithMeasure(targets, measure, retries, fullRetries - 1)
    else result
  }

  /** Nearest-rank percentile over an unsorted sample. */
  private[graft] def percentile(xs: Seq[Long], p: Double): Long =
    if (xs.isEmpty) -1L
    else {
      val s = xs.sorted
      s(math.min(s.size - 1, math.max(0, math.round(p * (s.size - 1)).toInt)))
    }

  /** One sweep over `targets`, `secondsPerLevel` of steady streaming
    * each. Batch 0 is excluded from BOTH the latency population and
    * the achieved-rate window (stream-start scheduling cost is
    * startup, not steady state): achieved throughput is the median of
    * the post-startup triggers' own inputRowsPerSecond. Dividing
    * total rows by wall-clock-since-start() instead understates the
    * rate by exactly startup/elapsed — the round-6 sweep read 87.5%
    * of target at every level because ~1s of 8s was stream
    * initialization (43,749 = 50,000 x 7/8), not because the
    * pipeline fell behind (p95 latency was flat across levels). */
  def run(
      spark: SparkSession,
      sfDir: String,
      targets: Seq[Int] = Seq(100, 1000, 10000, 50000),
      secondsPerLevel: Int =
        sys.env.getOrElse("SPARK_GRAFT_SWEEP_SECS", "8").toInt): SweepResult = {
    val events = graft.Tables.load(spark, sfDir, "events")
    val n = events.count()
    // only the join key + one grouping key ride along — the replayed
    // payload is irrelevant to the latency measurement
    val indexed = ReplayProducer.indexed(events, Seq("event_id"))
      .select(col("__idx"), col("event_type")).cache()
    indexed.count()

    def measureLevel(target: Int): SweepLevel = {
      val src = spark.readStream.format("rate")
        .option("rowsPerSecond", target).load()
      val stream = src.join(broadcast(indexed),
          pmod(src("value"), lit(n)) === col("__idx"))
        .withColumnRenamed("timestamp", "emit_ts")
      val agg = stream
        .withWatermark("emit_ts", "2 seconds")
        .groupBy(window(col("emit_ts"), "1 second"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), min(unix_millis(col("emit_ts"))).as("min_emit"))
      val samples = scala.collection.mutable.ArrayBuffer[Long]()
      val q = agg.writeStream.outputMode("update")
        .trigger(Trigger.ProcessingTime("1 second"))
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          val emits = df.select("min_emit").collect().map(_.getLong(0))
          val now = System.currentTimeMillis()
          if (batchId > 0) samples.synchronized { samples ++= emits.map(now - _) }
          ()
        }
        .start()
      val t0 = System.nanoTime()
      Thread.sleep(secondsPerLevel * 1000L)
      val elapsed = (System.nanoTime() - t0) / 1e9
      val progresses = q.recentProgress.toSeq
      q.stop(); q.awaitTermination()
      // steady-state achieved rate: the MEDIAN of Spark's own
      // per-trigger inputRowsPerSecond over post-startup triggers —
      // each is numInputRows over the time since the previous
      // trigger, so a steady pipeline reads ~target at every trigger
      // and the median is immune to the one slow/fast boundary batch
      // that a span average smears over the whole level. Wall-clock
      // fallback only when the level was too short to observe any
      // steady trigger.
      val achieved = {
        val rates = progresses.drop(1).map(_.inputRowsPerSecond)
          .filter(r => !r.isNaN && r > 0).sorted
        if (rates.nonEmpty) rates(rates.size / 2)
        else progresses.map(_.numInputRows).sum / elapsed
      }
      val latencies = samples.synchronized { samples.toSeq }
      SweepLevel(target, achieved,
        percentile(latencies, 0.50), percentile(latencies, 0.95),
        percentile(latencies, 0.99), latencies.size.toLong)
    }
    val result = sweepWithMeasure(targets, measureLevel, fullRetries = 1)
    indexed.unpersist()
    result
  }
}
