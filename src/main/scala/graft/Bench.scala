package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Emits ONE compact JSON line as the final stdout
  * line. Compactness is load-bearing: the driver parses the line out
  * of a bounded tail of the sbt output (~2.4 KB) — rounds 2 and 3
  * overflowed that window with 9-decimal times and were recorded as
  * `parsed: null`. Times are per-query MEDIANS over `SPARK_GRAFT_REPS`
  * runs (default 3), rounded to milliseconds; failures are captured
  * per query in an `errors` map instead of being swallowed as
  * near-zero timings. */
object Bench {
  private def r3(v: Double): Double = math.round(v * 1000) / 1000.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
    // warm the JVM/codegen/parquet-footer paths so the first timed
    // query doesn't absorb one-time startup cost
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    // …and run every query once at the smallest SF: JIT + generated-
    // class loading are per-query-shape one-time costs (measured up to
    // ~3s on first use of e.g. the JSON path parser). The benchmark
    // should measure steady-state throughput — what a long-running
    // cluster job sees — not class-loader latency.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def recordErr(name: String, e: Throwable): Unit =
      errors.getOrElseUpdate(name,
        (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage))
          .replaceAll("[\"\\\\\n\r\t]", " ").take(60))
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        // noop sink, not count(): count() lets Catalyst prune every
        // computed column out of select-shaped queries, timing little
        // more than the scan; noop materializes the full result
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable => recordErr(name, e); None }
      }
      name -> (if (times.isEmpty) -1.0 else times.sorted.apply(times.size / 2))
    }
    // streaming throughput leg — the reference is a stream benchmark:
    // drain the whole events table through the watermarked windowed
    // pipeline (file-stream stand-in for Kafka) and time it
    val nEvents = try Tables.load(spark, sfDir, "events").count()
      catch { case _: Throwable => 0L }
    val streamSec = {
      val t0 = System.nanoTime()
      try {
        val out = streaming.WeatherPipeline.windowed(
          Seq(Tables.eventsStream(spark, sfDir)),
          "ts", Seq("event_type", "user_id"), "value", "event_id", "1 hour")
        val q = out.writeStream.format("noop").outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination(300000)
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable => recordErr("q_stream_pipeline", e); -1.0 }
    }
    // the reference's own published metric is stream throughput at a
    // 100 msg/s producer target (latency-monitor benchmark-results) —
    // report ours in the same unit for a direct comparison
    val streamRate =
      if (streamSec > 0 && nEvents > 0) math.round(nEvents / streamSec).toDouble
      else -1.0
    val all = results + ("q_stream_pipeline" -> streamSec)
    val qs = all.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val errs =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
        .mkString(",\"errors\":{", ",", "}")
    val total = r3(all.values.filter(_ >= 0).sum)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"stream_msgs_per_s":$streamRate$errs,"queries":$qs,"sf":"$sfDir"}"""
    spark.stop()
    println(line)
  }
}
