package graft
import org.apache.spark.sql.SparkSession

/** Stream-drain-leg-only bench harness for CONTROLLED-WINDOW
  * measurement (SURVEY §6 bench hygiene): drain the whole events
  * table through the watermarked windowed pipeline — Bench.scala's
  * `q_stream_pipeline` leg, verbatim — `reps` times and print per-rep
  * seconds, the min, and the steady-state msgs/s it implies.
  *
  *   sbt "runMain graft.BenchStream /root/testdata/sf0.1 5"
  *
  * Exists to settle stream-throughput watch items without paying for
  * a full Bench run: the drain leg's code path (WeatherPipeline /
  * Windows / GraftSession / Tables) changes rarely, so when a round's
  * official artifact moves, `git diff <old-round-tree> -- <those
  * files>` plus one run of this harness attributes the move to code
  * vs. sandbox window drift. */
object BenchStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
    val nEvents = Tables.load(spark, sfDir, "events").count()
    val ts = (1 to reps).flatMap { _ =>
      val t0 = System.nanoTime()
      val out = streaming.WeatherPipeline.windowed(
        Seq(Tables.eventsStream(spark, sfDir)),
        "ts", Seq("event_type", "user_id"), "value", "event_id", "1 hour")
      val q = out.writeStream.format("noop").outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // a drain slower than the cap must be EXCLUDED, not recorded as
      // ~300s — a silently capped min would fabricate the throughput
      // number this harness exists to settle (and the still-running
      // query would overlap the next rep; stop it first)
      if (q.awaitTermination(300000))
        Some((System.nanoTime() - t0) / 1e9)
      else {
        q.stop()
        System.err.println("[benchstream] rep exceeded 300s — excluded")
        None
      }
    }
    require(ts.nonEmpty, "every rep timed out — no measurement to report")
    val min = ts.min
    println(f"BENCHSTREAM n_events=$nEvents " +
      f"reps=${ts.map(t => f"$t%.2f").mkString(",")} min=$min%.2f " +
      f"msgs_per_s=${math.round(nEvents / min)}")
    java.lang.Runtime.getRuntime.halt(0)
  }
}
