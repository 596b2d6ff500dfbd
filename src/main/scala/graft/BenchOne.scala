package graft
import org.apache.spark.sql.SparkSession

/** Single-query bench harness for CONTROLLED-WINDOW A/B measurement
  * (SURVEY §6 bench hygiene): run one `SparkEntry.queries` entry N
  * times at a given SF dir and print min-of-reps — interleave
  * invocations across pinned git worktrees in one window to
  * attribute a regression to code vs. sandbox clock drift.
  *
  *   sbt "runMain graft.BenchOne q_distinct_view_incr /root/testdata/sf0.1 3"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    // JIT/plan-cache warm run at a small SF (arg 4) — falls back to
    // the timed SF dir so a host without the default layout still
    // warms instead of silently timing cold reps
    val warmDir = args.lift(3).getOrElse {
      val d = "/root/testdata/sf0.001"
      if (new java.io.File(d).isDirectory) d else sfDir
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    val fn = SparkEntry.queries(name)
    try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      System.err.println(s"[benchone] warm run failed: ${e.getMessage}")
    }
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"BENCHONE $name reps=${ts.map(t => f"$t%.2f").mkString(",")} min=${ts.min}%.2f")
    java.lang.Runtime.getRuntime.halt(0)
  }
}
