package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Measurement harness (guide §1): run one query and log EVERY Spark
  * job it submits — wall ms, task count, call site — so the fixed
  * per-job overhead of multi-action operators (snapshot commits,
  * maintained-view refreshes) is visible and attributable. The gap
  * between the query's wall time and the sum of job wall times is
  * driver-side work (planning, FS metadata, manifest bookkeeping).
  *
  *   sbt "runMain graft.JobProfile q_quantiles_by_key_view_incr [sfDir] [reps]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = GraftSession.local(32)
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    val fn = SparkEntry.queries(name)
    // warm run (JIT, codegen, parquet footers)
    try fn(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"warm failed: $e") }

    case class J(id: Int, start: Long, var end: Long = 0L,
                 var tasks: Int = 0, desc: String, site: String)
    val jobs = mutable.LinkedHashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobs.synchronized {
          jobs(js.jobId) = J(js.jobId, js.time, desc = d, site = site)
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(je.jobId).foreach(_.end = je.time) }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = ()
    }
    (1 to reps).foreach { rep =>
      jobs.synchronized(jobs.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // drain listener bus
      val snap = jobs.synchronized(jobs.values.toVector)
      val sumMs = snap.map(j => math.max(0L, j.end - j.start)).sum
      println(f"PROFILE $name rep=$rep wall=$wall%.2f s jobs=${snap.size} jobWallSum=${sumMs / 1000.0}%.2f s driverGap=${wall - sumMs / 1000.0}%.2f s")
      // group jobs by description (phase label) for attribution
      val byDesc = snap.groupBy(_.desc).map { case (s, js) =>
        (s, js.size, js.map(j => math.max(0L, j.end - j.start)).sum)
      }.toSeq.sortBy(-_._3)
      byDesc.foreach { case (s, n, ms) =>
        println(f"  DESC ${s.take(50)}%-50s n=$n%3d total=${ms / 1000.0}%7.2f s")
      }
      // per-phase WALL time (driver + jobs) from the Jobs accounting
      Jobs.drain().toSeq.sortBy(-_._2._1).foreach { case (d, (ns, calls)) =>
        println(f"  PHASE ${d.take(50)}%-50s n=$calls%4d wall=${ns / 1e9}%7.2f s")
      }
    }
    spark.stop()
  }
}
