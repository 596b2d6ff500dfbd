package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** The snapshot table as a streaming SINK (format "graft-snapshot"):
  * fenced exactly-once appends across a checkpoint restart, and the
  * flagship composition — streaming table-to-table replication via
  * source(graft-changes) → sink(graft-snapshot, mode=changes). */
class SnapshotSinkSpec extends SparkSpec {

  private def tmpDir(pfx: String = "graft_sink"): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  test("append mode commits each batch exactly once across restarts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dst = tmpDir(); val ckpt = tmpDir("graft_sink_ckpt")

    val mem = MemoryStream[(Long, String)]
    def start() = mem.toDF.toDF("k", "v")
      .writeStream.format("graft-snapshot")
      .option("dir", dst).option("statsCol", "k")
      .option("checkpointLocation", ckpt).start()

    val q1 = start()
    mem.addData((1L, "a"), (2L, "b"))
    q1.processAllAvailable(); q1.stop()
    assert(Snapshots.read(spark, dst).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // the fence holds stats too: statsCol rides the streaming commit
    assert(Snapshots.manifest(spark, dst).columns.contains("smin_k"))

    // restart from the checkpoint: only new data lands, nothing replays
    val q2 = start()
    mem.addData((3L, "c"))
    q2.processAllAvailable(); q2.stop()
    assert(Snapshots.read(spark, dst).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "restart must not duplicate fenced batches")
  }

  test("streaming table replication: changes source → changes sink, " +
    "replica == source across churn and restart") {
    val s = spark
    import s.implicits._
    val src = tmpDir(); val dst = tmpDir(); val ckpt = tmpDir("graft_sink_ckpt")

    def srcRows() = Snapshots.read(spark, src).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    def dstRows() = Snapshots.read(spark, dst).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    // churn on the source BEFORE the stream starts: the first
    // micro-batch carries v0..v3 at once — the per-key LWW inside
    // mode=changes must net them out (insert then delete = absent)
    Snapshots.commit((1L to 6L).map(k => (k, s"v$k")).toDF("k", "v"),
      src, statsCol = Some("k"))                                    // v0
    Snapshots.commit(Seq((7L, "v7")).toDF("k", "v"), src)           // v1
    Snapshots.mergeCommit(spark, src,
      Seq((3L, "V3", "u", 1L), (5L, "x", "d", 1L)).toDF("k", "v", "op", "seq"),
      keyCols = Seq("k"))                                           // v2
    Snapshots.deleteWhere(spark, src, col("k") === 1L)              // v3

    def start() = Snapshots.changesStream(spark, src)
      .writeStream.format("graft-snapshot")
      .option("dir", dst).option("mode", "changes")
      .option("keyCols", "k").option("statsCol", "k")
      .option("checkpointLocation", ckpt).start()

    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(dstRows() == srcRows(), s"replica diverged after bootstrap: " +
      s"${dstRows()} vs ${srcRows()}")

    // more churn, restart the pipeline from its checkpoint: only the
    // unconsumed versions flow, and the replica converges again
    Snapshots.commit(Seq((8L, "v8")).toDF("k", "v"), src)           // v4
    Snapshots.deleteWhere(spark, src, col("k") === 2L)              // v5
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    assert(dstRows() == srcRows(), s"replica diverged after restart: " +
      s"${dstRows()} vs ${srcRows()}")
    // the replica is itself a snapshot table with history: the
    // bootstrap batch and the incremental batch are separate commits
    assert(Snapshots.latestVersion(spark, dst).exists(_ >= 1L))
  }

  test("merge mode maintains an update-mode aggregate as a materialized view") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dst = tmpDir(); val ckpt = tmpDir("graft_sink_ckpt")

    val mem = MemoryStream[(Long, String)]
    // no op/seq columns: every emitted row defaults to an upsert
    // sequenced by batch id — the table converges to the aggregate
    val q = mem.toDF.toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("update")
      .format("graft-snapshot")
      .option("dir", dst).option("mode", "merge").option("keyCols", "k")
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((1L, "a"), (1L, "b"), (2L, "c"))
      q.processAllAvailable()
      mem.addData((1L, "d"), (3L, "e")) // k=1 grows, k=2 silent, k=3 new
      q.processAllAvailable()
    } finally q.stop()
    assert(Snapshots.read(spark, dst).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 3L), (2L, 1L), (3L, 1L)),
      "view must hold the latest aggregate per key, unemitted keys intact")
  }

  test("sink option validation fails fast") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    val e1 = intercept[Exception] {
      mem.toDF.toDF("k", "v").writeStream.format("graft-snapshot")
        .option("dir", tmpDir()).option("mode", "merge")
        .option("checkpointLocation", tmpDir("graft_sink_ckpt")).start()
    }
    assert(e1.getMessage.contains("keyCols"))
    val e2 = intercept[Exception] {
      mem.toDF.toDF("k", "v").writeStream.format("graft-snapshot")
        .option("checkpointLocation", tmpDir("graft_sink_ckpt")).start()
    }
    assert(e2.getMessage.contains("dir"))
  }
}
