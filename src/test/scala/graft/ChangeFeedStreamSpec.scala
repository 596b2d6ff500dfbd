package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** The snapshot table as a streaming SOURCE (format "graft-changes"):
  * per-version change batches, checkpointed exactly-once restart, and
  * the startingVersion=latest subscription mode. */
class ChangeFeedStreamSpec extends SparkSpec {

  private def tmpDir(pfx: String = "graft_cfs"): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private type Change = (Long, String, String, Long) // k, v, __change, __version

  /** Run the feed through foreachBatch (the one sink that supports
    * checkpoint recovery) into a driver-side buffer. */
  private def drain(ckpt: String, src: String,
                    buf: scala.collection.mutable.Buffer[Change],
                    startingVersion: Option[Long] = None,
                    latest: Boolean = false): Unit = {
    val reader = {
      val r = spark.readStream.format("graft-changes").option("dir", src)
      if (latest) r.option("startingVersion", "latest")
      else startingVersion.fold(r)(v => r.option("startingVersion", v.toString))
    }
    val q = reader.load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        buf ++= df.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
  }

  test("change-feed stream: per-version diffs, multi-version first batch, " +
    "exactly-once checkpointed restart") {
    val src = tmpDir(); val ckpt = tmpDir("graft_cfs_ckpt")
    val s = spark
    import s.implicits._
    Snapshots.commit((1L to 6L).map(k => (k, s"v$k")).toDF("k", "v"),
      src, statsCol = Some("k"))                                     // v0
    Snapshots.commit(Seq((7L, "v7")).toDF("k", "v"), src)            // v1
    Snapshots.mergeCommit(spark, src,
      Seq((3L, "V3", "u", 1L), (5L, "x", "d", 1L)).toDF("k", "v", "op", "seq"),
      keyCols = Seq("k"))                                            // v2
    Snapshots.deleteWhere(spark, src, col("k") === 1L)               // v3

    val got = scala.collection.mutable.Buffer[Change]()
    drain(ckpt, src, got) // one query start covers v0..v3
    val expected = Seq[Change](
      (1L, "v1", "insert", 0L), (2L, "v2", "insert", 0L),
      (3L, "v3", "insert", 0L), (4L, "v4", "insert", 0L),
      (5L, "v5", "insert", 0L), (6L, "v6", "insert", 0L),
      (7L, "v7", "insert", 1L),
      // the CoW rewrite carried rows 1,2,4,6 over unchanged — the feed
      // must cancel them and surface only the update (delete+insert)
      // and the delete
      (3L, "v3", "delete", 2L), (3L, "V3", "insert", 2L),
      (5L, "v5", "delete", 2L),
      (1L, "v1", "delete", 3L))
    assert(got.sorted == expected.sorted,
      s"feed mismatch:\n got ${got.sorted}\n want ${expected.sorted}")

    // new commit + restart from the SAME checkpoint: only v4 arrives,
    // nothing replays — the offset log is the watermark
    Snapshots.commit(Seq((8L, "v8")).toDF("k", "v"), src)            // v4
    drain(ckpt, src, got)
    assert(got.sorted == (expected :+ (8L, "v8", "insert", 4L)).sorted,
      "restart must deliver exactly the unconsumed version")
  }

  test("startingVersion=latest subscribes to new commits only") {
    val src = tmpDir(); val ckpt = tmpDir("graft_cfs_ckpt")
    val s = spark
    import s.implicits._
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), src)  // v0
    Snapshots.commit(Seq((3L, "c")).toDF("k", "v"), src)             // v1

    val got = scala.collection.mutable.Buffer[Change]()
    val q = spark.readStream.format("graft-changes")
      .option("dir", src).option("startingVersion", "latest").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        got ++= df.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(got.isEmpty, "history must not replay under latest")
      Snapshots.commit(Seq((4L, "d")).toDF("k", "v"), src)           // v2
      q.processAllAvailable()
    } finally q.stop()
    assert(got.sorted == Seq[Change]((4L, "d", "insert", 2L)),
      s"only the post-subscription commit should arrive: $got")
  }

  test("maxVersionsPerTrigger bounds each micro-batch and survives restart") {
    val src = tmpDir(); val ckpt = tmpDir("graft_cfs_ckpt")
    val s = spark
    import s.implicits._
    Snapshots.commit(Seq((1L, "a")).toDF("k", "v"), src)             // v0
    Snapshots.commit(Seq((2L, "b")).toDF("k", "v"), src)             // v1
    Snapshots.commit(Seq((3L, "c")).toDF("k", "v"), src)             // v2

    val batches = scala.collection.mutable.Buffer[Set[Long]]()
    def start() = spark.readStream.format("graft-changes")
      .option("dir", src).option("maxVersionsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val vs = df.select("__version").collect().map(_.getLong(0)).toSet
        if (vs.nonEmpty) batches += vs
        ()
      }.start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(batches.toSeq == Seq(Set(0L), Set(1L), Set(2L)),
      s"each trigger must admit exactly one version: $batches")

    // restart: the throttle cursor must not replay or skip
    Snapshots.commit(Seq((4L, "d")).toDF("k", "v"), src)             // v3
    Snapshots.commit(Seq((5L, "e")).toDF("k", "v"), src)             // v4
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(batches.toSeq == Seq(Set(0L), Set(1L), Set(2L), Set(3L), Set(4L)),
      s"restart must continue one version per trigger: $batches")
  }

  test("a corrupt admission cursor fails loudly instead of regressing the watermark") {
    val src = tmpDir(); val ckpt = tmpDir("graft_cfs_ckpt")
    val s = spark
    import s.implicits._
    Snapshots.commit(Seq((1L, "a")).toDF("k", "v"), src)
    Snapshots.commit(Seq((2L, "b")).toDF("k", "v"), src)
    def start() = spark.readStream.format("graft-changes")
      .option("dir", src).option("maxVersionsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (_: DataFrame, _: Long) => () }.start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // the durable cursor rides in marker NAMES now (atomic create, no
    // torn-write window); the corrupt state a restart can still meet
    // is a legacy-format checkpoint whose content file is garbage —
    // emulate it: markers gone, legacy graft-cursor unparseable. A
    // silent fallback to startAfter would answer getOffset BEHIND the
    // engine's committed offset and re-emit delivered versions
    val stateDir = new java.io.File(s"$ckpt/sources/0")
    val markers = stateDir.listFiles()
      .filter(_.getName.matches("(\\.)?graft-cursor-v\\d{12}(\\.crc)?"))
    assert(markers.nonEmpty, s"expected durable cursor markers in $stateDir")
    markers.foreach(m => java.nio.file.Files.delete(m.toPath))
    val cursorFile = new java.io.File(stateDir, "graft-cursor")
    java.nio.file.Files.writeString(cursorFile.toPath, "not-a-number")
    // drop the checksum sidecar so the READ succeeds and the PARSE
    // fails — the case under test (a crc mismatch already fails loudly
    // on its own)
    java.nio.file.Files.deleteIfExists(
      cursorFile.toPath.resolveSibling(".graft-cursor.crc"))
    val e = intercept[Exception] { val q = start()
      try q.processAllAvailable() finally q.stop() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("corrupt graft-changes cursor"),
      s"expected the loud cursor error, got: $msgs")
  }

  test("a stream fallen past the expiry horizon fails loudly, not silently") {
    val src = tmpDir(); val ckpt = tmpDir("graft_cfs_ckpt")
    val s = spark
    import s.implicits._
    Snapshots.commit(Seq((1L, "a")).toDF("k", "v"), src)             // v0
    Snapshots.commit(Seq((2L, "b")).toDF("k", "v"), src)             // v1
    Snapshots.commit(Seq((3L, "c")).toDF("k", "v"), src)             // v2

    // consume ONLY v0, then fall behind while the table expires
    val got = scala.collection.mutable.Buffer[Change]()
    val q1 = spark.readStream.format("graft-changes")
      .option("dir", src).option("maxVersionsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        got ++= df.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        if (got.size == 1) throw new RuntimeException("simulated consumer crash")
        ()
      }.start()
    intercept[Exception](q1.processAllAvailable())
    q1.stop()
    assert(got.map(_._4).toSet == Set(0L), s"only v0 should have landed: $got")

    Snapshots.expire(spark, src, keepLast = 1) // v0/v1 manifests gone
    val q2 = spark.readStream.format("graft-changes")
      .option("dir", src).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        got ++= df.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        ()
      }.start()
    val e = intercept[Exception] { q2.processAllAvailable() }
    q2.stop()
    assert(got.map(_._4).toSet == Set(0L),
      s"nothing past v0 may land silently after the horizon passed: $got")
    assert(e.getMessage != null, "expiry gap must surface as a query error")
  }

  test("stream started after schema evolution reads old versions with nulls") {
    val src = tmpDir(); val ckpt = tmpDir("graft_cfs_ckpt")
    val s = spark
    import s.implicits._
    Snapshots.commit(Seq((1L, "a")).toDF("k", "v"), src)             // v0: (k,v)
    Snapshots.commit(Seq((2L, "b", 9L)).toDF("k", "v", "w"), src)    // v1: +w

    val got = scala.collection.mutable.Buffer[(Long, String, Option[Long], String, Long)]()
    val q = Snapshots.changesStream(spark, src)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        got ++= df.collect().map(r =>
          (r.getLong(0), r.getString(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            r.getString(3), r.getLong(4)))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(got.sortBy(_._1) == Seq(
      (1L, "a", None, "insert", 0L),
      (2L, "b", Some(9L), "insert", 1L)),
      s"evolved feed mismatch: $got")
  }
}
