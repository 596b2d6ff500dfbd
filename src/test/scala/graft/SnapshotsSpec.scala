package graft

import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** Snapshot table protocol: append/overwrite commits, time travel,
  * manifest-level pruning, windowless compaction, crash orphans,
  * optimistic-concurrency retry, and snapshot expiry. */
class SnapshotsSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_snap").toString

  private def nations = Tables.load(spark, sf("sf0.001"), "nation")

  test("append commits accumulate; every snapshot stays readable (time travel)") {
    val dir = tmpDir()
    val a = nations.filter(col("n_nationkey") < 10)
    val b = nations.filter(col("n_nationkey") >= 10)
    val v0 = Snapshots.commit(a, dir)
    val v1 = Snapshots.commit(b, dir)
    assert(v0 == 0L && v1 == 1L)
    assert(Snapshots.read(spark, dir).count() == nations.count())
    // time travel: v0 is exactly the first batch
    val tt = Snapshots.read(spark, dir, Some(0L))
      .select("n_nationkey").collect().map(_.get(0).toString.toLong).sorted.toSeq
    assert(tt == a.select("n_nationkey").collect().map(_.get(0).toString.toLong).sorted.toSeq)
    assert(Snapshots.latestVersion(spark, dir).contains(1L))
  }

  test("overwrite commit replaces the file set but not history") {
    val dir = tmpDir()
    Snapshots.commit(nations, dir)
    val small = nations.filter(col("n_regionkey") === 0)
    val v1 = Snapshots.commit(small, dir, overwrite = true)
    assert(Snapshots.read(spark, dir).count() == small.count())
    assert(Snapshots.read(spark, dir, Some(0L)).count() == nations.count())
    assert(v1 == 1L)
  }

  test("a crashed commit (data written, no manifest) is invisible to readers") {
    val dir = tmpDir()
    Snapshots.commit(nations, dir)
    // simulate the crash: a data directory with no published manifest
    nations.limit(3).write.parquet(s"$dir/data/orphan-commit")
    assert(Snapshots.read(spark, dir).count() == nations.count())
    assert(Snapshots.fileCount(spark, dir) ==
      Snapshots.manifest(spark, dir).count())
  }

  test("version collision: the losing writer detects the non-exclusive rename") {
    val dir = tmpDir()
    Snapshots.commit(nations, dir)                    // v0
    val v1 = Snapshots.commit(nations.limit(5), dir)  // v1: real, occupied
    assert(v1 == 1L)
    val occupiedRows = Snapshots.read(spark, dir, Some(1L)).count()
    // Drive the REAL losing path: publish aimed at the occupied v1,
    // exactly what a racing replica that computed attempt=1
    // concurrently would do. Hadoop's directory rename onto an
    // existing dir returns TRUE and nests the source inside it — the
    // publish must detect that, reap its orphan, and report failure
    // (a bare rename-result check silently "succeeds" here).
    val entries = Snapshots.manifest(spark, dir, Some(0L))
      .select("path", "rows", "stats_min", "stats_max")
    val lost = Snapshots.tryPublish(spark, dir, "racing-loser", entries, 1L)
    assert(!lost, "publishing onto an occupied version must report failure")
    // the occupied version is untouched: same rows, no nested orphan
    assert(Snapshots.read(spark, dir, Some(1L)).count() == occupiedRows)
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_manifests/v${"%012d".format(1L)}/.tmp-racing-loser")),
      "the loser's nested orphan must be cleaned up")
    // and the full commit loop retries past the occupied version
    val v = Snapshots.commit(nations.limit(5), dir)
    assert(v == 2L, s"expected retry to v2, got v$v")
    assert(Snapshots.read(spark, dir).count() == nations.count() + 10)
  }

  test("manifest-level pruning reads only stat-overlapping files") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sf("sf0.001"))
      .repartitionByRange(8, col("user_id"))
    Snapshots.commit(ev, dir, overwrite = false, statsCol = Some("user_id"))
    val total = Snapshots.fileCount(spark, dir)
    assert(total >= 8, s"expected >=8 files, got $total")
    // a narrow user_id range lives in few of the range-partitioned files
    val pruned = Snapshots.readPruned(spark, dir, 0, 2)
    val prunedFiles = pruned.select(input_file_name()).distinct().count()
    assert(prunedFiles < total,
      s"pruning read $prunedFiles of $total files — no skipping")
    val want = ev.filter(col("user_id").between(0, 2)).count()
    assert(pruned.filter(col("user_id").between(0, 2)).count() == want)
    // fully-disjoint range: zero rows, schema preserved
    val none = Snapshots.readPruned(spark, dir, 1e12, 2e12)
    assert(none.count() == 0 && none.columns.sameElements(pruned.columns))
  }

  test("large point-set pruning: driver-side search equals the predicate path, still skips files") {
    val s = spark; import s.implicits._
    val dir = tmpDir()
    // 16 id-clustered files so scattered point probes can still skip
    Snapshots.commit((0L until 4000L).map(i => (i, i % 7))
      .toDF("id", "v").repartitionByRange(16, col("id"))
      .sortWithinPartitions("id"),
      dir, statsCol = Some("id"))
    val total = Snapshots.fileCount(spark, dir)
    assert(total >= 16)
    // 100 points (> the 64-range driver-eval threshold) confined to
    // two narrow id bands: the binary-search path must keep only the
    // band files and return exactly the probed rows
    val ids: Seq[Long] = (0L until 50L) ++ (3000L until 3050L)
    val specs = Seq("id" -> ids.map(i => (i: Any, i: Any)))
    val got = Snapshots.readPrunedSpecs(spark, dir, specs)
      .filter(col("id").isin(ids: _*))
    val opened = got.select(input_file_name()).distinct().count()
    assert(opened < total / 2,
      s"driver-side point pruning opened $opened of $total files")
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      ids.map(i => (i, i % 7)).toSet)
    // same answer as a small (predicate-path) spec per band — the two
    // evaluation paths must agree file-for-file on coverage
    val viaRanges = Snapshots.readPrunedSpecs(spark, dir,
        Seq("id" -> Seq((0L, 49L), (3000L, 3049L))))
      .filter(col("id").isin(ids: _*))
    assert(viaRanges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      ids.map(i => (i, i % 7)).toSet)
    // Int points against bigint stats widen instead of being dropped
    val intIds: Seq[Any] = (0 until 70).map(i => i: Any)
    val viaInt = Snapshots.readPrunedSpecs(spark, dir,
        Seq("id" -> intIds.map(i => (i, i))))
      .filter(col("id") < 70)
    assert(viaInt.count() == 70)
  }

  test("manifest pruning on a timestamp statsCol skips files") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sf("sf0.001"))
      .repartitionByRange(8, col("ts"))
    Snapshots.commit(ev, dir, overwrite = false, statsCol = Some("ts"))
    // stats ride in the column's NATIVE type, not a double shadow
    assert(Snapshots.manifest(spark, dir).schema("stats_min").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val b = ev.agg(min("ts"), max("ts")).head()
    val tmin = b.getTimestamp(0)
    val mid = new java.sql.Timestamp(
      tmin.getTime + (b.getTimestamp(1).getTime - tmin.getTime) / 8)
    val total = Snapshots.fileCount(spark, dir)
    val pruned = Snapshots.readPruned(spark, dir, tmin, mid)
    val prunedFiles = pruned.select(input_file_name()).distinct().count()
    assert(prunedFiles < total,
      s"time-range read $prunedFiles of $total files — no skipping")
    val want = ev.filter(col("ts").between(lit(tmin), lit(mid))).count()
    assert(want > 0)
    assert(pruned.filter(col("ts").between(lit(tmin), lit(mid))).count() == want)
  }

  test("manifest pruning on a string statsCol; stats-less appends align") {
    val dir = tmpDir()
    val byName = nations.repartitionByRange(4, col("n_name"))
    Snapshots.commit(byName, dir, overwrite = false, statsCol = Some("n_name"))
    assert(Snapshots.manifest(spark, dir).schema("stats_min").dataType ==
      org.apache.spark.sql.types.StringType)
    val total = Snapshots.fileCount(spark, dir)
    // names are NATION_0..NATION_24; this lexicographic band catches
    // NATION_1, NATION_10..NATION_16 — a strict subset of the range
    // files
    val pruned = Snapshots.readPruned(spark, dir, "NATION_1", "NATION_16")
    assert(pruned.select(input_file_name()).distinct().count() < total)
    val want = nations.filter(col("n_name").between("NATION_1", "NATION_16")).count()
    assert(want > 0)
    assert(pruned.filter(col("n_name").between("NATION_1", "NATION_16")).count() == want)
    // an append WITHOUT stats unions cleanly into the typed manifest
    // (null stats of the table's type) and is never pruned away
    Snapshots.commit(nations.limit(3), dir)
    val all = Snapshots.readPruned(spark, dir, "ZZZZ", "ZZZZZZ")
    assert(all.count() == 3, "stats-less files must survive any prune")
  }

  test("point-lookup pruning: per-file blooms open only candidate files") {
    val dir = tmpDir()
    // deliberately NOT clustered by event_id: every file's id range
    // spans the table, so min/max stats (on ts) cannot prune an id
    // probe — exactly the layout blooms exist for
    val ev = Tables.events(spark, sf("sf0.001"))
      .select("event_id", "user_id", "event_type", "value", "ts")
      .repartition(8, col("user_id"))
    Snapshots.commit(ev, dir, overwrite = false,
      statsCol = Some("ts"), bloomCols = Seq("event_id", "event_type"))
    val total = Snapshots.fileCount(spark, dir)
    assert(total >= 4, s"need several files for the pruning claim, got $total")
    val m = Snapshots.manifest(spark, dir)
    assert(m.filter(col("blooms").isNotNull).count() == total)
    assert(m.select(element_at(col("bloom_types"), "event_id"))
      .head().getString(0) == "bigint")
    assert(m.select(element_at(col("bloom_types"), "event_type"))
      .head().getString(0) == "string")

    val ids = ev.select("event_id").limit(20).collect().map(_.getLong(0))
    // no false negatives: every probed id's rows all surface, and the
    // probe opens fewer files than the full snapshot
    var openedTotal = 0L
    ids.foreach { id =>
      val got = Snapshots.readPoint(spark, dir, "event_id", id)
      openedTotal += got.select(input_file_name()).distinct().count()
      assert(got.filter(col("event_id") === id).count() ==
        ev.filter(col("event_id") === id).count(), s"lost rows for id $id")
    }
    assert(openedTotal < ids.length * total,
      s"point probes opened $openedTotal of ${ids.length * total} file-reads — no bloom skipping")
    // type-sensitivity guard: an Int probe of the bigint column is
    // cast to the recorded bloom_type before hashing, so it still hits
    val asInt = Snapshots.readPoint(spark, dir, "event_id", ids.head.toInt)
    assert(asInt.filter(col("event_id") === ids.head).count() ==
      ev.filter(col("event_id") === ids.head).count())
    // the SECOND bloom key (a string column) answers its own probes:
    // a real value surfaces every row; a nonexistent one prunes files
    val byType = Snapshots.readPoint(spark, dir, "event_type", "click")
    assert(byType.filter(col("event_type") === "click").count() ==
      ev.filter(col("event_type") === "click").count())
    val noType = Snapshots.readPoint(spark, dir, "event_type", "no_such_type")
    assert(noType.select(input_file_name()).distinct().count() < total,
      "string-key bloom pruned nothing for a nonexistent value")
    // files appended WITHOUT a bloom are never pruned away; bloom'd
    // files mostly are when the id does not exist anywhere
    Snapshots.commit(ev.limit(3), dir)
    val absent = Snapshots.readPoint(spark, dir, "event_id", -987654321L)
    val opened = absent.select(input_file_name()).distinct().count()
    assert(opened >= 1, "bloom-less files must always be read")
    assert(opened < Snapshots.fileCount(spark, dir),
      s"a nonexistent id opened $opened files — blooms pruned nothing")
    assert(absent.columns.contains("event_id"))

    // MULTI-POINT probe (readPoints): one call for a value SET — no
    // false negatives, and still fewer file-reads than a full scan
    val full = Snapshots.read(spark, dir) // ev + the bloom-less append
    val some = ids.take(8).toSeq
    val multi = Snapshots.readPoints(spark, dir, "event_id",
      some.map(_.asInstanceOf[Any]))
    some.foreach(id => assert(
      multi.filter(col("event_id") === id).count() ==
        full.filter(col("event_id") === id).count(),
      s"readPoints lost rows for id $id"))
    // values far outside every file's id range prune everything that
    // carries stats/blooms (only the bloom-less appended files remain)
    val nothing = Snapshots.readPoints(spark, dir, "event_id",
      Seq(-1L, -2L, -3L))
    assert(nothing.select(input_file_name()).distinct().count() <
      Snapshots.fileCount(spark, dir),
      "an all-absent point set pruned no files")
    // a large point set (past the 64-value driver threshold) stays
    // correct — the Or-chain hazard path
    val many = (1 to 200).map(i => i * 37L)
    def idCounts(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("event_id").isin(many: _*))
      .groupBy("event_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wide = Snapshots.readPoints(spark, dir, "event_id",
      many.map(_.asInstanceOf[Any]))
    assert(idCounts(wide) == idCounts(full),
      "a >64-value point set (driver binary-search path) lost rows")
  }

  test("mergeCommit prunes rewrites by a timestamp key") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sf("sf0.001"))
      .select("event_id", "user_id", "event_type", "value", "ts")
      .repartitionByRange(4, col("ts"))
    Snapshots.commit(ev, dir, overwrite = false, statsCol = Some("ts"))
    val before = Snapshots.manifest(spark, dir)
      .select("path").collect().map(_.getString(0)).toSet
    // change one early-timestamp row: only early range files rewrite
    val victim = ev.orderBy("ts").limit(1)
    val changes = victim
      .withColumn("event_type", lit("patched"))
      .withColumn("op", lit("u")).withColumn("seq", lit(99L))
    val v = Snapshots.mergeCommit(spark, dir, changes,
      keyCols = Seq("event_id"), pruneCol = Some("ts"))
    val surviving = Snapshots.manifest(spark, dir, Some(v))
      .select("path").collect().map(_.getString(0)).toSet
    assert((before & surviving).nonEmpty,
      "merge rewrote every file despite timestamp range stats")
    val patched = Snapshots.read(spark, dir, Some(v))
      .filter(col("event_type") === "patched").count()
    assert(patched == 1)
    assert(Snapshots.read(spark, dir, Some(v)).count() == ev.count())
  }

  test("clustered compaction restores pruning after unclustered appends") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sf("sf0.001"))
      .select("event_id", "user_id", "event_type", "value", "ts")
    // four unclustered appends: every file's user_id range spans the
    // table, so the stats prune NOTHING
    (0 until 4).foreach { i =>
      Snapshots.commit(ev.filter(pmod(col("event_id"), lit(4)) === i)
        .repartition(3), dir, overwrite = false, statsCol = Some("user_id"))
    }
    val before = Snapshots.fileCount(spark, dir)
    val prunedBefore = Snapshots.readPruned(spark, dir, 0, 2)
      .select(input_file_name()).distinct().count()
    assert(prunedBefore == before, "precondition: unclustered appends unprunable")
    // clustered compaction: ranges tile, the same probe skips files
    val rows = Snapshots.read(spark, dir).count()
    val v = Snapshots.compactCommit(spark, dir, targetRows = rows / 5,
      clusterBy = Some("user_id"))
    val after = Snapshots.fileCount(spark, dir, Some(v))
    assert(after >= 4, s"expected several compacted files, got $after")
    val prunedAfter = Snapshots.readPruned(spark, dir, 0, 2)
      .select(input_file_name()).distinct().count()
    assert(prunedAfter < after,
      s"clustered compaction read $prunedAfter of $after files — no skipping")
    // and nothing was lost
    assert(Snapshots.read(spark, dir, Some(v)).count() == rows)
    val want = ev.filter(col("user_id").between(0, 2)).count()
    assert(Snapshots.readPruned(spark, dir, 0, 2)
      .filter(col("user_id").between(0, 2)).count() == want)
  }

  test("date statsCol prunes like timestamp; in-file parquet blooms are written") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sf("sf0.001"))
      .withColumn("day", to_date(col("ts")))
      .repartitionByRange(6, col("day"))
    Snapshots.commit(ev, dir, overwrite = false,
      statsCol = Some("day"), bloomCols = Seq("event_id"))
    assert(Snapshots.manifest(spark, dir).schema("stats_min").dataType ==
      org.apache.spark.sql.types.DateType)
    val b = ev.agg(min("day"), max("day")).head()
    val (dmin, dmax) = (b.getDate(0), b.getDate(1))
    if (dmin.toLocalDate.isBefore(dmax.toLocalDate)) {
      val total = Snapshots.fileCount(spark, dir)
      val pruned = Snapshots.readPruned(spark, dir, dmin, dmin)
      assert(pruned.select(input_file_name()).distinct().count() < total)
      assert(pruned.filter(col("day") === lit(dmin)).count() ==
        ev.filter(col("day") === lit(dmin)).count())
    }
    // the commit's parquet write really carries in-file bloom filters
    // for the declared column (option is not a silent no-op)
    val file = Snapshots.manifest(spark, dir)
      .select("path").head().getString(0)
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(new java.net.URI(file)), conf))
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns
      val idCol = (0 until cols.size).map(cols.get)
        .find(_.getPath.toDotString == "event_id").get
      assert(idCol.getBloomFilterOffset >= 0,
        "parquet.bloom.filter.enabled#event_id did not write a bloom filter")
      val bf = reader.readBloomFilter(idCol)
      assert(bf != null, "bloom filter unreadable from the footer offset")
    } finally reader.close()
  }

  test("compaction commits a new snapshot with fewer files, no rename window") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sf("sf0.001")).repartition(16)
    Snapshots.commit(ev, dir)
    val before = Snapshots.fileCount(spark, dir)
    val n = Snapshots.read(spark, dir).count()
    val v = Snapshots.compactCommit(spark, dir, targetRows = n) // -> 1 file
    assert(Snapshots.fileCount(spark, dir, Some(v)) < before)
    assert(Snapshots.read(spark, dir, Some(v)).count() == n)
    // the pre-compaction snapshot still reads its original files
    assert(Snapshots.read(spark, dir, Some(0L)).count() == n)
    assert(Snapshots.fileCount(spark, dir, Some(0L)) == before)
  }

  test("mergeCommit rewrites only stat-affected files and applies LWW upsert/delete") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    // 4 range-partitioned files over user_id so a narrow change batch
    // can only touch some of them
    val ev = Tables.events(spark, sf("sf0.001"))
      .select("event_id", "user_id", "event_type", "value")
      .repartitionByRange(4, col("user_id"))
    Snapshots.commit(ev, dir, overwrite = false, statsCol = Some("event_id"))
    val before = Snapshots.manifest(spark, dir)
      .select("path").collect().map(_.getString(0)).toSet

    val n0 = Snapshots.read(spark, dir).count()
    val someIds = ev.orderBy("event_id").limit(3)
      .select("event_id").collect().map(_.getLong(0))
    val newId = 900000001L
    val changes = Seq(
      // update one existing row, delete another, insert a new key;
      // a late delete beats an early upsert for the same key
      (someIds(0), 1L, "upd", 1.5, "u", 10L),
      (someIds(1), 2L, "del", 0.0, "d", 10L),
      (someIds(2), 3L, "first", 2.0, "u", 5L),
      (someIds(2), 3L, "second", 3.0, "d", 6L),
      (newId, 4L, "ins", 9.0, "u", 10L)
    ).toDF("event_id", "user_id", "event_type", "value", "op", "seq")

    val v = Snapshots.mergeCommit(spark, dir, changes,
      keyCols = Seq("event_id"), pruneCol = Some("event_id"))
    val after = Snapshots.read(spark, dir, Some(v))
    // net: -2 deletes (someIds(1), someIds(2)) +1 insert
    assert(after.count() == n0 - 1)
    assert(after.filter(col("event_id") === someIds(0))
      .select("event_type").head().getString(0) == "upd")
    assert(after.filter(col("event_id") === someIds(1)).count() == 0)
    assert(after.filter(col("event_id") === someIds(2)).count() == 0)
    assert(after.filter(col("event_id") === newId).count() == 1)
    // untouched files carried by reference: the low-id change keys sit
    // in the early range files, so at least one original file survives
    val surviving = Snapshots.manifest(spark, dir, Some(v))
      .select("path").collect().map(_.getString(0)).toSet
    assert((before & surviving).nonEmpty,
      s"merge rewrote every file despite range stats")
    assert((surviving -- before).nonEmpty, "no new files written")
    // pre-merge snapshot unchanged (time travel across a merge)
    assert(Snapshots.read(spark, dir, Some(0L)).count() == n0)
  }

  test("mergeCommit bootstraps an empty table from the batch alone") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    val changes = Seq(
      (1L, "a", "u", 1L), (1L, "b", "u", 2L), // LWW within batch
      (2L, "x", "u", 1L), (2L, "x", "d", 2L)  // delete wins
    ).toDF("id", "payload", "op", "seq")
    val v = Snapshots.mergeCommit(spark, dir, changes, keyCols = Seq("id"))
    val rows = Snapshots.read(spark, dir, Some(v))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "b")))
  }

  test("streaming sink: exactly-once commits with replayed batches fenced") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = tmpDir()
    // drive a real stream through foreachBatch into the table
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    mem.addData((1L, "a"), (2L, "b"))
    val q = mem.toDF.toDF("id", "payload").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Snapshots.commitStreamBatch(b, dir, id, statsCol = Some("id")); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir())
      .start()
    q.awaitTermination(60000)
    val afterStream = Snapshots.read(spark, dir).count()
    assert(afterStream == 2)
    val fencedAt = Snapshots.lastCommittedBatch(spark, dir)
    assert(fencedAt >= 0)
    // crash replay: the same batch id arrives again -> fenced, no dupes
    val replay = Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
    assert(Snapshots.commitStreamBatch(replay, dir, fencedAt, Some("id")).isEmpty)
    assert(Snapshots.read(spark, dir).count() == afterStream)
    // the fence survives an interleaved maintenance commit
    Snapshots.compactCommit(spark, dir, targetRows = 1000)
    assert(Snapshots.lastCommittedBatch(spark, dir) == fencedAt)
    assert(Snapshots.commitStreamBatch(replay, dir, fencedAt, Some("id")).isEmpty)
    // a genuinely new batch still lands
    val next = Seq((3L, "c")).toDF("id", "payload")
    assert(Snapshots.commitStreamBatch(next, dir, fencedAt + 1, Some("id")).nonEmpty)
    assert(Snapshots.read(spark, dir).count() == afterStream + 1)
  }

  test("streaming CDC merge: exactly-once, replays fenced, concurrent fence honored") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    Snapshots.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "payload"), dir,
      overwrite = false, statsCol = Some("id"))
    val b0 = Seq((2L, "b2", "u", 1L), (3L, "", "d", 1L))
      .toDF("id", "payload", "op", "seq")
    val v = Snapshots.mergeStreamBatch(b0, dir, batchId = 0L, keyCols = Seq("id"))
    assert(v.nonEmpty)
    def table() = Snapshots.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(table() == Seq((1L, "a"), (2L, "b2")))
    // crash replay of the same batch: fenced, nothing reapplied
    assert(Snapshots.mergeStreamBatch(b0, dir, 0L, Seq("id")).isEmpty)
    assert(table() == Seq((1L, "a"), (2L, "b2")))
    // the fence survives an interleaved append commit
    Snapshots.commit(Seq((9L, "z")).toDF("id", "payload"), dir)
    assert(Snapshots.mergeStreamBatch(b0, dir, 0L, Seq("id")).isEmpty)
    // a genuinely new CDC batch still lands
    val b1 = Seq((1L, "a2", "u", 2L)).toDF("id", "payload", "op", "seq")
    assert(Snapshots.mergeStreamBatch(b1, dir, 1L, Seq("id")).nonEmpty)
    assert(table() == Seq((1L, "a2"), (2L, "b2"), (9L, "z")))
    assert(Snapshots.lastCommittedBatch(spark, dir) == 1L)
  }

  test("versionAsOf resolves wall-clock time travel") {
    val dir = tmpDir()
    val t00 = System.currentTimeMillis()
    Snapshots.commit(nations.limit(5), dir)                       // v0
    Thread.sleep(1200)
    val t01 = System.currentTimeMillis()
    Thread.sleep(1200)
    Snapshots.commit(nations.limit(10), dir, overwrite = true)    // v1
    val now = System.currentTimeMillis() + 1000
    assert(Snapshots.versionAsOf(spark, dir, t00 - 10000).isEmpty)
    assert(Snapshots.versionAsOf(spark, dir, t01).contains(0L))
    assert(Snapshots.versionAsOf(spark, dir, now).contains(1L))
    val asOf = Snapshots.versionAsOf(spark, dir, t01)
    assert(Snapshots.read(spark, dir, asOf).count() == 5)
  }

  test("rollback re-publishes an old file list as a new version; fence survives") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    Snapshots.commit(nations, dir)                                    // v0
    Snapshots.commitStreamBatch(
      Seq((1L, "x")).toDF("id", "payload"), dir, batchId = 7L)        // v1
    Snapshots.commit(nations.limit(3), dir, overwrite = true)         // v2
    val v = Snapshots.rollback(spark, dir, toVersion = 0L)
    assert(v == 3L)
    assert(Snapshots.read(spark, dir).count() == nations.count())
    // history intact: the rolled-back v2 still reads
    assert(Snapshots.read(spark, dir, Some(2L)).count() == 3)
    // the streaming fence survived the rollback
    assert(Snapshots.lastCommittedBatch(spark, dir) == 7L)
  }

  test("gcOrphans reaps only old unreferenced commit dirs") {
    val dir = tmpDir()
    Snapshots.commit(nations, dir)
    nations.limit(2).write.parquet(s"$dir/data/orphan-old")
    nations.limit(2).write.parquet(s"$dir/data/orphan-young")
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    // age one orphan past the grace period
    f.setTimes(new org.apache.hadoop.fs.Path(s"$dir/data/orphan-old"),
      System.currentTimeMillis() - 100000, -1)
    val removed = Snapshots.gcOrphans(spark, dir, graceMs = 50000)
    assert(removed == 1)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$dir/data/orphan-old")))
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$dir/data/orphan-young")))
    // live data untouched
    assert(Snapshots.read(spark, dir).count() == nations.count())
  }

  test("schema evolution: a later append's new column reads as null in old files") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "payload"), dir)
    Snapshots.commit(Seq((2L, "b", 9.9)).toDF("id", "payload", "score"), dir)
    val merged = Snapshots.read(spark, dir, mergeSchema = true)
    assert(merged.columns.toSet == Set("id", "payload", "score"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.9)
  }

  test("diff across a type-widening evolution casts both sides to the merged schema") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    // v0 writes id as INT; v1 is a full rewrite to BIGINT (the
    // type-widening migration shape). diff's template follows the
    // TARGET version (all bigint), and its removed side — v0's int
    // files — must CAST to it, not just null-pad missing columns, or
    // the exceptAll union fails on the int/bigint mismatch
    Snapshots.commit(Seq((1, "a"), (2, "b")).toDF("id", "payload"), dir)
    Snapshots.commit(Seq((2L, "b"), (3L, "c")).toDF("id", "payload"), dir,
      overwrite = true)
    val d = Snapshots.diff(spark, dir, 0L, 1L)
    assert(d.schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    val changes = d.select("id", "payload", "__change").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // (2,b) exists on both sides and must CANCEL across the type
    // boundary — only the true churn remains
    assert(changes == Set((1L, "a", "delete"), (3L, "c", "insert")))
  }

  test("SQL TVFs and manifest row count: snapshots readable without the Scala API") {
    val dir = tmpDir()
    Snapshots.commit(nations, dir)
    Snapshots.commit(nations.limit(3), dir, overwrite = true)
    // manifest-only row count agrees with a real count at every version
    assert(Snapshots.rowCount(spark, dir) == 3)
    assert(Snapshots.rowCount(spark, dir, Some(0L)) == nations.count())
    // SQL: latest, time travel, and the manifest as tables
    val latest = spark.sql(s"SELECT count(*) AS n FROM graft_snapshot('$dir')")
      .head().getLong(0)
    val v0 = spark.sql(s"SELECT count(*) AS n FROM graft_snapshot('$dir', 0)")
      .head().getLong(0)
    assert(latest == 3 && v0 == nations.count())
    val mRows = spark.sql(
      s"SELECT sum(rows) AS n FROM graft_snapshot_manifest('$dir', 0)")
      .head().getLong(0)
    assert(mRows == nations.count())
  }

  test("SQL point lookup prunes through the bloom TVF") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sf("sf0.001"))
      .select("event_id", "event_type", "ts")
      .repartition(6, col("event_type"))
    Snapshots.commit(ev, dir, overwrite = false,
      statsCol = Some("ts"), bloomCols = Seq("event_id"))
    val id = ev.select("event_id").head().getLong(0)
    val got = spark.sql(
      s"SELECT count(*) AS n FROM graft_snapshot_point('$dir', 'event_id', ${id}L)" +
        s" WHERE event_id = ${id}L").head().getLong(0)
    assert(got == ev.filter(col("event_id") === id).count() && got > 0)
  }

  test("stats and bloom on the SAME clustered key: both prunings compose") {
    val dir = tmpDir()
    // clustered by user_id with stats AND bloom on it: range probes
    // prune via stats, point probes prune via bloom, and the point
    // probe beats the range probe on a clustered layout (1 file's
    // range contains the value, and only its bloom should fire)
    val ev = Tables.events(spark, sf("sf0.001"))
      .repartitionByRange(6, col("user_id"))
      .sortWithinPartitions(col("user_id"))
    Snapshots.commit(ev, dir, overwrite = false,
      statsCol = Some("user_id"), bloomCols = Seq("user_id"))
    val total = Snapshots.fileCount(spark, dir)
    val uid = ev.select("user_id").head().getLong(0)
    val want = ev.filter(col("user_id") === uid).count()
    val byRange = Snapshots.readPruned(spark, dir, uid, uid)
    val byPoint = Snapshots.readPoint(spark, dir, "user_id", uid)
    assert(byRange.filter(col("user_id") === uid).count() == want)
    assert(byPoint.filter(col("user_id") === uid).count() == want)
    val rangeFiles = byRange.select(input_file_name()).distinct().count()
    val pointFiles = byPoint.select(input_file_name()).distinct().count()
    assert(rangeFiles < total && pointFiles < total)
    assert(pointFiles <= rangeFiles,
      s"bloom point probe opened $pointFiles files vs stats range's $rangeFiles")
  }

  test("SQL range pruning through graft_snapshot_pruned") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sf("sf0.001"))
      .repartitionByRange(6, col("user_id"))
    Snapshots.commit(ev, dir, overwrite = false, statsCol = Some("user_id"))
    val got = spark.sql(
      s"SELECT count(*) AS n FROM graft_snapshot_pruned('$dir', 0, 2)" +
        " WHERE user_id BETWEEN 0 AND 2").head().getLong(0)
    assert(got == ev.filter(col("user_id").between(0, 2)).count() && got > 0)
    // and the TVF really pruned: fewer files than the snapshot holds
    val opened = spark.sql(
      s"SELECT count(*) FROM (SELECT DISTINCT input_file_name() AS f" +
        s" FROM graft_snapshot_pruned('$dir', 0, 2))").head().getLong(0)
    assert(opened < Snapshots.fileCount(spark, dir))
  }

  test("true concurrency: racing writers lose no commits") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    // 4 threads x 6 commits each, all racing for versions. With the
    // verified-rename protocol every append must survive: the loser
    // of a version race retries rather than silently nesting its
    // manifest inside the winner's.
    val ex = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 4).map { t =>
        ex.submit(new java.util.concurrent.Callable[Seq[Long]] {
          override def call(): Seq[Long] = (0 until 6).map { i =>
            Snapshots.commit(
              Seq((t * 100L + i, s"w$t-c$i")).toDF("id", "payload"), dir)
          }
        })
      }
      val versions = futures.flatMap(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
      // every commit got its own version
      assert(versions.distinct.size == 24, s"version collision slipped through: $versions")
      assert(versions.max == 23L)
    } finally ex.shutdownNow()
    // nothing lost: the latest snapshot holds all 24 appended rows
    val rows = Snapshots.read(spark, dir)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val want = (for (t <- 0 until 4; i <- 0 until 6) yield t * 100L + i).sorted
    assert(rows == want, s"lost commits: got ${rows.size} of 24 rows")
  }

  test("model check: random op sequences match an in-memory table model") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260812L)
    val dir = tmpDir()
    // model: key -> payload; ops mirror the table API
    var model = Map.empty[Long, String]
    var mutation = 0
    def freshRows(n: Int): Seq[(Long, String)] =
      Seq.fill(n) { mutation += 1; (rnd.nextInt(40).toLong, s"v$mutation") }
    def check(): Unit = {
      val got = Snapshots.read(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      // appends may duplicate keys (no implicit dedup in plain
      // commits) — the model tracks a multiset for those, so compare
      // per-key payload SETS only after merge ops collapse them; here
      // we keep the model exact by always merging (see ops below)
      assert(got == model.toSeq.sorted, s"table $got != model ${model.toSeq.sorted}")
    }
    // per-row strictly increasing sequences keep within-batch LWW
    // deterministic even when a key repeats in one batch
    var seq = 0L
    def nextSeq(): Long = { seq += 1; seq }
    // seed the table through a merge so keys stay unique thereafter
    val first = freshRows(10).map { case (k, p) => (k, p, "u", nextSeq()) }
    Snapshots.mergeCommit(spark, dir,
      first.toDF("id", "payload", "op", "seq"), keyCols = Seq("id"))
    // within-batch LWW: the highest-seq (= last) occurrence of a key wins
    model = first.foldLeft(model) { case (m, (k, p, _, _)) => m + (k -> p) }
    check()
    var nextBatch = 0L
    (1 to 16).foreach { i =>
      rnd.nextInt(6) match {
        case 0 => // merge a mixed upsert/delete batch
          val ups = freshRows(1 + rnd.nextInt(5))
          val dels = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(3))
          val batch =
            ups.map { case (k, p) => (k, p, "u", nextSeq()) } ++
              dels.map(k => (k, "", "d", nextSeq()))
          // drop ups of keys this same batch deletes: the deletes carry
          // higher seqs, so they'd win anyway — keep the model trivial
          val clean = batch.filterNot { case (k, _, op, _) =>
            op == "u" && dels.contains(k) }
          Snapshots.mergeCommit(spark, dir,
            clean.toDF("id", "payload", "op", "seq"), keyCols = Seq("id"))
          model = clean.foldLeft(model) {
            case (m, (k, _, "d", _)) => m - k
            case (m, (k, p, _, _)) => m + (k -> p)
          }
        case 1 => // compact
          Snapshots.compactCommit(spark, dir, targetRows = 1000)
        case 2 => // expire history
          Snapshots.expire(spark, dir, keepLast = 1 + rnd.nextInt(2))
        case 3 => // clustered compaction (range+sort by the key)
          Snapshots.compactCommit(spark, dir,
            targetRows = 5 + rnd.nextInt(20), clusterBy = Some("id"))
        case 4 => // fenced streaming merge, then a replay that must fence
          val ups = freshRows(1 + rnd.nextInt(3))
            .map { case (k, p) => (k, p, "u", nextSeq()) }
          val b = ups.toDF("id", "payload", "op", "seq")
          val id = nextBatch; nextBatch += 1
          assert(Snapshots.mergeStreamBatch(b, dir, id, Seq("id")).nonEmpty)
          assert(Snapshots.mergeStreamBatch(b, dir, id, Seq("id")).isEmpty,
            s"replay of batch $id was not fenced")
          model = ups.foldLeft(model) { case (m, (k, p, _, _)) => m + (k -> p) }
        case 5 => // rollback to a random surviving version, then
          // re-merge the model state so table == model again (the
          // model does not track history; rollback correctness is
          // "the chosen version's exact file list becomes latest")
          val f = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
          val vs = f.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_manifests"))
            .map(_.getPath.getName).filter(_.matches("v\\d{12}"))
            .map(_.drop(1).toLong).sorted
          val target = vs(rnd.nextInt(vs.length))
          val expect = Snapshots.read(spark, dir, Some(target))
            .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
          val v = Snapshots.rollback(spark, dir, toVersion = target)
          val got = Snapshots.read(spark, dir, Some(v))
            .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
          assert(got == expect, s"rollback to v$target changed content")
          // restore model state on the table: upsert every model row,
          // delete any stray keys the rolled-back snapshot re-exposed
          val strays = got.map(_._1).toSet -- model.keySet
          val fix =
            model.toSeq.map { case (k, p) => (k, p, "u", nextSeq()) } ++
              strays.toSeq.map(k => (k, "", "d", nextSeq()))
          Snapshots.mergeCommit(spark, dir,
            fix.toDF("id", "payload", "op", "seq"), keyCols = Seq("id"))
      }
      check()
    }
  }

  test("multi-column stats: a two-column predicate opens fewer files than either alone") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sf("sf0.001"))
    val b = ev.agg(min("ts"), max("ts"), min("user_id"), max("user_id")).head()
    val (tmin, tmax) = (b.getTimestamp(0), b.getTimestamp(1))
    val tmid = new java.sql.Timestamp(tmin.getTime + (tmax.getTime - tmin.getTime) / 2)
    val umid = (b.getLong(2) + b.getLong(3)) / 2
    // four quadrant commits, one file each: (ts half × user_id half)
    for (tsLo <- Seq(true, false); uidLo <- Seq(true, false)) {
      val q = ev
        .filter(if (tsLo) col("ts") <= lit(tmid) else col("ts") > lit(tmid))
        .filter(if (uidLo) col("user_id") <= umid else col("user_id") > umid)
        .coalesce(1)
      Snapshots.commit(q, dir, statsCol = Some("ts"),
        extraStatsCols = Seq("user_id"))
    }
    assert(Snapshots.fileCount(spark, dir) == 4)
    def nFiles(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    // each single-column slice opens its two quadrant files…
    val tsOnly = Snapshots.readPruned(spark, dir, tmin, tmid)
    val uidOnly = Snapshots.readPruned(spark, dir, b.getLong(2), umid,
      column = Some("user_id"))
    assert(nFiles(tsOnly) == 2 && nFiles(uidOnly) == 2)
    // …the conjunction opens exactly their one-file intersection
    val both = Snapshots.readPrunedBy(spark, dir, Map(
      "ts" -> (tmin, tmid), "user_id" -> (b.getLong(2), umid)))
    assert(nFiles(both) == 1,
      s"two-column prune opened ${nFiles(both)} files, expected 1")
    // and the pruned read is still complete for the predicate
    val want = ev.filter(col("ts").between(lit(tmin), lit(tmid)) &&
      col("user_id").between(b.getLong(2), umid)).count()
    assert(want > 0)
    assert(both.filter(col("ts").between(lit(tmin), lit(tmid)) &&
      col("user_id").between(b.getLong(2), umid)).count() == want)
    // the named stats keep native types
    val ms = Snapshots.manifest(spark, dir).schema
    assert(ms("smin_ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(ms("smin_user_id").dataType == org.apache.spark.sql.types.LongType)
    // SQL surface: the multi-dimensional TVF opens the same single
    // file (ts passed as an ISO string literal, coerced to timestamp)
    val fmtTs = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmtTs.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val sqlOpened = spark.sql(
      "SELECT count(*) FROM (SELECT DISTINCT input_file_name() FROM " +
        s"graft_snapshot_pruned_multi('$dir', 'ts', '${fmtTs.format(tmin)}', " +
        s"'${fmtTs.format(tmid)}', 'user_id', ${b.getLong(2)}L, ${umid}L))")
      .head().getLong(0)
    assert(sqlOpened == 1, s"TVF opened $sqlOpened files, expected 1")
    val eArity = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_snapshot_pruned_multi('$dir', 'ts')").collect())
    assert(eArity.getMessage.contains("graft_snapshot_pruned_multi takes"))
  }

  test("graft_snapshot_pruned TVF prunes on a named stats column; arity checked") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sf("sf0.001"))
      .repartitionByRange(4, col("user_id"))
    Snapshots.commit(ev, dir, statsCol = Some("ts"),
      extraStatsCols = Seq("user_id"))
    // named-column TVF == the DataFrame path, and it skips files
    val viaTvf = spark.sql(
      s"SELECT count(*) AS n FROM graft_snapshot_pruned('$dir', 0, 2, 'user_id')" +
        " WHERE user_id BETWEEN 0 AND 2").head().getLong(0)
    val viaDf = Snapshots.readPruned(spark, dir, 0, 2, column = Some("user_id"))
      .filter(col("user_id").between(0, 2)).count()
    assert(viaTvf == viaDf && viaTvf ==
      ev.filter(col("user_id").between(0, 2)).count())
    val opened = spark.sql(
      "SELECT count(*) FROM (SELECT DISTINCT input_file_name()" +
        s" FROM graft_snapshot_pruned('$dir', 0, 2, 'user_id'))").head().getLong(0)
    assert(opened < Snapshots.fileCount(spark, dir))
    // wrong arity dies with a usage message, not IndexOutOfBounds
    val e1 = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_snapshot_pruned('$dir')").collect())
    assert(e1.getMessage.contains("graft_snapshot_pruned takes"))
    val e2 = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_snapshot_point('$dir', 'x')").collect())
    assert(e2.getMessage.contains("graft_snapshot_point takes"))
  }

  test("mergeCommit: a NULL-key change row rewrites conservatively, no duplicate") {
    val dir = tmpDir()
    val s = spark
    import s.implicits._
    val base = Seq((Option(1L), "a"), (Option(2L), "b"), (None: Option[Long], "n0"))
      .toDF("k", "v")
    Snapshots.commit(base, dir, statsCol = Some("k"))
    // upsert the NULL key: min/max stats ignore nulls, so no file's
    // range can claim it — the merge must still find and rewrite the
    // file holding the existing null-key row instead of appending a
    // duplicate
    val changes = Seq((None: Option[Long], "n1", "u", 1L))
      .toDF("k", "v", "op", "seq")
    Snapshots.mergeCommit(spark, dir, changes, keyCols = Seq("k"))
    val out = Snapshots.read(spark, dir)
    assert(out.count() == 3, "null-key upsert duplicated the row")
    assert(out.filter(col("k").isNull).select("v").head().getString(0) == "n1")
  }

  test("versionAsOf reads committed_at from the manifest, not directory mtime") {
    val dir = tmpDir()
    Snapshots.commit(nations.limit(5), dir)                    // v0
    Thread.sleep(50)
    val mid = System.currentTimeMillis()
    Thread.sleep(50)
    Snapshots.commit(nations.limit(10), dir, overwrite = true) // v1
    // committed_at rides in every manifest row
    assert(Snapshots.manifest(spark, dir).columns.contains("committed_at"))
    // sabotage the mtimes: touch v0's directory far into the future —
    // an mtime-based resolution would now pick the wrong version
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    f.setTimes(new org.apache.hadoop.fs.Path(
      s"$dir/_manifests/v${"%012d".format(0L)}"),
      System.currentTimeMillis() + 3600 * 1000, -1)
    assert(Snapshots.versionAsOf(spark, dir, mid).contains(0L))
    assert(Snapshots.versionAsOf(spark, dir,
      System.currentTimeMillis() + 10).contains(1L))
    // and the SQL surface: the as-of read IS the v0 snapshot
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_snapshot_asof('$dir', ${mid}L)")
      .head().getLong(0) == 5)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_snapshot_asof('$dir', 0L)").collect())
    assert(e.getMessage.contains("no snapshot at"))
  }

  test("readPoint probes every recorded bloom type after schema evolution") {
    val dir = tmpDir()
    val s = spark
    import s.implicits._
    // generation 1: id committed as INT; generation 2: as BIGINT —
    // xxhash64 is type-sensitive, so each generation's blooms hashed
    // different bytes for the same logical value
    val g1 = Seq(1, 2, 3).toDF("id").withColumn("id", col("id").cast("int"))
    val g2 = Seq(100L, 200L, 300L).toDF("id")
    // fpp tiny so a cross-generation false positive (which would make
    // the read open int AND bigint files together) is ~1e-4, not ~1e-2
    Snapshots.commit(g1, dir, bloomCols = Seq("id"), bloomFpp = 1e-4)
    Snapshots.commit(g2, dir, bloomCols = Seq("id"), bloomFpp = 1e-4)
    val types = Snapshots.manifest(spark, dir)
      .select(element_at(col("bloom_types"), "id")).distinct().count()
    assert(types == 2, "expected two recorded bloom source types")
    // a probe must find values from BOTH generations (no silent
    // false negatives against the other generation's files)
    assert(Snapshots.readPoint(spark, dir, "id", 2)
      .filter(col("id") === 2).count() == 1)
    assert(Snapshots.readPoint(spark, dir, "id", 200L)
      .filter(col("id") === 200L).count() == 1)
  }

  test("deleteWhere: predicate CoW delete rewrites only touched files") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sf("sf0.001"))
      .repartitionByRange(8, col("user_id"))
    Snapshots.commit(ev, dir, statsCol = Some("user_id"))
    val before = Snapshots.manifest(spark, dir)
      .select("path").collect().map(_.getString(0)).toSet
    val total = ev.count()
    val nDel = ev.filter(col("user_id") <= 2).count()
    assert(nDel > 0)
    val v = Snapshots.deleteWhere(spark, dir, col("user_id") <= 2,
      pruneHint = Map("user_id" -> (0, 2)))
    val after = Snapshots.manifest(spark, dir, Some(v))
      .select("path").collect().map(_.getString(0)).toSet
    // untouched files carried by REFERENCE, touched ones replaced
    assert((before intersect after).nonEmpty, "no files carried by reference")
    assert((before -- after).nonEmpty && (before -- after).size < before.size,
      s"expected a strict subset rewritten, got ${(before -- after).size} of ${before.size}")
    assert(Snapshots.read(spark, dir).count() == total - nDel)
    assert(Snapshots.read(spark, dir).filter(col("user_id") <= 2).count() == 0)
    // the pre-delete snapshot is intact (time travel / audit)
    assert(Snapshots.read(spark, dir, Some(0L)).count() == total)
    // a predicate matching nothing publishes nothing
    assert(Snapshots.deleteWhere(spark, dir, col("user_id") === -999L) == v)
    // named stats survive the rewrite: range pruning still skips files
    val pruned = Snapshots.readPruned(spark, dir, 3, 4, column = Some("user_id"))
    assert(pruned.select(input_file_name()).distinct().count() <
      Snapshots.fileCount(spark, dir))
  }

  test("deleteWhere fully-emptied files are dropped, not rewritten empty") {
    val dir = tmpDir()
    val s = spark
    import s.implicits._
    val df = (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartitionByRange(2, col("k"))
    Snapshots.commit(df, dir, statsCol = Some("k"))
    assert(Snapshots.fileCount(spark, dir) == 2)
    Snapshots.deleteWhere(spark, dir, col("k") <= 10L)
    assert(Snapshots.fileCount(spark, dir) == 1,
      "the fully-deleted file should vanish from the manifest, not be rewritten empty")
    assert(Snapshots.read(spark, dir).count() == 10)
    assert(Snapshots.read(spark, dir).agg(min(col("k"))).head().getLong(0) == 11L)
  }

  test("updateWhere applies assignments to TRUE rows only; NULL predicate keeps rows") {
    val dir = tmpDir()
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", Option(5L)), (2L, "b", None: Option[Long]),
      (3L, "c", Option(10L))).toDF("k", "v", "x")
    Snapshots.commit(df, dir, statsCol = Some("k"))
    Snapshots.updateWhere(spark, dir, col("x") > 4L,
      Map("v" -> concat(col("v"), lit("!"))))
    val got = Snapshots.read(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // row 2's predicate is NULL (x is null) — untouched, not updated
    assert(got == Seq((1L, "a!"), (2L, "b"), (3L, "c!")))
    // delete with a NULL predicate row: NULL means KEEP, not delete
    Snapshots.deleteWhere(spark, dir, col("x") > 6L)
    val left = Snapshots.read(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(left == Seq((1L, "a!"), (2L, "b")),
      s"three-valued logic violated: $left")
  }

  test("diff: row-level change feed reads only churned files") {
    val dir = tmpDir()
    val s = spark
    import s.implicits._
    val v0rows = (1L to 10L).map(k => (k, s"v$k"))
    Snapshots.commit(v0rows.toDF("k", "v").repartitionByRange(2, col("k")),
      dir, statsCol = Some("k"))                                    // v0
    // append-only step: diff = exactly the appended rows, as inserts
    Snapshots.commit((11L to 13L).map(k => (k, s"v$k")).toDF("k", "v"), dir) // v1
    val d01 = Snapshots.diff(spark, dir, 0L, 1L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(d01 == Seq((11L, "v11", "insert"), (12L, "v12", "insert"),
      (13L, "v13", "insert")))
    // CoW merge: update k=3, delete k=7 — the rewritten file's
    // UNCHANGED rows must cancel out of the feed
    Snapshots.mergeCommit(spark, dir, Seq(
        (3L, "V3", "u", 1L), (7L, "x", "d", 1L)).toDF("k", "v", "op", "seq"),
      keyCols = Seq("k"))                                           // v2
    val d12 = Snapshots.diff(spark, dir, 1L, 2L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(d12 == Seq((3L, "V3", "insert"), (3L, "v3", "delete"),
      (7L, "v7", "delete")), s"CoW carry-over rows leaked into the feed: $d12")
    // the feed composes across a span
    val d02 = Snapshots.diff(spark, dir, 0L, 2L)
    assert(d02.filter(col("__change") === "insert").count() == 4) // 11,12,13 + V3
    assert(d02.filter(col("__change") === "delete").count() == 2) // old 3 + 7
    // SQL surface + arity check
    val viaSql = spark.sql(
      s"SELECT count(*) AS n FROM graft_snapshot_diff('$dir', 1, 2)")
      .head().getLong(0)
    assert(viaSql == 3)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_snapshot_diff('$dir', 1)").collect())
    assert(e.getMessage.contains("graft_snapshot_diff takes"))
    // reverse orientation: everything flips
    val rev = Snapshots.diff(spark, dir, 2L, 1L)
    assert(rev.filter(col("__change") === "delete").count() == 1 &&
      rev.filter(col("__change") === "insert").count() == 2)
  }

  test("diff follows the target version's schema across evolution") {
    val dir = tmpDir()
    val s = spark
    import s.implicits._
    Snapshots.commit(Seq((1L, "a")).toDF("k", "v"), dir)            // v0
    Snapshots.commit(Seq((2L, "b", 9L)).toDF("k", "v", "w"), dir)   // v1 adds w
    val d = Snapshots.diff(spark, dir, 0L, 1L).collect()
    assert(d.length == 1)
    val r = d.head
    assert(r.getLong(0) == 2L && r.getString(1) == "b" && r.getLong(2) == 9L)
  }

  test("history lists every live version with counts and commit stamps") {
    val dir = tmpDir()
    val s = spark
    import s.implicits._
    Snapshots.commit(nations.limit(5), dir)                      // v0
    Snapshots.commit(nations.limit(3), dir)                      // v1 append
    Snapshots.commitStreamBatch(Seq((1L, "x")).toDF("k", "v"),
      dir, batchId = 7L)                                         // v2, fenced
    val h = Snapshots.history(spark, dir).collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(h.map(_.getLong(1)).toSeq == Seq(-1L, 0L, 1L))        // parents
    val rows = h.map(r => r.getLong(3)).toSeq
    assert(rows == Seq(5L, 8L, 9L), s"cumulative row counts wrong: $rows")
    assert(h.last.getLong(4) == 7L, "batch watermark missing from history")
    val stamps = h.map(_.getLong(5)).toSeq
    assert(stamps == stamps.sorted && stamps.forall(_ > 0))
    // SQL surface + arity check
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_snapshot_history('$dir')")
      .head().getLong(0) == 3)
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM graft_snapshot_history('a', 'b')").collect())
    assert(e.getMessage.contains("graft_snapshot_history takes"))
    // expiry drops versions from the history too
    Snapshots.expire(spark, dir, keepLast = 2)
    assert(Snapshots.history(spark, dir).collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L))
  }

  test("tableSchema answers from the manifest alone, widened across generations") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    // generation 1: id INT; generation 2: id BIGINT + a new column —
    // the recorded per-file schemas must merge with numeric widening
    Snapshots.commit(Seq((1, "a")).toDF("id", "payload"), dir)
    Snapshots.commit(Seq((2L, "b", 9.9)).toDF("id", "payload", "score"), dir)
    val sc = Snapshots.tableSchema(spark, dir).get
    assert(sc("id").dataType == org.apache.spark.sql.types.LongType)
    assert(sc.fieldNames.toSet == Set("id", "payload", "score"))
    assert(sc("score").nullable)
    // PROOF it is manifest-only: delete every data file — the schema
    // (and the change feed's query-start schema, which is built on
    // it) still answers; a footer walk would now fail
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(s"$dir/data"), true)
    assert(Snapshots.tableSchema(spark, dir).contains(sc))
    val feed = graft.sources.ChangeFeedSource.feedSchema(spark, dir)
    assert(feed.fieldNames.toSeq ==
      Seq("id", "payload", "score", "__change", "__version"))
    // irreconcilable evolution (string vs numeric) falls back to None
    // rather than guessing
    val dir2 = tmpDir()
    Snapshots.commit(Seq((1, "a")).toDF("id", "payload"), dir2)
    Snapshots.commit(Seq(("one", "b")).toDF("id", "payload"), dir2)
    assert(Snapshots.tableSchema(spark, dir2).isEmpty)
    // bigint vs float/double also refuses — no fp mantissa holds all
    // 64-bit ids, and a lossy merge would CAST the change feed into
    // cancelling genuinely different rows
    val dir3 = tmpDir()
    Snapshots.commit(Seq(Tuple1(1L)).toDF("id"), dir3)
    Snapshots.commit(Seq(Tuple1(2.5)).toDF("id"), dir3)
    assert(Snapshots.tableSchema(spark, dir3).isEmpty)
    // int vs float widens to DOUBLE (exact for every int32), not float
    val dir4 = tmpDir()
    Snapshots.commit(Seq(Tuple1(1)).toDF("x"), dir4)
    Snapshots.commit(Seq(Tuple1(2.5f)).toDF("x"), dir4)
    assert(Snapshots.tableSchema(spark, dir4).get("x").dataType ==
      org.apache.spark.sql.types.DoubleType)
  }

  test("statsSummary answers table min/max/rows from the manifest alone") {
    val dir = tmpDir()
    Snapshots.commit(nations, dir, statsCol = Some("n_nationkey"),
      extraStatsCols = Seq("n_name"))
    val stats = Snapshots.statsSummary(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats.keySet == Set("n_name", "n_nationkey"))
    val key = stats("n_nationkey")
    assert(key.getString(1) == "0" && key.getString(2) == "24")
    assert(key.getLong(5) == 25L)
    val name = stats("n_name")
    // sf0.001 generates synthetic names NATION_0..NATION_24; the
    // lexicographic min/max are NATION_0 and NATION_9.
    assert(name.getString(1) == "NATION_0" && name.getString(2) == "NATION_9")
    // PROOF it is manifest-only: delete every data file — the
    // summary still answers (a read would now fail)
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(s"$dir/data"), true)
    assert(Snapshots.statsSummary(spark, dir).count() == 2L)
    // SQL surface + arity check
    assert(spark.sql(s"SELECT * FROM graft_snapshot_stats('$dir')").count() == 2L)
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM graft_snapshot_stats('a', 1, 2)").collect())
    assert(e.getMessage.contains("graft_snapshot_stats takes"))
  }

  test("consumeChanges replicates a table exactly-once through the change feed") {
    val src = tmpDir(); val state = tmpDir(); val dst = tmpDir()
    val s = spark
    import s.implicits._
    def applyBatch(changes: org.apache.spark.sql.DataFrame, v: Long): Unit = {
      // change rows → CDC batch → fenced merge: batchId = source
      // version makes the downstream apply exactly-once under replay
      Snapshots.mergeStreamBatch(changes
          .withColumn("op", when(col("__change") === "insert", lit("u"))
            .otherwise(lit("d")))
          .withColumn("seq", lit(v)).drop("__change"),
        dst, batchId = v, keyCols = Seq("k"))
      ()
    }
    def srcRows() = Snapshots.read(spark, src).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    def dstRows() = Snapshots.read(spark, dst).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    Snapshots.commit((1L to 6L).map(k => (k, s"v$k")).toDF("k", "v"),
      src, statsCol = Some("k"))                                    // v0
    assert(Snapshots.consumeChanges(spark, src, state)(applyBatch) == Seq(0L))
    assert(dstRows() == srcRows())
    // mixed churn: append, then CoW upsert+delete, then predicate delete
    Snapshots.commit(Seq((7L, "v7")).toDF("k", "v"), src)           // v1
    Snapshots.mergeCommit(spark, src,
      Seq((3L, "V3", "u", 1L), (5L, "x", "d", 1L)).toDF("k", "v", "op", "seq"),
      keyCols = Seq("k"))                                           // v2
    Snapshots.deleteWhere(spark, src, col("k") === 1L)              // v3
    assert(Snapshots.consumeChanges(spark, src, state)(applyBatch) ==
      Seq(1L, 2L, 3L))
    assert(dstRows() == srcRows(), s"replica diverged: ${dstRows()} vs ${srcRows()}")
    // nothing new → nothing processed
    assert(Snapshots.consumeChanges(spark, src, state)(applyBatch).isEmpty)
    // crash window: f(v3)'s downstream merge landed but the run died
    // BEFORE writing marker v3 — i.e., the state still holds marker
    // v2. The replayed f is FENCED by the batch watermark and the
    // replica stays correct.
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(state), spark.sparkContext.hadoopConfiguration)
    f.create(new org.apache.hadoop.fs.Path(
      s"$state/processed-v${"%012d".format(2L)}"), true).close()
    f.delete(new org.apache.hadoop.fs.Path(
      s"$state/processed-v${"%012d".format(3L)}"), false)
    var calls = 0
    assert(Snapshots.consumeChanges(spark, src, state) { (c, v) =>
      calls += 1; applyBatch(c, v) } == Seq(3L))
    assert(calls == 1 && dstRows() == srcRows(),
      "fenced replay must leave the replica untouched")
  }

  test("analyzeCommit retrofits stats + blooms metadata-only; pruning starts working") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sf("sf0.001")).repartitionByRange(8, col("ts"))
    // a legacy table: two commits, no stats, no blooms
    Snapshots.commit(ev.filter(col("event_id") % 2 === 0), dir)      // v0
    Snapshots.commit(ev.filter(col("event_id") % 2 === 1), dir)      // v1
    val m1 = Snapshots.manifest(spark, dir)
    assert(m1.filter(col("stats_min").isNotNull).count() == 0,
      "precondition: the legacy table has no stats")
    val filesBefore = m1.select("path").collect().map(_.getString(0)).toSet

    val v = Snapshots.analyzeCommit(spark, dir,
      statsCols = Seq("ts"), bloomCols = Seq("user_id"))
    assert(v == 2L)
    val m2 = Snapshots.manifest(spark, dir)
    // metadata only: the SAME data files, now with typed stats + blooms
    assert(m2.select("path").collect().map(_.getString(0)).toSet == filesBefore)
    assert(m2.schema("smin_ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(m2.filter(col("smin_ts").isNull).count() == 0)
    assert(m2.filter(col("blooms").isNull).count() == 0)

    // range pruning now skips files
    val b = ev.agg(min("ts"), max("ts")).head()
    val tmin = b.getTimestamp(0)
    val mid = new java.sql.Timestamp(
      tmin.getTime + (b.getTimestamp(1).getTime - tmin.getTime) / 8)
    val total = Snapshots.fileCount(spark, dir)
    val pruned = Snapshots.readPruned(spark, dir, tmin, mid, column = Some("ts"))
    assert(pruned.select(input_file_name()).distinct().count() < total)
    val want = ev.filter(col("ts").between(lit(tmin), lit(mid))).count()
    assert(pruned.filter(col("ts").between(lit(tmin), lit(mid))).count() == want)

    // point lookups prune through the retrofitted blooms
    val someUser = ev.select("user_id").head().getLong(0)
    val hit = Snapshots.readPoint(spark, dir, "user_id", someUser)
    assert(hit.filter(col("user_id") === someUser).count() ==
      ev.filter(col("user_id") === someUser).count())
    // earlier versions stay readable, stats-less as they were
    assert(Snapshots.read(spark, dir, Some(1L)).count() == ev.count())
  }

  test("expire keeps the newest snapshots and deletes only their dead files") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sf("sf0.001"))
    Snapshots.commit(ev.limit(100), dir)                       // v0
    Snapshots.commit(ev.limit(50), dir, overwrite = true)      // v1 (v0 files dead)
    Snapshots.commit(ev.limit(25), dir)                        // v2 (appends to v1)
    val n2 = Snapshots.read(spark, dir, Some(2L)).count()
    val deleted = Snapshots.expire(spark, dir, keepLast = 2)
    assert(deleted > 0, "v0's files should have been deleted")
    // survivors unaffected
    assert(Snapshots.read(spark, dir, Some(1L)).count() == 50)
    assert(Snapshots.read(spark, dir, Some(2L)).count() == n2)
    // v0 is gone
    intercept[Exception](Snapshots.manifest(spark, dir, Some(0L)).collect())
    // second expire is a no-op
    assert(Snapshots.expire(spark, dir, keepLast = 2) == 0)
  }
}
