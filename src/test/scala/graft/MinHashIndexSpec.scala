package graft

import graft.operators.{Dedup, MinHashIndex}
import org.apache.spark.sql.functions._

class MinHashIndexSpec extends SparkSpec {

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rmrf); f.delete(); ()
  }

  test("build + append + query equals re-banding the whole corpus from scratch") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    // corpus arrives as two batches; the third slice is the new batch
    val batch1 = docs.filter(col("doc_id") % 3 === 0)
    val batch2 = docs.filter(col("doc_id") % 3 === 1)
    val fresh = docs.filter(col("doc_id") % 3 === 2)
    val dir = java.nio.file.Files.createTempDirectory("mh_idx").toString + "/idx"
    try {
      MinHashIndex.build(spark, dir, batch1, "doc_id", "text")
      MinHashIndex.append(spark, dir, batch2, "doc_id", "text")
      val viaIndex = MinHashIndex.query(spark, dir, fresh, "doc_id", "text",
          threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val scratch = Dedup.minHashLshAgainst(fresh, batch1.union(batch2),
          "doc_id", "text", numHashes = 128, bands = 16, threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(viaIndex == scratch)
      assert(viaIndex.nonEmpty, "sf0.001 documents should contain cross-side near-dups")
    } finally rmrf(new java.io.File(dir).getParentFile)
  }

  test("tombstoned docs stop matching queries; everything else still does") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val corpus = docs.filter(col("doc_id") % 3 =!= 2)
    val fresh = docs.filter(col("doc_id") % 3 === 2)
    val dir = java.nio.file.Files.createTempDirectory("mh_tomb").toString + "/idx"
    try {
      MinHashIndex.build(spark, dir, corpus, "doc_id", "text")
      val before = MinHashIndex.query(spark, dir, fresh, "doc_id", "text",
          threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(before.nonEmpty)
      // erase every matched corpus doc — their near-dup veto must go
      // with them (the deleteWhere pairing: an erased doc must not
      // keep suppressing future content)
      val gone = before.map(_._2)
      val s = spark
      import s.implicits._
      MinHashIndex.tombstone(spark, dir, gone.toSeq.toDF("doc_id"), "doc_id")
      val after = MinHashIndex.query(spark, dir, fresh, "doc_id", "text",
          threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after.forall(p => !gone.contains(p._2)),
        s"tombstoned ids still matched: ${after.filter(p => gone.contains(p._2))}")
      // duplicate tombstones are harmless; untombstoned corpus intact
      MinHashIndex.tombstone(spark, dir, gone.take(1).toSeq.toDF("doc_id"), "doc_id")
      val corpusProbe = MinHashIndex.query(spark, dir,
        corpus.filter(!col("doc_id").isin(gone.toSeq: _*)).limit(50)
          .withColumn("doc_id", col("doc_id") + 1000000L),
        "doc_id", "text", threshold = 0.9)
      assert(corpusProbe.count() > 0,
        "live corpus docs must still match (a shifted-id copy of a live doc is its exact dup)")
    } finally rmrf(new java.io.File(dir).getParentFile)
  }

  test("append adds files without rewriting, and band reads partition-prune") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val dir = java.nio.file.Files.createTempDirectory("mh_idx").toString + "/idx"
    try {
      MinHashIndex.build(spark, dir, docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text")
      def bandFiles(): Map[String, Set[String]] =
        new java.io.File(s"$dir/bands").listFiles.filter(_.getName.startsWith("__band="))
          .map(d => d.getName -> d.listFiles.filter(_.getName.endsWith(".parquet"))
            .map(f => f.getName + ":" + f.lastModified()).toSet).toMap
      val before = bandFiles()
      assert(before.keySet == (0 until 16).map(b => s"__band=$b").toSet)
      MinHashIndex.append(spark, dir,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      val after = bandFiles()
      // every pre-existing file survives byte-identical (same mtime);
      // the append only ADDED files inside each band directory
      before.foreach { case (band, files) =>
        assert(files.subsetOf(after(band)), s"$band files were rewritten")
        assert(after(band).size > files.size, s"$band gained no files")
      }
      // a band-scoped read prunes to exactly one of the 16 partitions
      val plan = MinHashIndex.bandScan(spark, dir, band = 3)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") &&
          "__band#\\d+ = 3".r.findFirstIn(plan).isDefined,
        s"band scan must partition-prune, got:\n$plan")
    } finally rmrf(new java.io.File(dir).getParentFile)
  }

  test("append and query reject nothing silently: meta mismatch is impossible by construction") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(50)
    val dir = java.nio.file.Files.createTempDirectory("mh_idx").toString + "/idx"
    try {
      MinHashIndex.build(spark, dir, docs, "doc_id", "text",
        numHashes = 64, bands = 8)
      val meta = MinHashIndex.readMeta(spark, dir)
      assert(meta.numHashes == 64 && meta.bands == 8)
      // band partitions reflect the stored meta, not the defaults
      val bands = new java.io.File(s"$dir/bands").listFiles
        .map(_.getName).filter(_.startsWith("__band=")).toSet
      assert(bands == (0 until 8).map(b => s"__band=$b").toSet)
    } finally rmrf(new java.io.File(dir).getParentFile)
  }

  test("a doc re-appended after its tombstone was compacted away vetoes again pre-vacuum") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mh_reapp").toString + "/idx"
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val others = Seq((2L, "one two three four five six seven eight nine ten"),
      (3L, "red orange yellow green blue indigo violet pink brown black"))
    MinHashIndex.build(spark,
      dir, (Seq((1L, text)) ++ others).toDF("doc_id", "text"),
      "doc_id", "text")
    val probe = Seq((99L, text)).toDF("doc_id", "text")
    def vetoed(): Boolean = MinHashIndex.query(spark, dir, probe,
      "doc_id", "text", threshold = 0.9).collect().nonEmpty
    assert(vetoed())
    // erase doc 1, compact (tombstone applied physically + RETIRED)
    MinHashIndex.tombstone(spark, dir, Seq(1L).toDF("doc_id"), "doc_id")
    assert(!vetoed())
    MinHashIndex.compact(spark, dir)
    assert(!vetoed())
    // re-append the same id (content legitimately returns): the
    // retired-but-unvacuumed tombstone file must NOT hide it...
    MinHashIndex.append(spark, dir, Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(vetoed(),
      "a retired tombstone re-hid the re-appended doc before vacuum")
    // ...nor may a second compact re-apply it
    MinHashIndex.compact(spark, dir)
    assert(vetoed(), "compact re-applied an already-retired tombstone")
    assert(MinHashIndex.vacuum(spark, dir) > 0)
    assert(vetoed())
  }

  test("compact merges band files, applies tombstones physically, preserves queries") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf("sf0.001"))
    val corpus = docs.filter(col("doc_id") % 3 =!= 2)
    val fresh = docs.filter(col("doc_id") % 3 === 2)
    val dir = java.nio.file.Files.createTempDirectory("mh_cpt").toString + "/idx"
    def bandFiles(): Int = {
      val meta = MinHashIndex.readMeta(spark, dir)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(MinHashIndex.bandsPath(dir, meta)))
        .count(_.getName.endsWith(".parquet"))
    }
    try {
      // three appends → ≥3 files per band; then tombstone the matches
      MinHashIndex.build(spark, dir, corpus.filter(col("doc_id") % 4 === 0),
        "doc_id", "text")
      MinHashIndex.append(spark, dir,
        corpus.filter(col("doc_id") % 4 === 1), "doc_id", "text")
      MinHashIndex.append(spark, dir,
        corpus.filter(col("doc_id") % 4 > 1), "doc_id", "text")
      val matched = MinHashIndex.query(spark, dir, fresh, "doc_id", "text",
          threshold = 0.9)
        .collect().map(_.getLong(1)).toSet
      assert(matched.nonEmpty)
      val gone = matched.take(math.max(1, matched.size / 2))
      MinHashIndex.tombstone(spark, dir, gone.toSeq.toDF("doc_id"), "doc_id")
      val before = MinHashIndex.query(spark, dir, fresh, "doc_id", "text",
          threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val filesBefore = bandFiles()

      val oldGenBands = MinHashIndex.bandsPath(dir,
        MinHashIndex.readMeta(spark, dir))
      MinHashIndex.compact(spark, dir)

      assert(MinHashIndex.readMeta(spark, dir).gen == 1)
      val after = MinHashIndex.query(spark, dir, fresh, "doc_id", "text",
          threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after == before, "compaction must not change query results")
      val filesAfter = bandFiles()
      assert(filesAfter < filesBefore && filesAfter <= 16,
        s"band files should merge: $filesBefore -> $filesAfter")
      // grace window: the retired generation survives the flip — an
      // in-flight reader that resolved the old meta can finish its
      // scan; only vacuum() reclaims it
      assert(new java.io.File(oldGenBands).exists,
        "the old generation must outlive the flip until vacuum")
      assert(MinHashIndex.vacuum(spark, dir) > 0)
      assert(!new java.io.File(oldGenBands).exists,
        "vacuum must reclaim the retired generation")
      assert(MinHashIndex.vacuum(spark, dir) == 0) // idempotent
      // tombstones applied PHYSICALLY: the marker files are gone, yet
      // an exact copy of a tombstoned doc still finds no veto
      assert(!new java.io.File(s"$dir/tombstones").exists ||
        new java.io.File(s"$dir/tombstones").listFiles.isEmpty)
      val probe = docs.filter(col("doc_id").isin(gone.toSeq: _*))
        .withColumn("doc_id", col("doc_id") + 5000000L)
      val ghost = MinHashIndex.query(spark, dir, probe, "doc_id", "text",
          threshold = 0.9)
        .filter(col("id_b").isin(gone.toSeq: _*))
      assert(ghost.count() == 0, "tombstoned docs must be physically gone")
      // appends keep working after the generation flip
      MinHashIndex.append(spark, dir, fresh.limit(5), "doc_id", "text")
      assert(MinHashIndex.bandScan(spark, dir, 0).count() > 0)
      // the single-writer lock: with a compaction's lock in place an
      // append fails LOUDLY instead of losing its batch into the
      // generation the compaction is about to retire
      val lock = new java.io.File(s"$dir/_graft_maintenance.lock")
      assert(lock.createNewFile())
      val e = intercept[IllegalStateException] {
        MinHashIndex.append(spark, dir, fresh.limit(1), "doc_id", "text")
      }
      assert(e.getMessage.contains("maintenance writer"))
      assert(lock.delete())
      MinHashIndex.append(spark, dir, fresh.limit(1), "doc_id", "text")
    } finally rmrf(new java.io.File(dir).getParentFile)
  }

  test("index subscribed to a snapshot table's change feed tracks the live corpus") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf("sf0.001")).select("doc_id", "text")
    val third0 = docs.filter(col("doc_id") % 3 === 0)
    val third1 = docs.filter(col("doc_id") % 3 === 1)
    val fresh = docs.filter(col("doc_id") % 3 === 2)
    val root = java.nio.file.Files.createTempDirectory("mh_feed").toString
    val tbl = s"$root/tbl"; val idx = s"$root/idx"; val ckpt = s"$root/ckpt"
    try {
      graft.sources.Snapshots.commit(third0, tbl,
        statsCol = Some("doc_id"))                                  // v0
      graft.sources.Snapshots.commit(third1, tbl)                   // v1

      // the subscription: inserts append to the index, deletes
      // tombstone it — the index pays O(churn) per trigger and never
      // re-reads the corpus
      def start() = graft.sources.Snapshots.changesStream(spark, tbl)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.persist()
          try {
            val ins = df.filter(col("__change") === "insert")
              .select("doc_id", "text")
            val del = df.filter(col("__change") === "delete")
              .select("doc_id")
            if (ins.head(1).nonEmpty) {
              if (!new java.io.File(s"$idx/_graft_minhash_meta.json").exists)
                MinHashIndex.build(spark, idx, ins, "doc_id", "text")
              else MinHashIndex.append(spark, idx, ins, "doc_id", "text")
            }
            if (del.head(1).nonEmpty)
              MinHashIndex.tombstone(spark, idx, del, "doc_id")
          } finally { df.unpersist(); () }
        }.start()

      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      def viaIndex() = MinHashIndex.query(spark, idx, fresh,
          "doc_id", "text", threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def scratch() = Dedup.minHashLshAgainst(fresh,
          graft.sources.Snapshots.read(spark, tbl),
          "doc_id", "text", numHashes = 128, bands = 16, threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val before = viaIndex()
      assert(before == scratch() && before.nonEmpty,
        "subscribed index must equal re-banding the live table")

      // right-to-erasure on the TABLE: the feed's deletes must reach
      // the index on the next trigger — erased docs stop vetoing
      val gone = before.map(_._2).toSeq
      graft.sources.Snapshots.deleteWhere(spark, tbl,
        col("doc_id").isin(gone: _*))                               // v2
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val after = viaIndex()
      assert(after == scratch(),
        s"index diverged from the live table after erasure: $after vs ${scratch()}")
      assert(after.forall(p => !gone.contains(p._2)),
        "erased docs still vetoing")
    } finally rmrf(new java.io.File(root))
  }
}
