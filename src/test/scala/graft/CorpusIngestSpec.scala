package graft

import org.apache.spark.sql.functions._
import graft.sources.Snapshots
import graft.streaming.CorpusIngest

/** End-to-end incremental corpus ingest: quality gate → within-batch
  * exact + near dedup → cross-corpus dedup via the durable index →
  * exactly-once snapshot commit; replays fenced; the index stays in
  * lockstep with the accepted corpus. */
class CorpusIngestSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ingest").toString

  // ~45 English tokens with the seed woven into every clause, so two
  // different seeds share almost no shingles (genuinely distinct
  // docs) while a copy with one appended token stays a near-dup
  private def doc(seed: String): String =
    (1 to 15).map(i => s"the $seed$i report and").mkString(" ") +
      " it was stable for the season"

  test("two batches: gates, dedup tiers, exactly-once commits, fenced replay") {
    val s = spark
    import s.implicits._
    val tableDir = tmp(); val indexDir = tmp()

    // batch 0: unique good doc; exact-dup pair; near-dup pair (one
    // appended token); a too-short reject
    val b0 = Seq(
      (1L, doc("alpha")),
      (2L, doc("beta")),
      (3L, doc("beta")),                       // exact dup of 2
      (4L, doc("gamma")),
      (5L, doc("gamma") + " addendum"),        // near dup of 4
      (6L, "too short")                        // quality reject
    ).toDF("doc_id", "text")
    val s0 = CorpusIngest.ingestBatch(b0, 0L, tableDir, indexDir,
      "doc_id", "text", threshold = 0.8)
    assert(!s0.fenced && s0.arrived == 6)
    assert(s0.failedQuality == 1, s0)
    assert(s0.dupInBatch == 2, s0)             // ids 3 (exact) and 5 (near)
    assert(s0.dupVsCorpus == 0 && s0.accepted == 3, s0)
    val t0 = Snapshots.read(spark, tableDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(t0 == Seq(1L, 2L, 4L))

    // batch 1: fresh doc; near-dup of ACCEPTED doc 1 -> cross-corpus drop
    val b1 = Seq(
      (7L, doc("delta")),
      (8L, doc("alpha") + " postscript")
    ).toDF("doc_id", "text")
    val s1 = CorpusIngest.ingestBatch(b1, 1L, tableDir, indexDir,
      "doc_id", "text", threshold = 0.8)
    assert(s1.accepted == 1 && s1.dupVsCorpus == 1, s1)
    val t1 = Snapshots.read(spark, tableDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(t1 == Seq(1L, 2L, 4L, 7L))

    // crash replay of batch 1: fenced, corpus unchanged
    val s1r = CorpusIngest.ingestBatch(b1, 1L, tableDir, indexDir,
      "doc_id", "text", threshold = 0.8)
    assert(s1r.fenced && s1r.accepted == 0)
    assert(Snapshots.read(spark, tableDir).count() == 4)

    // the index is in lockstep: a near-dup of batch-1's accepted doc
    // is caught by a fresh query
    val probe = Seq((9L, doc("delta") + " afterword")).toDF("doc_id", "text")
    val hits = graft.operators.MinHashIndex.query(
      spark, indexDir, probe, "doc_id", "text", threshold = 0.8)
    assert(hits.filter(col("id_b") === 7L).count() == 1)

    // the corpus table serves point lookups through its id blooms
    val one = Snapshots.readPoint(spark, tableDir, "doc_id", 7L)
    assert(one.filter(col("doc_id") === 7L).count() == 1)
  }

  test("crash between index append and table commit: replay reproduces the accept decision") {
    val s = spark
    import s.implicits._
    val tableDir = tmp(); val indexDir = tmp()
    val b0 = Seq((1L, doc("omega"))).toDF("doc_id", "text")
    CorpusIngest.ingestBatch(b0, 0L, tableDir, indexDir, "doc_id", "text",
      threshold = 0.8)
    // batch 1 = a fresh doc + a near-dup of the accepted corpus; its
    // first run ACCEPTED doc 2, appended it to the index, then crashed
    // BEFORE the fenced table commit — simulate by appending batch 1's
    // accept set to the index with no table commit
    val b1 = Seq(
      (2L, doc("sigma")),                 // would be accepted
      (3L, doc("omega") + " afterword")   // cross-corpus dup of 1
    ).toDF("doc_id", "text")
    graft.operators.MinHashIndex.append(spark, indexDir,
      b1.filter(col("doc_id") === 2L), "doc_id", "text")
    // the replay: doc 2 is already IN the index. It must not match
    // ITSELF and be dropped as a corpus dup (that would lose the batch
    // forever); doc 3 must still drop against doc 1.
    val s1 = CorpusIngest.ingestBatch(b1, 1L, tableDir, indexDir,
      "doc_id", "text", threshold = 0.8)
    assert(!s1.fenced, s1)
    assert(s1.accepted == 1 && s1.dupVsCorpus == 1, s1)
    assert(Snapshots.read(spark, tableDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(Snapshots.lastCommittedBatch(spark, tableDir) == 1L)
  }

  test("a batch's lineage is persisted, not recomputed per stat/write") {
    val s = spark
    import s.implicits._
    val tableDir = tmp(); val indexDir = tmp()
    CorpusIngest.ingestBatch(
      Seq((1L, doc("kappa"))).toDF("doc_id", "text"),
      0L, tableDir, indexDir, "doc_id", "text")
    // Across a batch against an EXISTING index (the expensive path:
    // gate + exact + near + cross + append + commit), assert the fix's
    // mechanism directly: the three stage frames are persisted during
    // the batch (unpersist events observed) and released afterwards,
    // and the total job count stays bounded — before the persist fix
    // the four stat counts each re-ran the whole MinHash lineage.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val unpersists = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onUnpersistRDD(
          u: org.apache.spark.scheduler.SparkListenerUnpersistRDD): Unit =
        unpersists.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    // other suites sharing this session may legitimately hold caches;
    // only RDDs persisted by THIS batch must be gone afterwards
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    try {
      val b1 = (2 to 9).map(i => (i.toLong, doc(s"seed$i"))).toDF("doc_id", "text")
      val s1 = CorpusIngest.ingestBatch(b1, 1L, tableDir, indexDir,
        "doc_id", "text", threshold = 0.8)
      assert(s1.accepted == 8, s1)
      // give the listener bus a moment to drain its async events
      Thread.sleep(1000)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(unpersists.get() >= 3,
      s"expected the 3 stage frames to be cached and released, saw ${unpersists.get()} unpersists")
    assert(jobs.get() <= 100, s"ingestBatch ran ${jobs.get()} jobs — lineage recompute?")
    // and the batch-scoped caches are released afterwards
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.isEmpty, s"ingestBatch leaked persisted RDDs: $leaked")
  }

  test("end-to-end: a real stream drives ingestBatch through foreachBatch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val tableDir = tmp(); val indexDir = tmp(); val cp = tmp()
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stats = scala.collection.mutable.ArrayBuffer[CorpusIngest.IngestStats]()
    // same checkpoint across both runs: run 2 resumes the offset log,
    // reads only the new rows, and continues the batch-id sequence —
    // the restart shape a deployed foreachBatch sink actually sees
    def run(): Unit = {
      val q = mem.toDF.toDF("doc_id", "text").writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          stats.synchronized {
            stats += CorpusIngest.ingestBatch(b, id, tableDir, indexDir,
              "doc_id", "text", threshold = 0.8)
          }
          ()
        }
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    mem.addData((1L, doc("alpha")), (2L, doc("alpha")), (3L, doc("beta")))
    run()
    // second stream run: new docs + a cross-corpus dup of an accepted one
    mem.addData((4L, doc("beta") + " afterword"), (5L, doc("gamma")))
    run()
    val corpus = Snapshots.read(spark, tableDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // 2 dropped as exact dup of 1; 4 dropped as cross-corpus dup of 3
    assert(corpus == Seq(1L, 3L, 5L), s"stats: $stats corpus: $corpus")
    assert(stats.map(_.accepted).sum == 3)
  }

  test("cluster mode: near-dups kept + labeled; assignment == from-scratch; replay fenced") {
    val s = spark
    import s.implicits._
    val tableDir = tmp(); val indexDir = tmp(); val clusterDir = tmp()
    // batch 0: alpha + its near-dup, beta, and a quality reject
    val b0 = Seq(
      (1L, doc("alpha")),
      (2L, doc("alpha") + " addendum"),   // near dup of 1 — KEPT here
      (3L, doc("beta")),
      (4L, "too short")                   // quality reject
    ).toDF("doc_id", "text")
    val s0 = CorpusIngest.ingestBatch(b0, 0L, tableDir, indexDir,
      "doc_id", "text", threshold = 0.8, clusterDir = Some(clusterDir))
    assert(!s0.fenced && s0.failedQuality == 1, s0)
    assert(s0.accepted == 3, s"cluster mode must keep near-dups: $s0")
    assert(Snapshots.read(spark, tableDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))

    // batch 1: CROSS-BATCH near-dups — 5 joins batch-0's beta, 6 joins
    // the alpha pair (transitively, via 2's addendum form), 7 is fresh
    val b1 = Seq(
      (5L, doc("beta") + " afterword"),
      (6L, doc("alpha") + " addendum extra"),
      (7L, doc("gamma"))
    ).toDF("doc_id", "text")
    val s1 = CorpusIngest.ingestBatch(b1, 1L, tableDir, indexDir,
      "doc_id", "text", threshold = 0.8, clusterDir = Some(clusterDir))
    assert(s1.accepted == 3, s1)

    // the durable assignment equals clustering ALL quality-passing
    // docs from scratch — cross-batch transitive merges included
    val allDocs = b0.filter(col("doc_id") =!= 4L).unionByName(b1)
    val want = graft.operators.Dedup
      .nearDupClusters(allDocs, "doc_id", "text", threshold = 0.8)
      .select(col("doc_id"), col("cluster_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    def assignment() = Snapshots.read(spark, clusterDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(assignment() == want,
      s"incremental assignment ${assignment()} != from-scratch $want")

    // fenced replay: corpus, index decisions, and assignment untouched
    val s1r = CorpusIngest.ingestBatch(b1, 1L, tableDir, indexDir,
      "doc_id", "text", threshold = 0.8, clusterDir = Some(clusterDir))
    assert(s1r.fenced && s1r.accepted == 0)
    assert(assignment() == want)
    assert(Snapshots.read(spark, tableDir).count() == 6)
  }

  test("cluster mode: crash between index append and table commit replays to the same assignment") {
    val s = spark
    import s.implicits._
    val tableDir = tmp(); val indexDir = tmp(); val clusterDir = tmp()
    CorpusIngest.ingestBatch(
      Seq((1L, doc("omega")), (2L, doc("sigma"))).toDF("doc_id", "text"),
      0L, tableDir, indexDir, "doc_id", "text", threshold = 0.8,
      clusterDir = Some(clusterDir))
    // batch 1's first run indexed its docs, then crashed before the
    // fenced table commit — the replay sees its own docs in the index
    val b1 = Seq(
      (3L, doc("omega") + " afterword"),  // cross-batch near dup of 1
      (4L, doc("tau"))
    ).toDF("doc_id", "text")
    graft.operators.MinHashIndex.append(spark, indexDir, b1, "doc_id", "text")
    val s1 = CorpusIngest.ingestBatch(b1, 1L, tableDir, indexDir,
      "doc_id", "text", threshold = 0.8, clusterDir = Some(clusterDir))
    assert(!s1.fenced && s1.accepted == 2, s1)
    val got = Snapshots.read(spark, clusterDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 4L)),
      s"replayed assignment diverged: $got")
    assert(Snapshots.read(spark, tableDir).count() == 4)
  }

  test("cluster mode end-to-end: a real stream labels cross-batch near-dups") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val tableDir = tmp(); val indexDir = tmp(); val clusterDir = tmp()
    val cp = tmp()
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    def run(): Unit = {
      val q = mem.toDF.toDF("doc_id", "text").writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          CorpusIngest.ingestBatch(b, id, tableDir, indexDir,
            "doc_id", "text", threshold = 0.8, clusterDir = Some(clusterDir))
          ()
        }
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    mem.addData((1L, doc("alpha")), (2L, doc("alpha") + " addendum"),
      (3L, doc("beta")))
    run()
    mem.addData((4L, doc("beta") + " afterword"), (5L, doc("gamma")))
    run()
    // everything kept; cross-run near-dups share a cluster label
    assert(Snapshots.read(spark, tableDir).count() == 5)
    val assign = Snapshots.read(spark, clusterDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(assign == Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L)),
      s"stream-driven assignment wrong: $assign")
  }

  test("medallion path: a landing table's change feed drives the ingest pipeline") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_medallion").toString
    val landing = s"$root/landing"; val ckpt = s"$root/ckpt"
    val curated = s"$root/curated"; val idx = s"$root/idx"
    val refTable = s"$root/ref_tbl"; val refIdx = s"$root/ref_idx"

    // bronze: raw docs land as snapshot commits (from any producer)
    val b0 = Seq(
      (1L, doc("alpha")),
      (2L, doc("beta")),
      (3L, doc("beta")),                       // exact dup of 2
      (4L, "too short")                        // quality reject
    ).toDF("doc_id", "text")
    val b1 = Seq(
      (5L, doc("delta")),
      (6L, doc("alpha") + " postscript")       // cross-batch near dup of 1
    ).toDF("doc_id", "text")
    Snapshots.commit(b0, landing, statsCol = Some("doc_id"))          // v0
    Snapshots.commit(b1, landing)                                     // v1

    // silver: the curated corpus = ingestBatch fed BY the change feed.
    // Exactly-once composes: the engine's offset log replays only
    // unconsumed versions, and ingestBatch's own fence absorbs any
    // overlap. Erasures propagate separately (deleteWhere + tombstone).
    val q = Snapshots.changesStream(spark, landing)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val ins = df.filter(col("__change") === "insert")
          .select("doc_id", "text")
        CorpusIngest.ingestBatch(ins, id, curated, idx,
          "doc_id", "text", threshold = 0.8)
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()

    // reference: the same two batches pushed through ingestBatch
    // directly — the feed-driven path must land the identical corpus
    CorpusIngest.ingestBatch(b0, 0L, refTable, refIdx,
      "doc_id", "text", threshold = 0.8)
    CorpusIngest.ingestBatch(b1, 1L, refTable, refIdx,
      "doc_id", "text", threshold = 0.8)
    def ids(dir: String) = Snapshots.read(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(curated) == ids(refTable),
      s"feed-driven ingest diverged: ${ids(curated)} vs ${ids(refTable)}")
    assert(ids(curated) == Seq(1L, 2L, 5L),
      s"expected gates+dedup to keep 1,2,5: ${ids(curated)}")
  }

  // ≥ 10 tokens, so the default span window sees it as shared spans
  private def boiler =
    "all rights reserved contact the central office for more information today"

  test("composed gates: feed-driven excision equals the batch spanExcise fold; the ledger records verdicts and scores") {
    val s = spark
    import s.implicits._
    val tableDir = tmp(); val indexDir = tmp()
    val spanRoot = tmp(); val ledgerDir = tmp()
    val rawCnts = Seq(("the", 10L), ("report", 5L), ("and", 8L))
      .toDF("token", "cnt")
    val tgtCnts = Seq(("the", 6L), ("stable", 9L), ("season", 4L))
      .toDF("token", "cnt")
    val refCnts = Seq(("the", 12L), ("report", 3L)).toDF("token", "cnt")
    def ingest(b: org.apache.spark.sql.DataFrame, id: Long) =
      CorpusIngest.ingestBatch(b, id, tableDir, indexDir,
        "doc_id", "text", threshold = 0.8,
        spanRoot = Some(spanRoot), ledgerDir = Some(ledgerDir),
        dsirCounts = Some((rawCnts, tgtCnts)),
        perplexityCounts = Some(refCnts))
    val b0 = Seq(
      (1L, doc("alpha") + " " + boiler),
      (2L, doc("beta") + " " + boiler)
    ).toDF("doc_id", "text")
    val b1 = Seq(
      (3L, doc("gamma") + " " + boiler),
      (4L, doc("delta")),
      (5L, "too short"),                       // quality reject
      // raw copy of accepted doc 1 + a unique tail: excision absorbs
      // the duplication, the tail survives
      (6L, doc("alpha") + " " + boiler +
        " a unique trailing sentence appended here for margin")
    ).toDF("doc_id", "text")
    val s0 = ingest(b0, 0L)
    assert(!s0.fenced && s0.accepted == 2, s0)
    val s1 = ingest(b1, 1L)
    assert(s1.failedQuality == 1 && s1.accepted == 3, s1)

    // THE fold claim: batches in (doc, pos) order ⇒ the committed
    // (excised) texts equal ONE batch spanExcise over the raw
    // accepted corpus
    val rawAccepted = b0.unionByName(b1.filter(col("doc_id") =!= 5L))
    val want = graft.operators.Corpus
      .spanExcise(rawAccepted, "doc_id", "text", k = 10)
      .select(col("doc_id"), col("clean_text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Snapshots.read(spark, tableDir)
      .select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want,
      s"feed-driven corpus diverged from the batch fold:\n$got\nvs\n$want")

    // the ledger: one row per ARRIVING doc, verdicts + gate scores
    val led = Snapshots.read(spark, ledgerDir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getDouble(3))).toMap
    assert(led.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(led(5L)._1 == "quality")
    assert(Seq(1L, 2L, 3L, 4L, 6L).forall(led(_)._1 == "accepted"), led)
    // novelty: fresh text scores 1.0; the re-crawled copy is flagged
    // BEFORE excision absorbs it — the measure-first gate at work
    assert(led(4L)._2 == 1.0, s"fresh doc must be fully novel: $led")
    assert(led(6L)._2 < 0.5, s"re-crawl must score low novelty: $led")
    // DSIR + perplexity scores recorded for every doc
    val full = Snapshots.read(spark, ledgerDir)
    assert(full.filter(col("dsir_logw").isNull).count() == 0)
    assert(full.filter(col("ref_nll").isNull).count() == 0)

    // fenced replay: nothing moves anywhere
    val s1r = ingest(b1, 1L)
    assert(s1r.fenced)
    assert(Snapshots.read(spark, ledgerDir).count() == 6)
    assert(Snapshots.read(spark, tableDir).count() == 5)
  }

  test("composed gates: crash windows on either side of the table fence replay to the identical state") {
    val s = spark
    import s.implicits._
    import graft.sources.IncrementalViews
    val tableDir = tmp(); val indexDir = tmp()
    val spanRoot = tmp(); val ledgerDir = tmp()
    def ingest(b: org.apache.spark.sql.DataFrame, id: Long) =
      CorpusIngest.ingestBatch(b, id, tableDir, indexDir,
        "doc_id", "text", threshold = 0.8,
        spanRoot = Some(spanRoot), ledgerDir = Some(ledgerDir))
    val b0 = Seq((1L, doc("alpha") + " " + boiler)).toDF("doc_id", "text")
    ingest(b0, 0L)

    // LEFT of the fence: a crashed run already committed the LEDGER
    // and appended the index, then died before the table commit. The
    // replay must re-derive the same accept set and land it once.
    val b1 = Seq((2L, doc("beta") + " " + boiler)).toDF("doc_id", "text")
    graft.operators.MinHashIndex.append(spark, indexDir,
      b1, "doc_id", "text")
    Snapshots.commitStreamBatch(
      b1.select(col("doc_id"), lit(1L).as("batch_id"),
        lit("accepted").as("verdict"),
        lit(1.0).as("novelty_ratio")), ledgerDir, 1L)
    val s1 = ingest(b1, 1L)
    assert(!s1.fenced && s1.accepted == 1, s1)
    // doc 2's boiler suffix was excised against doc 1's profile
    val t2 = Snapshots.read(spark, tableDir)
      .filter(col("doc_id") === 2L).head().getString(1)
    assert(!t2.contains("central office"),
      s"replay must still excise the corpus-held spans: $t2")
    assert(Snapshots.read(spark, ledgerDir).count() == 2,
      "the crashed run's ledger commit must fence the replay's")

    // RIGHT of the fence: the table commit landed but the crash hit
    // before the profile advance. The fenced replay must catch the
    // profile up — and re-derive the identical accept set to do it.
    val b2 = Seq((3L, doc("gamma") + " " + boiler)).toDF("doc_id", "text")
    val excised = IncrementalViews.spanExciseIngest(spark, b2,
        s"$spanRoot/views", "doc_id", "text", k = 10)
      .select(col("doc_id"), col("clean_text").as("text"))
    Snapshots.commitStreamBatch(excised, tableDir, 2L,
      bloomCols = Seq("doc_id"))
    assert(Snapshots.lastCommittedBatch(spark, s"$spanRoot/src") < 2L)
    val s2 = ingest(b2, 2L)
    assert(s2.fenced, "the table fence must hold on the catch-up replay")
    assert(Snapshots.lastCommittedBatch(spark, s"$spanRoot/src") == 2L,
      "the catch-up must commit the accepted raws to the profile source")
    // and the profile now VETOES batch 2's text for later arrivals:
    // a batch-3 copy of doc 3's raw text is excised to (near) nothing
    val b3 = Seq((4L, doc("gamma") + " " + boiler)).toDF("doc_id", "text")
    val cleaned = IncrementalViews.spanExciseIngest(spark, b3,
      s"$spanRoot/views", "doc_id", "text", k = 10)
      .select("clean_text").head().getString(0)
    assert(!cleaned.contains("gamma1"),
      s"the caught-up profile must veto batch 2's spans: $cleaned")
  }

  test("cluster mode composes with the ingest gates: excision + ledger + assignment together, replay fenced") {
    val s = spark
    import s.implicits._
    val tableDir = tmp(); val indexDir = tmp(); val clusterDir = tmp()
    val spanRoot = tmp(); val ledgerDir = tmp()
    def ingest(b: org.apache.spark.sql.DataFrame, id: Long) =
      CorpusIngest.ingestBatch(b, id, tableDir, indexDir,
        "doc_id", "text", threshold = 0.8,
        clusterDir = Some(clusterDir), spanRoot = Some(spanRoot),
        ledgerDir = Some(ledgerDir))
    val b0 = Seq(
      (1L, doc("alpha")),
      (2L, doc("beta") + " " + boiler)
    ).toDF("doc_id", "text")
    val s0 = ingest(b0, 0L)
    assert(!s0.fenced && s0.accepted == 2, s0)
    val b1 = Seq(
      (3L, doc("alpha") + " addendum"), // near-dup of 1 — KEPT + labeled
      (4L, "too short"),                // quality reject
      (5L, doc("gamma") + " " + boiler) // boiler excised vs the profile
    ).toDF("doc_id", "text")
    val s1 = ingest(b1, 1L)
    assert(s1.failedQuality == 1 && s1.accepted == 2 &&
      s1.dupInBatch == 0 && s1.dupVsCorpus == 0, s1)
    // excision composed: doc 5's corpus-held boiler span is cut
    val t5 = Snapshots.read(spark, tableDir)
      .filter(col("doc_id") === 5L).head().getString(1)
    assert(!t5.contains("central office"),
      s"cluster mode must still excise corpus-held spans: $t5")
    // the near-dup was KEPT (cluster mode) and labeled with its twin
    val asg = Snapshots.read(spark, clusterDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg.contains(3L) &&
      Snapshots.read(spark, tableDir)
        .filter(col("doc_id") === 3L).count() == 1,
      "cluster mode dropped a near-dup it should have labeled")
    assert(asg(3L) == asg(1L), s"near-dup must share its twin's cluster: $asg")
    assert(asg(1L) != asg(2L), s"distinct docs must not co-cluster: $asg")
    // the ledger composed: quality/accepted verdicts only, novelty
    // recorded (doc 5's boiler tail reads partially non-novel)
    val led = Snapshots.read(spark, ledgerDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getDouble(3)))).toMap
    assert(led.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(led(4L)._1 == "quality" &&
      Seq(1L, 2L, 3L, 5L).forall(led(_)._1 == "accepted"), led)
    assert(led(5L)._2 < 1.0, s"doc 5's re-crawled boiler must dent novelty: $led")
    // crash replay is fenced everywhere: table, ledger, assignment
    val s1r = ingest(b1, 1L)
    assert(s1r.fenced)
    assert(Snapshots.read(spark, tableDir).count() == 4)
    assert(Snapshots.read(spark, ledgerDir).count() == 5)
    assert(Snapshots.read(spark, clusterDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == asg)
  }

  test("enabling spanRoot mid-stream fails by name until bootstrapSpanProfile seeds the profile") {
    val s = spark
    import s.implicits._
    val tableDir = tmp(); val indexDir = tmp(); val spanRoot = tmp()
    // batch 0 commits WITHOUT spanRoot — the standing corpus the
    // profile has never seen
    CorpusIngest.ingestBatch(
      Seq((1L, doc("alpha") + " " + boiler)).toDF("doc_id", "text"),
      0L, tableDir, indexDir, "doc_id", "text")
    val b1 = Seq((2L, doc("beta") + " " + boiler)).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      CorpusIngest.ingestBatch(b1, 1L, tableDir, indexDir,
        "doc_id", "text", spanRoot = Some(spanRoot))
    }
    assert(e.getMessage.contains("bootstrapSpanProfile"),
      s"mid-stream spanRoot must demand the bootstrap by name: ${e.getMessage}")
    // the documented recovery: seed the profile from the whole table
    CorpusIngest.bootstrapSpanProfile(spark, tableDir, spanRoot,
      "doc_id", "text")
    val s1 = CorpusIngest.ingestBatch(b1, 1L, tableDir, indexDir,
      "doc_id", "text", spanRoot = Some(spanRoot))
    assert(s1.accepted == 1, s1)
    // and the bootstrapped profile vetoes the OLD corpus's spans
    val t2 = Snapshots.read(spark, tableDir)
      .filter(col("doc_id") === 2L).head().getString(1)
    assert(!t2.contains("central office"),
      s"post-bootstrap ingest must excise the standing corpus's spans: $t2")
    // a fresh pipeline needs no bootstrap — it refuses by name
    val e2 = intercept[IllegalArgumentException] {
      CorpusIngest.bootstrapSpanProfile(spark, tmp(), tmp(),
        "doc_id", "text")
    }
    assert(e2.getMessage.contains("no committed table"))
  }

  test("re-admission: a relaxed policy re-scores the quarantine and the corpus equals relaxed-from-start") {
    val s = spark
    import s.implicits._
    val strictT = tmp(); val strictI = tmp(); val strictL = tmp()
    val relaxT = tmp(); val relaxI = tmp(); val relaxL = tmp()
    val brief = "the quick report and it was stable for the season"
    val b0 = Seq(
      (1L, doc("alpha")),   // 66 tokens — passes both thresholds
      (2L, brief),          // 10 tokens — quarantined at minTokens=60
      (3L, doc("beta"))
    ).toDF("doc_id", "text")
    // STRICT pipeline quarantines doc 2 with a ledgered verdict
    val s0 = CorpusIngest.ingestBatch(b0, 0L, strictT, strictI,
      "doc_id", "text", minTokens = 60, ledgerDir = Some(strictL))
    assert(s0.failedQuality == 1 && s0.accepted == 2, s0)
    // policy relaxes → re-admit the quality quarantine from the raw
    // (bronze) archive through the NORMAL pipeline at the new gate
    val st = CorpusIngest.readmitQuarantined(b0, 1L, strictT, strictI,
      strictL, "doc_id", "text",
      policy = col("verdict") === "quality", minTokens = 5)
    assert(st.arrived == 1 && st.accepted == 1, st)
    // corpus == ingesting with the relaxed threshold from the start
    CorpusIngest.ingestBatch(b0, 0L, relaxT, relaxI,
      "doc_id", "text", minTokens = 5, ledgerDir = Some(relaxL))
    def corpus(dir: String) = Snapshots.read(spark, dir)
      .select("doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(corpus(strictT) == corpus(relaxT),
      "re-admitted corpus diverged from relaxed-from-start")
    // the ledger's LATEST row per doc now reads accepted for all three
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("batch_id").desc)
    val standing = Snapshots.read(spark, strictL)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(standing == Map(1L -> "accepted", 2L -> "accepted",
      3L -> "accepted"), standing)
    // replaying the re-admission batch is fenced; nothing moves
    val st2 = CorpusIngest.readmitQuarantined(b0, 1L, strictT, strictI,
      strictL, "doc_id", "text",
      policy = col("verdict") === "quality", minTokens = 5)
    assert(st2.fenced)
    assert(Snapshots.read(spark, strictT).count() == 3)
    // an already-accepted doc is never re-fed even under an
    // everything-matches policy
    val st3 = CorpusIngest.readmitQuarantined(b0, 2L, strictT, strictI,
      strictL, "doc_id", "text", policy = lit(true), minTokens = 5)
    assert(st3.arrived == 0 && st3.accepted == 0, st3)
  }

  test("duplicate index append (crash window) changes no dedup decision") {
    val s = spark
    import s.implicits._
    val tableDir = tmp(); val indexDir = tmp()
    val b0 = Seq((1L, doc("omega"))).toDF("doc_id", "text")
    CorpusIngest.ingestBatch(b0, 0L, tableDir, indexDir, "doc_id", "text")
    // simulate the crash-window replay artifact: the same accepted
    // batch appended to the index AGAIN
    graft.operators.MinHashIndex.append(spark, indexDir, b0, "doc_id", "text")
    val b1 = Seq(
      (2L, doc("omega") + " afterword"),  // near dup of 1 (twice indexed)
      (3L, doc("sigma"))
    ).toDF("doc_id", "text")
    val s1 = CorpusIngest.ingestBatch(b1, 1L, tableDir, indexDir,
      "doc_id", "text", threshold = 0.8)
    assert(s1.dupVsCorpus == 1 && s1.accepted == 1, s1)
    assert(Snapshots.read(spark, tableDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }
}
