package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable, incrementally-maintained MinHash-LSH index — the
  * materialized corpus side of [[Dedup.minHashLshAgainst]].
  *
  * An incremental dedup service ingests batch after batch and asks
  * "does this batch duplicate anything accepted so far". Re-banding
  * the whole corpus per batch is O(corpus) work per batch; this index
  * persists the banded form once and APPENDS each accepted batch, so
  * batch-N dedup reads the index (O(batch + matching buckets)) instead
  * of recomputing signatures for 100 TB of history.
  *
  * Layout under `dir`:
  *  - `bands/`  (__bh, __id) partitioned by `__band` — the LSH keys.
  *    Hive-partitioned by band so (a) appends only add files, never
  *    rewrite, and (b) any band-scoped read (re-verification, bucket
  *    statistics, partial probes) partition-prunes to 1/bands of the
  *    data — asserted in the spec.
  *  - `sets/`   (__id, __sh, __sz) — sorted token-hash sets for exact
  *    verification joins.
  *  - `_graft_minhash_meta.json` — numHashes/bands; appends and
  *    queries validate against it, because mixing banding parameters
  *    silently produces disjoint key spaces (zero recall). Also the
  *    storage-generation pointer [[compact]] flips after rewriting
  *    the index into merged, tombstone-applied `bands-g<n>`/
  *    `sets-g<n>` directories — append-only growth stays bounded.
  *
  * Contract: document ids must be unique across all appended batches
  * (duplicate ids would duplicate verification rows, same as unioning
  * a corpus with itself).
  */
object MinHashIndex {

  /** `gen` is the storage GENERATION: [[compact]] rewrites the index
    * into fresh `bands-g<n>`/`sets-g<n>` directories and flips this
    * pointer, so readers never observe a half-rewritten layout (the
    * same publish-then-point idea as [[graft.sources.Snapshots]],
    * one level simpler). Generation 0 keeps the original
    * `bands`/`sets` names. */
  case class Meta(numHashes: Int, bands: Int, gen: Int = 0)

  private def metaPath(dir: String) = s"$dir/_graft_minhash_meta.json"

  private[graft] def bandsPath(dir: String, meta: Meta): String =
    if (meta.gen == 0) s"$dir/bands" else s"$dir/bands-g${meta.gen}"
  private[graft] def setsPath(dir: String, meta: Meta): String =
    if (meta.gen == 0) s"$dir/sets" else s"$dir/sets-g${meta.gen}"

  private def fs(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def writeMeta(spark: SparkSession, dir: String, meta: Meta): Unit = {
    val out = fs(spark, dir).create(
      new org.apache.hadoop.fs.Path(metaPath(dir)), true)
    try out.write(
      s"""{"numHashes":${meta.numHashes},"bands":${meta.bands},"gen":${meta.gen}}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  def readMeta(spark: SparkSession, dir: String): Meta = {
    val in = fs(spark, dir).open(new org.apache.hadoop.fs.Path(metaPath(dir)))
    val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    def fieldOpt(name: String): Option[Int] =
      s""""$name":(\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toInt)
    def field(name: String): Int = fieldOpt(name)
      .getOrElse(sys.error(s"corrupt index meta at ${metaPath(dir)}: $s"))
    // gen is optional: metas written before compaction existed are gen 0
    Meta(field("numHashes"), field("bands"), fieldOpt("gen").getOrElse(0))
  }

  private def writeBatch(
      dir: String, batch: DataFrame, idCol: String, textCol: String,
      meta: Meta, mode: String): Unit = {
    val hashed = Dedup.shingleSets(batch, idCol, textCol)
    Dedup.bandedSignatures(hashed, meta.numHashes, meta.bands)
      .write.mode(mode).partitionBy("__band").parquet(bandsPath(dir, meta))
    hashed.select(col("__id"), col("__sh"), size(col("__sh")).as("__sz"))
      .write.mode(mode).parquet(setsPath(dir, meta))
  }

  /** Create (or replace) the index from an initial corpus. A rebuild
    * resets to generation 0 and clears any prior generations and
    * tombstones (not crash-atomic — this is the create path, not a
    * maintenance op). */
  def build(
      spark: SparkSession,
      dir: String,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 128,
      bands: Int = 16): Unit = {
    val meta = Meta(numHashes, bands)
    val f = fs(spark, dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    if (f.exists(root))
      f.listStatus(root).map(_.getPath)
        .filter(p => p.getName.startsWith("bands-g") ||
          p.getName.startsWith("sets-g") || p.getName == "tombstones")
        .foreach(f.delete(_, true))
    IndexMaintenance.clearState(spark, dir) // ledgers + a stale lock
    writeBatch(dir, corpus, idCol, textCol, meta, "overwrite")
    writeMeta(spark, dir, meta)
  }

  /** Append an accepted batch — banding parameters come from the
    * stored meta, existing files are never rewritten. Takes the
    * index's single-writer lock: an append racing [[compact]] would
    * otherwise land in the generation the compaction is about to
    * retire and silently vanish from the index. */
  def append(
      spark: SparkSession,
      dir: String,
      batch: DataFrame,
      idCol: String,
      textCol: String): Unit =
    IndexMaintenance.withWriterLock(spark, dir, "MinHashIndex.append") {
      writeBatch(dir, batch, idCol, textCol, readMeta(spark, dir), "append")
    }

  /** Logically delete documents from the index: their ids append to a
    * tombstone set and [[query]] stops matching them. The banded files
    * are never rewritten (append-only layout stays append-only); the
    * exclusion is one anti-join on the candidate list, O(candidates).
    * Pair this with [[graft.sources.Snapshots.deleteWhere]] on the
    * corpus table — a doc erased from the corpus must also stop
    * vetoing future near-duplicates of itself, or a right-to-erasure
    * delete would silently keep suppressing content forever.
    * Duplicate tombstones are harmless (set semantics via anti-join). */
  def tombstone(spark: SparkSession, dir: String,
                ids: DataFrame, idCol: String): Unit =
    ids.select(col(idCol).as("__id")).distinct()
      .write.mode("append").parquet(s"$dir/tombstones")

  private def liveCandidates(spark: SparkSession, dir: String,
                             candidates: DataFrame): DataFrame = {
    val t = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val f = fs(spark, dir)
    // skip tombstone files a past compact already APPLIED (recorded
    // retired, awaiting vacuum): anti-joining them again would hide a
    // doc legitimately re-appended after its delete
    val retired = IndexMaintenance.retiredPaths(spark, dir)
    val live =
      if (!f.exists(t)) Array.empty[String]
      else f.listStatus(t).map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet") &&
          !retired.contains(p.toString))
        .map(_.toString)
    if (live.isEmpty) candidates
    else candidates.join(
      spark.read.parquet(live.toIndexedSeq: _*)
        .select(col("__id").as("id_b")),
      Seq("id_b"), "left_anti")
  }

  /** Cross-corpus near-dup query against the stored index: band the
    * NEW batch only, join its keys against `bands/`, verify surviving
    * pairs against `sets/`. Result rows and semantics are identical to
    * `Dedup.minHashLshAgainst(dfNew, <all appended batches>, ...)` —
    * proven by the spec — without touching the corpus documents.
    *
    * Self-pairs (a query doc whose own id is already IN the index) are
    * excluded: they self-match at jaccard 1.0 and carry no near-dup
    * information. This is load-bearing for replay idempotency — a
    * crash between an index append and the fenced table commit replays
    * the batch against an index that already contains it, and without
    * the exclusion every replayed doc would drop as a "corpus dup",
    * permanently losing the batch ([[graft.streaming.CorpusIngest]]). */
  def query(
      spark: SparkSession,
      dir: String,
      dfNew: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.9): DataFrame = {
    val meta = readMeta(spark, dir)
    val hNew = Dedup.shingleSets(dfNew, idCol, textCol)
    val candidates = Dedup.bandedSignatures(hNew, meta.numHashes, meta.bands)
      .select(col("__band"), col("__bh"), col("__id").as("id_a"))
      .join(spark.read.parquet(bandsPath(dir, meta))
          .select(col("__band"), col("__bh"), col("__id").as("id_b")),
        Seq("__band", "__bh"))
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    val live = liveCandidates(spark, dir, candidates)
    val vCorpus = spark.read.parquet(setsPath(dir, meta))
      .select(col("__id").as("id_b"), col("__sh").as("sh_b"), col("__sz").as("sz_b"))
    Dedup.verifyCrossPairs(live, hNew, vCorpus, threshold)
  }

  /** Band-scoped scan — the read shape whose partition pruning the
    * layout exists for (and the spec asserts). */
  def bandScan(spark: SparkSession, dir: String, band: Int): DataFrame =
    spark.read.parquet(bandsPath(dir, readMeta(spark, dir)))
      .filter(col("__band") === band)

  /** Compact the index into the next storage generation: merge the
    * per-append band files (an append-only stream writes one file per
    * band per batch — 10k batches is 160k files at bands=16; after
    * compaction each band holds ~one) and apply tombstones PHYSICALLY
    * (dead rows leave `bands`/`sets`, and the applied tombstone files
    * are dropped, re-bounding [[query]]'s anti-join at zero cost).
    *
    * Crash-safe the snapshot way: the new generation is fully written
    * to fresh `bands-g<n+1>`/`sets-g<n+1>` directories BEFORE the meta
    * pointer flips, so readers see the old generation until the flip
    * and the new one after; a crash mid-compaction leaves orphan
    * next-gen directories that the retry overwrites. Tombstones
    * appended WHILE compaction runs survive (only the files listed at
    * start are retired). Writers are serialized by the index lock
    * (see [[IndexMaintenance]]); a concurrent [[append]] fails loudly
    * instead of losing its batch into the doomed generation.
    *
    * The OLD generation is NOT deleted here: a query that resolved
    * the old meta just before the flip must be able to finish its
    * scan. The flip writes a retirement ledger instead; run
    * [[vacuum]] once in-flight readers have drained to reclaim the
    * space. */
  def compact(spark: SparkSession, dir: String, setFiles: Int = 0): Unit =
    IndexMaintenance.withWriterLock(spark, dir, "MinHashIndex.compact") {
      val meta = readMeta(spark, dir)
      val next = meta.copy(gen = meta.gen + 1)
      val f = fs(spark, dir)
      val tombPath = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
      // apply (and retire) only tombstone files NOT already retired:
      // re-applying one would hide a doc re-appended after its delete
      val alreadyRetired = IndexMaintenance.retiredPaths(spark, dir)
      val tombFiles =
        if (f.exists(tombPath)) f.listStatus(tombPath).map(_.getPath)
          .filter(p => !alreadyRetired.contains(p.toString)).toSeq
        else Nil
      val tomb =
        if (tombFiles.isEmpty) None
        else Some(spark.read.parquet(tombFiles.map(_.toString): _*)
          .select("__id").distinct())
      val bandsIn = spark.read.parquet(bandsPath(dir, meta))
      val setsIn = spark.read.parquet(setsPath(dir, meta))
      val liveBands = tomb.fold(bandsIn)(t => bandsIn.join(t, Seq("__id"), "left_anti"))
      val liveSets = tomb.fold(setsIn)(t => setsIn.join(t, Seq("__id"), "left_anti"))
      // each band's rows hash to one shuffle partition → ~one file per band
      liveBands.repartition(meta.bands, col("__band"))
        .write.mode("overwrite").partitionBy("__band")
        .parquet(bandsPath(dir, next))
      val nSet =
        if (setFiles > 0) setFiles
        else math.max(1, math.ceil(liveSets.count() / 4e6).toInt)
      liveSets.repartition(nSet)
        .write.mode("overwrite").parquet(setsPath(dir, next))
      // pending-then-flip-then-promote (see Similarity.pqRetrain): a
      // crash between the flip and the ledger write can no longer
      // strand the old generation unledgered with its tombstones live
      IndexMaintenance.recordPendingRetired(spark, dir, next.gen,
        s"g${meta.gen}",
        Seq(bandsPath(dir, meta), setsPath(dir, meta)) ++
          tombFiles.map(_.toString))
      writeMeta(spark, dir, next) // the flip: readers now resolve gen n+1
      IndexMaintenance.promotePending(spark, dir, next.gen)
    }

  /** Reclaim the directories and applied tombstone files retired by
    * past [[compact]] runs — call once queries that started before the
    * generation flip have drained. Idempotent (a pending entry whose
    * flip landed but whose promote was lost to a crash is adopted
    * here first). */
  def vacuum(spark: SparkSession, dir: String): Int = {
    if (fs(spark, dir).exists(new org.apache.hadoop.fs.Path(metaPath(dir))))
      IndexMaintenance.promotePending(spark, dir, readMeta(spark, dir).gen)
    IndexMaintenance.vacuum(spark, dir)
  }
}
