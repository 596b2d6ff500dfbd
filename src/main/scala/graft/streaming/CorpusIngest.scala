package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup, MinHashIndex}
import graft.sources.Snapshots

/** The deployable incremental training-corpus ingest pipeline — the
  * composition the individual operators exist for. Per micro-batch
  * (`foreachBatch` body, batch driven by Structured Streaming):
  *
  *  1. quality gate ([[Corpus.qualityFilter]]: token band, repetition,
  *     top-token, stopword, language);
  *  2. within-batch exact dedup (smallest id survives per normalized
  *     text);
  *  3. within-batch near-dedup (MinHash-LSH pairs; the larger id of
  *     each verified pair drops — conservative on chains);
  *  4. cross-corpus near-dedup against the DURABLE MinHash index of
  *     everything accepted so far ([[MinHashIndex.query]] — reads the
  *     index, not the historical documents);
  *  5. survivors append to the index and commit to a snapshot table
  *     exactly-once ([[Snapshots.commitStreamBatch]]'s batch fence).
  *
  * Crash safety: the table commit is the fenced operation, and the
  * index appends BEFORE it. A crash between the two replays the batch
  * against an index that ALREADY CONTAINS it — safe on both axes:
  * duplicate index rows change no decision (dedup decisions are
  * EXISTS-style left_antis on the pair list), and a replayed doc does
  * not match ITSELF in the index ([[MinHashIndex.query]] drops
  * id_a == id_b self-pairs), so the replay re-derives the original
  * accept set and the fenced table commit lands it exactly once. The
  * reverse order would lose index entries on replay: missed near-dups
  * forever after.
  *
  * Scale: each stage is the already-audited operator plan (one
  * hash-agg for the gates and exact dedup, banded candidate join for
  * near-dup, index-pruned cross query); nothing here adds a shuffle
  * or a driver loop beyond the stats counts the caller asked for. */
object CorpusIngest {

  case class IngestStats(
      batchId: Long, arrived: Long, failedQuality: Long,
      dupInBatch: Long, dupVsCorpus: Long, accepted: Long, fenced: Boolean)

  /** Process one micro-batch; returns what happened to every arriving
    * document. Idempotent per `batchId`: a replayed batch is fenced
    * by the snapshot table and touches nothing.
    *
    * `clusterDir = Some(dir)` switches the pipeline to CLUSTER mode:
    * nothing past the quality gate is dropped — duplication becomes
    * LABELS instead of deletions. The edges the dedup stages already
    * compute (within-batch LSH pairs + cross-corpus index hits) feed
    * [[Dedup.incrementalClusters]], whose durable `(id, cluster_id)`
    * assignment table is committed as part of the same batch, BEFORE
    * the fenced table commit — so a crash anywhere in the window
    * replays into the identical assignment (edge derivation is
    * deterministic, the assignment upsert idempotent) and a fenced
    * replay touches nothing. Downstream consumers choose their own
    * policy (keep representatives, sample per cluster, weight by
    * cluster size) instead of inheriting an irreversible drop. In
    * this mode `dupInBatch`/`dupVsCorpus` report 0 — the assignment
    * table carries the duplication structure. */
  def ingestBatch(
      batch: DataFrame,
      batchId: Long,
      tableDir: String,
      indexDir: String,
      idCol: String,
      textCol: String,
      threshold: Double = 0.9,
      minTokens: Int = 5,
      langs: Seq[String] = Seq("en"),
      clusterDir: Option[String] = None): IngestStats = {
    val spark = batch.sparkSession
    val arrived = batch.count()
    if (Snapshots.lastCommittedBatch(spark, tableDir) >= batchId)
      return IngestStats(batchId, arrived, 0, 0, 0, 0, fenced = true)

    // Each stage below is persisted before its count: the stats plus
    // the index/table writes would otherwise re-evaluate the whole
    // gate→exact→near→cross lineage per action — the MinHash
    // signature stage alone ran 4+ times per micro-batch before this.
    // MEMORY_AND_DISK: a micro-batch fits executor memory by
    // construction (it was sized by the trigger), disk is the safety
    // valve. Unpersisted in the finally so a failed batch leaks
    // nothing into the next.
    val cached = scala.collection.mutable.ListBuffer[DataFrame]()
    def cache(df: DataFrame): DataFrame = { cached += df.persist(); df }
    try {
      // 1. quality gate
      val verdicts = Corpus.qualityFilter(batch, idCol, textCol,
        minTokens = minTokens, langs = langs)
      val passed = cache(batch.join(
        verdicts.filter(col("keep")).select(idCol), Seq(idCol), "left_semi"))
      val nPassed = passed.count()

      val indexExistsNow = {
        val f = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(indexDir), spark.sparkContext.hadoopConfiguration)
        // the meta file is the index's identity — the band directory
        // NAME changes across compaction generations
        f.exists(new org.apache.hadoop.fs.Path(
          s"$indexDir/_graft_minhash_meta.json"))
      }

      clusterDir match {
        case Some(cd) =>
          // CLUSTER mode: label, don't drop. Edges = within-batch LSH
          // edge list (rep pairs + exact-dup stars — the same edge set
          // nearDupClusters uses) ∪ cross-corpus index hits, queried
          // BEFORE this batch is appended (a replayed batch already in
          // the index yields the in-batch pairs again as cross pairs —
          // same union, same clusters).
          val inBatch = Dedup.minHashLshEdges(passed, idCol, textCol,
            threshold = threshold).select("id_a", "id_b")
          val edges = cache(
            if (!indexExistsNow) inBatch
            else inBatch.unionByName(
              MinHashIndex.query(spark, indexDir, passed, idCol, textCol,
                threshold).select("id_a", "id_b")))
          if (nPassed > 0) {
            if (indexExistsNow)
              MinHashIndex.append(spark, indexDir, passed, idCol, textCol)
            else MinHashIndex.build(spark, indexDir, passed, idCol, textCol)
            // assignment table BEFORE the fenced commit: once the fence
            // is up, a replay must find the clusters already durable
            Dedup.incrementalClusters(spark, cd, passed, edges, idCol)
            Snapshots.commitStreamBatch(passed, tableDir, batchId,
              bloomCols = Seq(idCol))
          }
          return IngestStats(batchId, arrived,
            failedQuality = arrived - nPassed,
            dupInBatch = 0, dupVsCorpus = 0,
            accepted = nPassed, fenced = false)
        case None => () // drop mode continues below
      }

      // 2. within-batch exact dedup: one survivor per normalized text
      val exactReps = Dedup.exact(passed, idCol, textCol)
        .select(col("rep_id").as(idCol))
      val exactKept = passed.join(exactReps, Seq(idCol), "left_semi")

      // 3. within-batch near-dedup: larger id of each verified pair drops
      val inBatchPairs = Dedup.minHashLsh(exactKept, idCol, textCol,
        threshold = threshold)
      val nearKept = cache(exactKept.join(
        inBatchPairs.select(col("id_b").as(idCol)).distinct(),
        Seq(idCol), "left_anti"))
      val nNearKept = nearKept.count()

      // 4. cross-corpus near-dedup against the durable index (replay-
      // safe: a doc already indexed by a crashed previous run does not
      // match itself — MinHashIndex.query drops self-pairs)
      val indexExists = indexExistsNow
      val accepted =
        if (!indexExists) nearKept // already cached above
        else cache(nearKept.join(
          MinHashIndex.query(spark, indexDir, nearKept, idCol, textCol, threshold)
            .select(col("id_a").as(idCol)).distinct(),
          Seq(idCol), "left_anti"))
      val nAccepted = accepted.count()

      // 5. index first (duplicate-append-safe), fenced table commit
      // second; an all-dropped batch commits nothing (replaying it
      // re-derives the same empty decision — still idempotent)
      if (nAccepted > 0) {
        if (indexExists) MinHashIndex.append(spark, indexDir, accepted, idCol, textCol)
        else MinHashIndex.build(spark, indexDir, accepted, idCol, textCol)
        // the corpus table carries per-file id blooms: "fetch document
        // N" against the accumulated corpus opens only the files whose
        // filters fire (Snapshots.readPoint), not every batch's output
        Snapshots.commitStreamBatch(accepted, tableDir, batchId,
          bloomCols = Seq(idCol))
      }

      IngestStats(batchId, arrived,
        failedQuality = arrived - nPassed,
        dupInBatch = nPassed - nNearKept,
        dupVsCorpus = nNearKept - nAccepted,
        accepted = nAccepted,
        fenced = false)
    } finally cached.foreach(_.unpersist(blocking = false))
  }
}
