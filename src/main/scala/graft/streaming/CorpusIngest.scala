package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup, MinHashIndex}
import graft.sources.{IncrementalViews, Snapshots}

/** The deployable incremental training-corpus ingest pipeline — the
  * composition the individual operators exist for. Per micro-batch
  * (`foreachBatch` body, batch driven by Structured Streaming):
  *
  *  1. quality gate ([[Corpus.qualityFilter]]: token band, repetition,
  *     top-token, stopword, language);
  *  2. (opt-in, `spanRoot`) feed-driven SPAN EXCISION against the
  *     maintained span profile ([[IncrementalViews.spanExciseIngest]]:
  *     a span the corpus already holds is always cut, spans new to
  *     the corpus resolve keep-first within the batch);
  *  3. within-batch exact dedup (smallest id survives per normalized
  *     text — of the text actually being committed, i.e. post-excision
  *     when step 2 is on);
  *  4. within-batch near-dedup (MinHash-LSH pairs; the larger id of
  *     each verified pair drops — conservative on chains);
  *  5. cross-corpus near-dedup against the DURABLE MinHash index of
  *     everything accepted so far ([[MinHashIndex.query]] — reads the
  *     index, not the historical documents);
  *  6. (opt-in, `ledgerDir`) one ACCEPT/QUARANTINE LEDGER row per
  *     arriving doc — its pipeline verdict (`quality` / `dup_in_batch`
  *     / `dup_vs_corpus` / `accepted`) plus the recorded measure-first
  *     gate scores: span novelty vs the maintained profile
  *     ([[IncrementalViews.spanNoveltyIngest]], with `spanRoot`), DSIR
  *     log-importance vs maintained raw counts + a pinned target
  *     ([[Corpus.dsirScoreAgainst]], with `dsirCounts`), and reference
  *     perplexity ([[Corpus.perplexityScoreAgainst]], with
  *     `perplexityCounts`) — committed batch-fenced BEFORE the table;
  *  7. survivors append to the index and commit to a snapshot table
  *     exactly-once ([[Snapshots.commitStreamBatch]]'s batch fence);
  *  8. (with `spanRoot`) the accepted docs' RAW text commits
  *     batch-fenced to the profile's own source table and
  *     [[IncrementalViews.refreshSpanProfile]] folds it, so the NEXT
  *     batch excises against a profile that includes this one. The
  *     profile stays the RAW corpus's — excised text would stop
  *     vetoing its own duplicates — and when batches arrive in
  *     (doc, pos) order, folding each batch's committed text equals
  *     one batch [[Corpus.spanExcise]] over the raw accepted corpus
  *     (the [[Corpus.spanExciseAgainst]] oracle claim).
  *
  * Crash safety: the table commit is the fenced operation; the index
  * appends and the ledger commit land BEFORE it, the profile commit
  * AFTER it. A crash anywhere left of the fence replays the batch
  * against the identical pre-batch profile/index state (duplicate
  * index rows change no decision, a replayed doc does not match
  * itself, the ledger carries its own batch fence) — so the replay
  * re-derives the original accept set bit-for-bit and the fenced
  * table commit lands it exactly once. A crash RIGHT of the fence
  * (between table commit and profile commit/refresh) is caught up on
  * replay: the fenced path re-derives the accept set from the still-
  * pre-batch profile, commits the raw survivors to the profile source
  * under the same batch fence, and folds the refresh — the excision
  * authority never silently misses a committed batch.
  *
  * Scale: each stage is the already-audited operator plan (one
  * hash-agg for the gates and exact dedup, banded candidate join for
  * near-dup, index-pruned cross query, O(batch spans) profile joins
  * for excision/novelty, O(batch tokens + vocab) for the LM gates);
  * nothing here adds a shuffle or a driver loop beyond the stats
  * counts the caller asked for. */
object CorpusIngest {

  case class IngestStats(
      batchId: Long, arrived: Long, failedQuality: Long,
      dupInBatch: Long, dupVsCorpus: Long, accepted: Long, fenced: Boolean)

  /** Process one micro-batch; returns what happened to every arriving
    * document. Idempotent per `batchId`: a replayed batch is fenced
    * by the snapshot table and touches nothing (except the documented
    * profile catch-up, itself fenced).
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
    * table carries the duplication structure.
    *
    * `spanRoot = Some(root)` turns on ingest-time span excision (and,
    * with `ledgerDir`, novelty scoring): the maintained span profile
    * lives at `root/views`, its raw source table at `root/src`, both
    * owned by this pipeline. `dsirCounts = Some((rawCounts,
    * targetCounts))` and `perplexityCounts = Some(refCounts)` are
    * `(token, cnt)` frames — typically maintained word-frequency
    * views — recorded per doc in the ledger; they gate nothing here
    * (measure-first: thresholds are a policy the operator applies
    * downstream ON the ledger). Gate options compose with drop mode
    * only — cluster mode keeps duplication as labels. */
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
      clusterDir: Option[String] = None,
      spanRoot: Option[String] = None,
      spanK: Int = 10,
      ledgerDir: Option[String] = None,
      dsirCounts: Option[(DataFrame, DataFrame)] = None,
      perplexityCounts: Option[DataFrame] = None): IngestStats = {
    require(clusterDir.isEmpty || (spanRoot.isEmpty && ledgerDir.isEmpty
        && dsirCounts.isEmpty && perplexityCounts.isEmpty),
      "cluster mode keeps duplication as labels — the ingest-time " +
        "gates (spanRoot/ledgerDir/dsirCounts/perplexityCounts) " +
        "compose with drop mode")
    val spark = batch.sparkSession
    val arrived = batch.count()
    val tableFenced =
      Snapshots.lastCommittedBatch(spark, tableDir) >= batchId
    def profileSrc(root: String) = s"$root/src"
    def profileViews(root: String) = s"$root/views"
    val profileBehind = spanRoot.exists(root =>
      Snapshots.lastCommittedBatch(spark, profileSrc(root)) < batchId)
    if (tableFenced && !profileBehind) {
      // a crash between the profile-source commit and its view refresh
      // leaves pending feed — the refresh is incremental + idempotent,
      // so folding here completes the interrupted right-of-fence work
      spanRoot.foreach(root => IncrementalViews.refreshSpanProfile(
        spark, profileSrc(root), profileViews(root), idCol, textCol,
        k = spanK))
      return IngestStats(batchId, arrived, 0, 0, 0, 0, fenced = true)
    }

    // Each stage below is persisted before its count: the stats plus
    // the index/table writes would otherwise re-evaluate the whole
    // gate→excise→exact→near→cross lineage per action — the MinHash
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

      // 2. feed-driven span excision against the maintained profile
      // (opt-in). The frame is pinned to the profile's PRE-batch
      // version — both a first run and a left-of-fence replay derive
      // the identical cleaned text, because the profile only advances
      // right of the table fence (step 8).
      val excised = spanRoot match {
        case Some(root) => cache(passed.drop(textCol).join(
          IncrementalViews.spanExciseIngest(
              spark, passed, profileViews(root), idCol, textCol,
              k = spanK)
            .select(col(idCol), col("clean_text").as(textCol)),
          Seq(idCol)))
        case None => passed
      }

      // 3. within-batch exact dedup: one survivor per normalized
      // committed (post-excision) text
      val exactReps = Dedup.exact(excised, idCol, textCol)
        .select(col("rep_id").as(idCol))
      val exactKept = excised.join(exactReps, Seq(idCol), "left_semi")

      // 4. within-batch near-dedup: larger id of each verified pair drops
      val inBatchPairs = Dedup.minHashLsh(exactKept, idCol, textCol,
        threshold = threshold)
      val nearKept = cache(exactKept.join(
        inBatchPairs.select(col("id_b").as(idCol)).distinct(),
        Seq(idCol), "left_anti"))
      val nNearKept = nearKept.count()

      // 5. cross-corpus near-dedup against the durable index (replay-
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

      if (!tableFenced) {
        // 6. accept/quarantine ledger — one row per ARRIVING doc with
        // its verdict and the recorded measure-first gate scores, all
        // computed against PRE-batch authorities. Fenced on its own
        // batch id and committed BEFORE the table fence, so a crash
        // in the window replays into the identical ledger.
        ledgerDir.filter(ld =>
            Snapshots.lastCommittedBatch(spark, ld) < batchId)
          .foreach { ld =>
            val ids = batch.select(col(idCol))
            var ledger = ids
              .join(passed.select(col(idCol), lit(1).as("__p")),
                Seq(idCol), "left")
              .join(nearKept.select(col(idCol), lit(1).as("__n")),
                Seq(idCol), "left")
              .join(accepted.select(col(idCol), lit(1).as("__a")),
                Seq(idCol), "left")
              .select(col(idCol),
                lit(batchId).as("batch_id"),
                when(col("__p").isNull, lit("quality"))
                  .when(col("__n").isNull, lit("dup_in_batch"))
                  .when(col("__a").isNull, lit("dup_vs_corpus"))
                  .otherwise(lit("accepted")).as("verdict"))
            spanRoot.foreach { root =>
              ledger = ledger.join(
                IncrementalViews.spanNoveltyIngest(spark, batch,
                    profileViews(root), idCol, textCol, k = spanK)
                  .select(col(idCol), col("novelty_ratio")),
                Seq(idCol), "left")
            }
            dsirCounts.foreach { case (rawCounts, targetCounts) =>
              ledger = ledger.join(
                Corpus.dsirScoreAgainst(batch, idCol, textCol,
                    rawCounts, targetCounts)
                  .select(col(idCol), col("logw").as("dsir_logw")),
                Seq(idCol), "left")
            }
            perplexityCounts.foreach { ref =>
              ledger = ledger.join(
                Corpus.perplexityScoreAgainst(batch, idCol, textCol, ref)
                  .select(col(idCol), col("nll").as("ref_nll")),
                Seq(idCol), "left")
            }
            Snapshots.commitStreamBatch(ledger, ld, batchId,
              bloomCols = Seq(idCol))
          }

        // 7. index first (duplicate-append-safe), fenced table commit
        // second; an all-dropped batch commits nothing (replaying it
        // re-derives the same empty decision — still idempotent)
        if (nAccepted > 0) {
          if (indexExists)
            MinHashIndex.append(spark, indexDir, accepted, idCol, textCol)
          else MinHashIndex.build(spark, indexDir, accepted, idCol, textCol)
          // the corpus table carries per-file id blooms: "fetch document
          // N" against the accumulated corpus opens only the files whose
          // filters fire (Snapshots.readPoint), not every batch's output
          Snapshots.commitStreamBatch(accepted, tableDir, batchId,
            bloomCols = Seq(idCol))
        }
      }

      // 8. profile advance — strictly RIGHT of the table fence, fenced
      // on its own batch id: the profile holds the accepted docs' RAW
      // text (pre-excision — excised text would stop vetoing its own
      // duplicates), and the refresh folds it so the NEXT batch's
      // excision sees this one. Runs on first pass AND on the fenced
      // catch-up replay (tableFenced && profileBehind), which re-derived
      // the identical accept set above from the still-pre-batch profile.
      spanRoot.foreach { root =>
        if (nAccepted > 0 &&
            Snapshots.lastCommittedBatch(spark, profileSrc(root)) < batchId) {
          val acceptedRaw = passed.join(accepted.select(col(idCol)),
            Seq(idCol), "left_semi")
          Snapshots.commitStreamBatch(acceptedRaw, profileSrc(root),
            batchId, statsCol = Some(idCol), bloomCols = Seq(idCol))
        }
        // an all-dropped FIRST batch has no profile source yet —
        // nothing to fold (the -1 watermark marks the missing table)
        if (Snapshots.lastCommittedBatch(spark, profileSrc(root)) >= 0)
          IncrementalViews.refreshSpanProfile(spark, profileSrc(root),
            profileViews(root), idCol, textCol, k = spanK)
      }

      IngestStats(batchId, arrived,
        failedQuality = arrived - nPassed,
        dupInBatch = nPassed - nNearKept,
        dupVsCorpus = nNearKept - nAccepted,
        accepted = nAccepted,
        fenced = tableFenced)
    } finally cached.foreach(_.unpersist(blocking = false))
  }
}
