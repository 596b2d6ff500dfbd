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

  private def profileSrc(root: String) = s"$root/src"
  private def profileViews(root: String) = s"$root/views"

  /** Process one micro-batch; returns what happened to every arriving
    * document. Idempotent per `batchId`: a replayed batch is fenced
    * by the snapshot table and touches nothing (except the documented
    * profile catch-up, itself fenced).
    *
    * `clusterDir = Some(dir)` switches the pipeline to CLUSTER mode:
    * nothing past the quality gate is dropped — duplication becomes
    * LABELS instead of deletions. Edges derive from the RAW
    * (pre-excision) text and the index holds raw text in this mode:
    * the labels describe the arriving content's duplication
    * structure, and span excision would cut exactly the duplicated
    * spans the labels exist to record. The edges (within-batch LSH
    * pairs + cross-corpus index hits) feed
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
    * owned by this pipeline. Enabling it on a table that ALREADY
    * holds commits the profile never saw fails by name — a profile
    * seeded from one mid-stream batch would silently represent a tail
    * of the corpus and under-veto future spans; run
    * [[bootstrapSpanProfile]] once over the existing table first.
    * `dsirCounts = Some((rawCounts,
    * targetCounts))` and `perplexityCounts = Some(refCounts)` are
    * `(token, cnt)` frames — typically maintained word-frequency
    * views — recorded per doc in the ledger; they gate nothing here
    * (measure-first: thresholds are a policy the operator applies
    * downstream ON the ledger). Every gate option COMPOSES with
    * cluster mode: a keep-and-label deployment still excises spans,
    * records the measure-first ledger (verdicts are `quality` /
    * `accepted` only — duplication lives in the assignment table,
    * not the verdict), and advances the span profile. */
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
    val spark = batch.sparkSession
    val arrived = batch.count()
    val tableW = Snapshots.lastCommittedBatch(spark, tableDir)
    val tableFenced = tableW >= batchId
    val profileBehind = spanRoot.exists(root =>
      Snapshots.lastCommittedBatch(spark, profileSrc(root)) < batchId)
    // span-profile bootstrap guard: a VIRGIN profile (never committed)
    // under a table already holding OTHER batches means spanRoot was
    // enabled mid-stream — deriving the profile from just this batch
    // would make it silently represent a tail of the corpus and
    // under-veto every span the older batches already hold. (The one
    // ambiguous case, tableW == batchId with a virgin profile, is the
    // legitimate crash window between the first batch's table commit
    // and its profile commit — that catch-up stays allowed.)
    spanRoot.foreach { root =>
      val profileW = Snapshots.lastCommittedBatch(spark, profileSrc(root))
      require(profileW >= 0 || tableW < 0 || tableW == batchId,
        s"CorpusIngest: span profile at $root has never been committed " +
          s"but the table at $tableDir is already at batch $tableW " +
          s"(this batch: $batchId) — the profile would represent only " +
          "a tail of the corpus; bootstrap it over the existing table " +
          "first (CorpusIngest.bootstrapSpanProfile)")
    }
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

      // 2. feed-driven span excision against the maintained profile
      // (opt-in; composes with BOTH modes). The frame is pinned to the
      // profile's PRE-batch version — both a first run and a
      // left-of-fence replay derive the identical cleaned text,
      // because the profile only advances right of the table fence
      // (step 8).
      val excised = spanRoot match {
        case Some(root) => cache(passed.drop(textCol).join(
          IncrementalViews.spanExciseIngest(
              spark, passed, profileViews(root), idCol, textCol,
              k = spanK)
            .select(col(idCol), col("clean_text").as(textCol)),
          Seq(idCol)))
        case None => passed
      }

      // 3-5 (drop mode, over the text actually being committed —
      // post-excision) / edge derivation (cluster mode, over the RAW
      // text: the labels describe the ARRIVING content's duplication
      // structure, and excision would cut exactly the duplicated
      // spans the labels exist to record — a re-crawled copy must
      // still cluster with its twin even though its committed text is
      // excised to the unique remnant).
      // CLUSTER mode: label, don't drop. Edges = within-batch LSH
      // edge list (rep pairs + exact-dup stars — the same edge set
      // nearDupClusters uses) ∪ cross-corpus index hits, queried
      // BEFORE this batch is appended (a replayed batch already in
      // the index yields the in-batch pairs again as cross pairs —
      // same union, same clusters). The index therefore holds RAW
      // text in cluster mode (step 7) — consistent with what the
      // edges compare — and committed post-excision text in drop mode.
      val clusterEdges = clusterDir.map { _ =>
        val inBatch = Dedup.minHashLshEdges(passed, idCol, textCol,
          threshold = threshold).select("id_a", "id_b")
        cache(
          if (!indexExistsNow) inBatch
          else inBatch.unionByName(
            MinHashIndex.query(spark, indexDir, passed, idCol, textCol,
              threshold).select("id_a", "id_b")))
      }
      val (nearKept, accepted) = clusterDir match {
        case Some(_) =>
          // nothing past the gate drops — duplication is labels
          (excised, excised)
        case None =>
          // 3. within-batch exact dedup: one survivor per normalized
          // committed (post-excision) text
          val exactReps = Dedup.exact(excised, idCol, textCol)
            .select(col("rep_id").as(idCol))
          val exactKept = excised.join(exactReps, Seq(idCol), "left_semi")
          // 4. within-batch near-dedup: larger id of each verified
          // pair drops
          val inBatchPairs = Dedup.minHashLsh(exactKept, idCol, textCol,
            threshold = threshold)
          val kept = cache(exactKept.join(
            inBatchPairs.select(col("id_b").as(idCol)).distinct(),
            Seq(idCol), "left_anti"))
          // 5. cross-corpus near-dedup against the durable index
          // (replay-safe: a doc already indexed by a crashed previous
          // run does not match itself — MinHashIndex.query drops
          // self-pairs)
          val acc =
            if (!indexExistsNow) kept // already cached above
            else cache(kept.join(
              MinHashIndex.query(spark, indexDir, kept, idCol, textCol,
                  threshold)
                .select(col("id_a").as(idCol)).distinct(),
              Seq(idCol), "left_anti"))
          (kept, acc)
      }
      val nNearKept =
        if (clusterDir.isDefined) nPassed else nearKept.count()
      val nAccepted =
        if (clusterDir.isDefined) nPassed else accepted.count()

      if (!tableFenced) {
        // 6. accept/quarantine ledger — one row per ARRIVING doc with
        // its verdict and the recorded measure-first gate scores, all
        // computed against PRE-batch authorities. Fenced on its own
        // batch id and committed BEFORE the table fence, so a crash
        // in the window replays into the identical ledger. In cluster
        // mode only `quality`/`accepted` occur — duplication is the
        // assignment table's to report, not a verdict.
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

        // 7. index first (duplicate-append-safe), then in cluster mode
        // the durable assignment table (BEFORE the fence: once the
        // fence is up, a replay must find the clusters already
        // durable — edge derivation is deterministic, the upsert
        // idempotent), fenced table commit last; an all-dropped batch
        // commits nothing (replaying it re-derives the same empty
        // decision — still idempotent)
        if (nAccepted > 0) {
          // cluster mode indexes the RAW text (what the edges compare);
          // drop mode indexes the committed post-excision text
          val indexFrame = if (clusterDir.isDefined) passed else accepted
          if (indexExistsNow)
            MinHashIndex.append(spark, indexDir, indexFrame, idCol, textCol)
          else MinHashIndex.build(spark, indexDir, indexFrame, idCol, textCol)
          clusterDir.foreach(cd => Dedup.incrementalClusters(
            spark, cd, accepted, clusterEdges.get, idCol))
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

  /** One-time span-profile BOOTSTRAP for enabling `spanRoot` on a
    * pipeline that already committed batches without it: commits the
    * ENTIRE existing table's text to the profile's source as one
    * batch fenced at the table's current watermark, then folds the
    * refresh — after this, the profile represents the whole standing
    * corpus (the existing table's text is raw by construction: it was
    * committed before excision existed here) and ingest resumes
    * normally (a replay of any batch ≤ the watermark is fenced on
    * both sides; fresh batches excise against the full profile).
    * Idempotent: a second call is fenced by the profile source. */
  def bootstrapSpanProfile(
      spark: org.apache.spark.sql.SparkSession,
      tableDir: String, spanRoot: String,
      idCol: String, textCol: String, spanK: Int = 10): Unit = {
    val tableW = Snapshots.lastCommittedBatch(spark, tableDir)
    require(tableW >= 0,
      s"bootstrapSpanProfile: no committed table at $tableDir — a " +
        "fresh pipeline needs no bootstrap, just pass spanRoot from " +
        "the first batch")
    Snapshots.commitStreamBatch(
      Snapshots.read(spark, tableDir).select(col(idCol), col(textCol)),
      profileSrc(spanRoot), tableW,
      statsCol = Some(idCol), bloomCols = Seq(idCol))
    IncrementalViews.refreshSpanProfile(spark, profileSrc(spanRoot),
      profileViews(spanRoot), idCol, textCol, k = spanK)
  }

  /** LEDGER-DRIVEN RE-ADMISSION — the quarantine's second half. The
    * ledger is measure-first (verdicts + novelty/DSIR/perplexity
    * scores, gating nothing); when the POLICY changes, this re-scores
    * the quarantined rows and re-admits the survivors through the
    * NORMAL pipeline — same gates (at the new, presumably relaxed
    * parameters), same dedup tiers, same index append, same fenced
    * commit, and a fresh ledger row per re-considered doc (latest row
    * per doc = its standing verdict).
    *
    * `raw` is the bronze archive holding the ORIGINAL documents — the
    * ledger records decisions, not text, so re-admission needs the
    * raw zone every real pipeline keeps. `policy` is a boolean
    * [[org.apache.spark.sql.Column]] over the ledger row (verdict +
    * recorded scores), e.g. `col("verdict") === "quality" &&
    * col("ref_nll") < 4.0`. Docs whose LATEST verdict is `accepted`
    * and docs already live in the table are never re-fed.
    *
    * Replaying the same `readmitBatchId` is fenced exactly like any
    * ingest batch. Re-admitting with the pipeline's ORIGINAL
    * parameters relaxed is equivalent to having ingested with the
    * relaxed parameters from the start, up to near-dup direction: a
    * re-admitted doc now meets its former batch-mates through the
    * index (cross-corpus keep-first) instead of the within-batch
    * larger-id rule (spec-pinned). */
  def readmitQuarantined(
      raw: DataFrame,
      readmitBatchId: Long,
      tableDir: String,
      indexDir: String,
      ledgerDir: String,
      idCol: String,
      textCol: String,
      policy: org.apache.spark.sql.Column,
      threshold: Double = 0.9,
      minTokens: Int = 5,
      langs: Seq[String] = Seq("en"),
      clusterDir: Option[String] = None,
      spanRoot: Option[String] = None,
      spanK: Int = 10,
      dsirCounts: Option[(DataFrame, DataFrame)] = None,
      perplexityCounts: Option[DataFrame] = None): IngestStats = {
    val spark = raw.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("batch_id").desc)
    val latest = Snapshots.read(spark, ledgerDir)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    var candidates = latest
      .filter(col("verdict") =!= "accepted")
      .filter(policy)
      .select(col(idCol))
    if (Snapshots.lastCommittedBatch(spark, tableDir) >= 0)
      candidates = candidates.join(
        Snapshots.read(spark, tableDir).select(col(idCol)),
        Seq(idCol), "left_anti")
    ingestBatch(raw.join(candidates, Seq(idCol), "left_semi"),
      readmitBatchId, tableDir, indexDir, idCol, textCol,
      threshold = threshold, minTokens = minTokens, langs = langs,
      clusterDir = clusterDir, spanRoot = spanRoot, spanK = spanK,
      ledgerDir = Some(ledgerDir), dsirCounts = dsirCounts,
      perplexityCounts = perplexityCounts)
  }
}
