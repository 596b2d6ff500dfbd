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
  *    silently produces disjoint key spaces (zero recall).
  *
  * Contract: document ids must be unique across all appended batches
  * (duplicate ids would duplicate verification rows, same as unioning
  * a corpus with itself).
  */
object MinHashIndex {

  case class Meta(numHashes: Int, bands: Int)

  private def metaPath(dir: String) = s"$dir/_graft_minhash_meta.json"

  private def fs(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def writeMeta(spark: SparkSession, dir: String, meta: Meta): Unit = {
    val out = fs(spark, dir).create(
      new org.apache.hadoop.fs.Path(metaPath(dir)), true)
    try out.write(
      s"""{"numHashes":${meta.numHashes},"bands":${meta.bands}}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  def readMeta(spark: SparkSession, dir: String): Meta = {
    val in = fs(spark, dir).open(new org.apache.hadoop.fs.Path(metaPath(dir)))
    val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    def field(name: String): Int =
      s""""$name":(\\d+)""".r.findFirstMatchIn(s)
        .map(_.group(1).toInt)
        .getOrElse(sys.error(s"corrupt index meta at ${metaPath(dir)}: $s"))
    Meta(field("numHashes"), field("bands"))
  }

  private def writeBatch(
      dir: String, batch: DataFrame, idCol: String, textCol: String,
      meta: Meta, mode: String): Unit = {
    val hashed = Dedup.shingleSets(batch, idCol, textCol)
    Dedup.bandedSignatures(hashed, meta.numHashes, meta.bands)
      .write.mode(mode).partitionBy("__band").parquet(s"$dir/bands")
    hashed.select(col("__id"), col("__sh"), size(col("__sh")).as("__sz"))
      .write.mode(mode).parquet(s"$dir/sets")
  }

  /** Create (or replace) the index from an initial corpus. */
  def build(
      spark: SparkSession,
      dir: String,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 128,
      bands: Int = 16): Unit = {
    val meta = Meta(numHashes, bands)
    writeBatch(dir, corpus, idCol, textCol, meta, "overwrite")
    writeMeta(spark, dir, meta)
  }

  /** Append an accepted batch — banding parameters come from the
    * stored meta, existing files are never rewritten. */
  def append(
      spark: SparkSession,
      dir: String,
      batch: DataFrame,
      idCol: String,
      textCol: String): Unit =
    writeBatch(dir, batch, idCol, textCol, readMeta(spark, dir), "append")

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
    if (!fs(spark, dir).exists(t)) candidates
    else candidates.join(
      spark.read.parquet(s"$dir/tombstones").select(col("__id").as("id_b")),
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
      .join(spark.read.parquet(s"$dir/bands")
          .select(col("__band"), col("__bh"), col("__id").as("id_b")),
        Seq("__band", "__bh"))
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    val live = liveCandidates(spark, dir, candidates)
    val vCorpus = spark.read.parquet(s"$dir/sets")
      .select(col("__id").as("id_b"), col("__sh").as("sh_b"), col("__sz").as("sz_b"))
    Dedup.verifyCrossPairs(live, hNew, vCorpus, threshold)
  }

  /** Band-scoped scan — the read shape whose partition pruning the
    * layout exists for (and the spec asserts). */
  def bandScan(spark: SparkSession, dir: String, band: Int): DataFrame =
    spark.read.parquet(s"$dir/bands").filter(col("__band") === band)
}
