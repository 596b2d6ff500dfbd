package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.plans.DatasetBridge

/** A [[Snapshots]] table as a Structured Streaming SOURCE —
  * `spark.readStream.format("graft-changes").load(dir)` — the
  * streaming twin of [[Snapshots.consumeChanges]].
  *
  * The table's commit log IS a stream: offsets are snapshot versions,
  * and each micro-batch carries the row-level change feed
  * ([[Snapshots.diff]]) of the versions it covers, tagged
  * `__change` (insert/delete) and `__version`. The streaming engine's
  * offset log supplies the durability that `consumeChanges` gets from
  * its marker files: after a crash, the checkpoint replays exactly
  * the uncommitted version range — end-to-end exactly-once when the
  * sink is idempotent by `batchId` (e.g. `foreachBatch` into
  * [[Snapshots.mergeStreamBatch]]).
  *
  * This is the piece that turns the storage layer into a live
  * pipeline fabric at 100 TB: a downstream index (embeddings, BM25
  * vocabulary, near-dup assignments) subscribes to the table and pays
  * O(churn) per trigger, never O(table) — the same contract as Delta's
  * change-data-feed stream, built on the V1 `Source` API whose
  * `getBatch` may return a driver-composed DataFrame (so the batch
  * plan is the existing file-set-diff computation, unchanged).
  *
  * Options: `dir` (or the `.load(path)` argument) — the table root;
  * `startingVersion` — first version to emit (default 0 = replay the
  * full history as inserts-first, the replication bootstrap;
  * `"latest"` = only versions committed after the query starts);
  * `maxVersionsPerTrigger` — admission cap per micro-batch, so a
  * bootstrap over a deep history streams as bounded batches instead
  * of one plan unioning every version (the `maxFilesPerTrigger`
  * analog; the cursor it throttles from survives restarts in the
  * source's checkpoint subdir).
  * Keep [[Snapshots.expire]]'s horizon behind the slowest stream —
  * a consumer that has fallen past it fails loudly on the missing
  * manifest rather than silently skipping (same rule as
  * `consumeChanges`).
  */
class ChangeFeedSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.get("dir").orElse(parameters.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-changes needs .option(\"dir\", <table root>) or .load(<dir>)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(),
      ChangeFeedSource.feedSchema(sqlContext.sparkSession, dirOf(parameters)))

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val dir = dirOf(parameters)
    val startAfter = parameters.get("startingVersion") match {
      case Some("latest") => Snapshots.latestVersion(spark, dir).getOrElse(-1L)
      case Some(v) => v.toLong - 1 // first emitted version is v itself
      case None => -1L // full-history replay from version 0
    }
    val maxVersions = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    require(maxVersions.forall(_ > 0), "maxVersionsPerTrigger must be > 0")
    new ChangeFeedStream(spark, dir, startAfter, maxVersions, metadataPath)
  }
}

object ChangeFeedSource {
  /** Feed schema: the table's (merged) schema + `__change` + `__version`.
    * Fixed at query start; versions written before a schema evolution
    * read missing columns as null (same alignment as [[Snapshots.diff]]).
    * Answered from the manifest's recorded schemas when available —
    * a stream start over a 100 TB table must not open every footer. */
  def feedSchema(spark: SparkSession, dir: String): StructType = {
    val base = Snapshots.tableSchema(spark, dir).getOrElse(
      Snapshots.read(spark, dir, None, mergeSchema = true).schema)
    StructType(base.fields :+
      StructField("__change", StringType) :+
      StructField("__version", LongType))
  }
}

private[sources] class ChangeFeedStream(spark: SparkSession, dir: String,
                                        startAfter: Long,
                                        maxVersionsPerTrigger: Option[Long] = None,
                                        metadataPath: String = "")
  extends Source {

  override val schema: StructType = ChangeFeedSource.feedSchema(spark, dir)
  private val dataSchema = StructType(schema.dropRight(2))

  /** Highest version already handed to the engine — the admission
    * cursor `maxVersionsPerTrigger` throttles from. Durable in the
    * source's own checkpoint subdir: after a restart, a stale-LOW
    * cursor could make [[getOffset]] answer BEHIND the engine's
    * committed offset, which the engine would treat as new data and
    * plan a backwards batch. The engine's offset log remains the
    * correctness watermark; this file only needs to never lag it,
    * and it's rewritten in [[getBatch]] before the batch runs. */
  private var cursor: Long = {
    // the watermark rides in marker file NAMES (atomic create — a torn
    // write cannot corrupt a name; same convention as the view and
    // consumer markers). Older markers are GC'd only after the newer
    // one exists, so some marker always names a valid watermark.
    val markers = cursorMarkers
    if (markers.nonEmpty) markers.max
    else cursorPath match {
      case Some(p) if fsys.exists(p) =>
        // legacy content-file form (pre-marker checkpoints): parseable
        // → upgrade in place on the next persist; unreadable → fail
        // loudly. Silently regressing to startAfter is exactly the
        // stale-LOW state described above — with maxVersionsPerTrigger
        // set, getOffset could then answer behind the engine's
        // committed offset and re-emit already-delivered versions
        // (duplicates to any non-fenced sink).
        val in = fsys.open(p)
        val raw = try new String(in.readAllBytes(), "UTF-8").trim
                  finally in.close()
        try raw.toLong catch {
          case e: NumberFormatException => throw new IllegalStateException(
            s"corrupt graft-changes cursor at $p: '$raw' — refusing " +
              "to regress the admission watermark; inspect the checkpoint " +
              "or delete the file to rebuild it from the engine's offset log",
            e)
        }
      case _ => startAfter
    }
  }

  private def fsys =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def cursorPath: Option[org.apache.hadoop.fs.Path] =
    if (metadataPath.isEmpty) None
    else Some(new org.apache.hadoop.fs.Path(metadataPath, "graft-cursor"))

  // lazy: used while the `cursor` field (declared above) initializes
  private lazy val CursorMarkerRe = "graft-cursor-v(\\d{12})".r

  private def cursorMarkers: Seq[Long] = cursorPath match {
    case Some(p) if fsys.exists(p.getParent) =>
      fsys.listStatus(p.getParent).map(_.getPath.getName).toSeq.collect {
        case CursorMarkerRe(v) => v.toLong
      }
    case _ => Nil
  }

  private def persistCursor(v: Long): Unit = cursorPath.foreach { p =>
    // marker-file write: create the NEW name first (atomic — the old
    // in-place truncate left a crash window where a 0-byte cursor
    // forced a manual restart), THEN retire older markers and any
    // legacy content file
    val marker = new org.apache.hadoop.fs.Path(p.getParent,
      f"graft-cursor-v$v%012d")
    fsys.create(marker, true).close()
    fsys.listStatus(p.getParent).map(_.getPath)
      .filter { q =>
        q.getName match {
          case CursorMarkerRe(o) => o.toLong < v
          case _ => q.getName == p.getName // the legacy content file
        }
      }.foreach(fsys.delete(_, false))
  }

  /** Latest available offset = the table's latest published version,
    * clamped to `cursor + maxVersionsPerTrigger` so a bootstrap over a
    * deep history arrives as bounded micro-batches instead of one
    * union of every version. One filesystem listing per trigger — no
    * data is touched until the engine asks for the batch. */
  override def getOffset: Option[OffsetV1] = {
    val latest = Snapshots.latestVersion(spark, dir).getOrElse(return None)
    val capped = maxVersionsPerTrigger
      .fold(latest)(m => math.min(latest, math.max(cursor, startAfter) + m))
    Some(capped).filter(_ > startAfter).map(LongOffset(_))
  }

  /** Versions (start, end], one [[Snapshots.diff]] per version so the
    * feed preserves per-commit granularity (a row inserted in v1 and
    * deleted in v3 shows BOTH events even when one trigger covers
    * v1..v3). Deterministic given the manifests, so a checkpoint
    * replay reproduces the batch bit-for-bit. */
  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(_.json.toLong).getOrElse(startAfter)
    val to = end.json.toLong
    if (to > cursor) { cursor = to; persistCursor(to) }
    if (from >= to) // engine replaying an empty/stale range
      return DatasetBridge.streamingDataFrame(spark,
        spark.emptyDataFrame.queryExecution.toRdd
          .mapPartitions(_ => Iterator.empty), schema)
    val perVersion = ((from + 1) to to).map { v =>
      val changes =
        if (v == 0L) Snapshots.read(spark, dir, Some(0L), mergeSchema = true)
          .withColumn("__change", lit("insert"))
        else Snapshots.diff(spark, dir, v - 1, v)
      align(changes).withColumn("__version", lit(v))
    }
    val batch = perVersion.reduce(_ unionByName _)
    // V1 contract: getBatch must return an isStreaming=true DataFrame
    DatasetBridge.streamingDataFrame(spark, batch.queryExecution.toRdd, schema)
  }

  /** Conform a per-version diff to the fixed feed schema: add columns
    * this version predates as nulls, cast to the feed's types, fix
    * the column order so the InternalRow layout matches `schema`. */
  private def align(df: DataFrame): DataFrame = {
    val withAll = dataSchema.fields.foldLeft(df) { (d, f) =>
      if (d.columns.contains(f.name)) d
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    withAll.select(
      dataSchema.fields.map(f => col(f.name).cast(f.dataType)).toSeq :+
        col("__change"): _*)
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"ChangeFeedStream[$dir]"
}
