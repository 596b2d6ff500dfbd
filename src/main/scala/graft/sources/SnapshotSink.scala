package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.plans.DatasetBridge

/** A [[Snapshots]] table as a Structured Streaming SINK —
  * `df.writeStream.format("graft-snapshot").option("dir", t).start()`
  * — the write-side twin of [[ChangeFeedSource]].
  *
  * Every micro-batch lands through the table's fenced commit protocol
  * ([[Snapshots.commitStreamBatch]] / [[Snapshots.mergeStreamBatch]]):
  * the batch id rides in the manifest, so a checkpoint replay of an
  * already-committed batch is a no-op — EXACTLY-ONCE into the table
  * with no foreachBatch boilerplate. Combined with the source, a
  * table-to-table pipeline is pure configuration:
  * `changesStream(src) → transform → format("graft-snapshot")(dst)`,
  * and every hop keeps the exactly-once guarantee.
  *
  * Options: `dir` (or `.start(path)`) — the table root; `mode` —
  *  - `append` (default): each batch is an append commit;
  *  - `merge`: each batch is a keyed CDC upsert — rows carry `op`
  *    (u/d) and `seq` columns, `keyCols` (comma-separated) required;
  *    rows WITHOUT an `op` column default to upserts sequenced by the
  *    batch id, so an update-mode aggregate stream maintains its
  *    result as a queryable table — a streaming MATERIALIZED VIEW;
  *  - `changes`: each batch is in CHANGE-FEED shape (`__change`,
  *    `__version`, as [[ChangeFeedSource]] emits) — applied as a
  *    file-granular copy-on-write merge on `keyCols`, an update's
  *    delete+insert at one version resolving to the insert (the LWW
  *    tie-break orders `u` above `d` at equal seq). This makes
  *    STREAMING TABLE REPLICATION a one-liner.
  * Plus the commit knobs: `statsCol`, `extraStatsCols`, `bloomCols`
  * (comma-separated), `bloomFpp`, and `pruneCol` for the merge modes.
  */
class SnapshotSink extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val dir = parameters.get("dir").orElse(parameters.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-snapshot needs .option(\"dir\", <table root>) or .start(<dir>)"))
    def cols(k: String): Seq[String] =
      parameters.get(k).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
    val mode = parameters.getOrElse("mode", "append")
    val keyCols = cols("keyCols")
    require(Set("append", "merge", "changes")(mode),
      s"graft-snapshot mode must be append|merge|changes, got '$mode'")
    require(mode == "append" || keyCols.nonEmpty,
      s"graft-snapshot mode=$mode needs .option(\"keyCols\", \"k1,k2\")")
    new SnapshotTableSink(dir, mode, keyCols,
      statsCol = parameters.get("statsCol"),
      extraStatsCols = cols("extraStatsCols"),
      bloomCols = cols("bloomCols"),
      bloomFpp = parameters.get("bloomFpp").map(_.toDouble).getOrElse(0.01),
      pruneCol = parameters.get("pruneCol"))
  }
}

private[sources] class SnapshotTableSink(dir: String, mode: String,
                                         keyCols: Seq[String],
                                         statsCol: Option[String],
                                         extraStatsCols: Seq[String],
                                         bloomCols: Seq[String],
                                         bloomFpp: Double,
                                         pruneCol: Option[String]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    val batch = DatasetBridge.batchDataFrame(
      spark, data.queryExecution.toRdd, data.schema)
    mode match {
      case "append" =>
        Snapshots.commitStreamBatch(batch, dir, batchId,
          statsCol, bloomCols, bloomFpp, extraStatsCols)
      case "merge" =>
        // rows may carry explicit op/seq CDC columns; a plain
        // update-mode stream (e.g. a windowed aggregate) carries
        // neither — default every row to an upsert sequenced by the
        // batch id, which is monotone per key across triggers, so the
        // table converges to the stream's latest state per key: the
        // sink IS streaming materialized-view maintenance
        val cdc =
          if (batch.columns.contains("op")) batch
          else batch.withColumn("op", lit("u"))
            .withColumn("seq", lit(batchId))
        Snapshots.mergeStreamBatch(cdc, dir, batchId, keyCols,
          pruneCol = pruneCol, bloomCols = bloomCols, bloomFpp = bloomFpp)
      case "changes" =>
        require(batch.columns.contains("__change") &&
          batch.columns.contains("__version"),
          "mode=changes expects the change-feed shape (__change, __version)")
        val cdc = batch
          .withColumn("__op",
            when(col("__change") === "insert", lit("u")).otherwise(lit("d")))
          .withColumn("__seq", col("__version"))
          .drop("__change", "__version")
        Snapshots.mergeStreamBatch(cdc, dir, batchId, keyCols,
          opCol = "__op", seqCol = "__seq",
          pruneCol = pruneCol, bloomCols = bloomCols, bloomFpp = bloomFpp)
    }
    ()
  }

  override def toString: String = s"SnapshotTableSink[$dir, $mode]"
}
