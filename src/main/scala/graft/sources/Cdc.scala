package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Changelog (CDC) application to a hive-partitioned parquet table
  * without a transaction layer: a change batch of upserts and deletes
  * is merged into ONLY the partitions it touches, via Spark's dynamic
  * partition overwrite — untouched partitions are never read or
  * rewritten.
  *
  * Change rows carry the table schema plus `opCol` ('u' = upsert,
  * 'd' = delete) and `seqCol` (a monotonically increasing change
  * sequence — offsets, LSNs). Conflict resolution is last-writer-wins
  * by (seqCol, op) per key: the highest sequence decides (so a later
  * delete beats an earlier upsert and vice versa); ties at equal
  * sequence resolve to upsert. Existing rows rank below every change
  * (sequence −∞).
  *
  * Scale: the touched-partition list is bounded driver metadata; the
  * existing-side read is partition-pruned to exactly that list; the
  * merge is one per-key max_by over (existing ∪ changes) co-shuffled
  * on the key; the write replaces only touched partition directories.
  * A 100 TB table with a 1 GB change batch reads/writes only the
  * partitions the gigabyte lands in. */
object Cdc {

  /** SCD-type-2 history from a changelog: every change row becomes a
    * version valid over [its sequence, next sequence for the key) —
    * the open current version carries Long.MaxValue. Delete rows
    * close their predecessor's validity (they bound the lead) but
    * emit no version themselves.
    *
    * Scale: one key-partition window (lead) — a single shuffle, O(1)
    * state per key during the scan. */
  def scd2(changes: DataFrame, keyCols: Seq[String], seqCol: String,
           opCol: Option[String] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    val versioned = changes
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to",
        coalesce(lead(col(seqCol), 1).over(w), lit(Long.MaxValue)))
    opCol.map(oc => versioned.filter(col(oc) =!= "d").drop(oc))
      .getOrElse(versioned)
  }

  def applyChanges(
      spark: SparkSession,
      tableDir: String,
      changes: DataFrame,
      keyCols: Seq[String],
      partCol: String,
      opCol: String = "op",
      seqCol: String = "seq"): Unit = {
    val dataCols = changes.columns.filterNot(c => c == opCol || c == seqCol)
    require(dataCols.contains(partCol), s"changes must carry $partCol")
    val touched = changes.select(partCol).distinct().collect().map(_.get(0))
    if (touched.isEmpty) return

    val existing = spark.read.parquet(tableDir)
      .filter(col(partCol).isin(touched: _*))
      .select(dataCols.map(col) :+ lit("u").as(opCol) :+
        lit(Long.MinValue).as(seqCol): _*)
    val merged = existing
      .unionByName(changes.filter(col(partCol).isin(touched: _*))
        .select(dataCols.map(col) :+ col(opCol) :+ col(seqCol): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(
        max_by(struct((dataCols.filterNot(keyCols.contains).map(col) :+
          col(opCol)).map(c => c): _*),
          struct(col(seqCol), col(opCol))).as("__w"))
      .select(keyCols.map(col) ++
        dataCols.filterNot(keyCols.contains).map(c => col(s"__w.$c")) :+
        col(s"__w.$opCol"): _*)
      .filter(col(opCol) =!= "d")
      .select(dataCols.map(col): _*)

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      merged.write.mode("overwrite").partitionBy(partCol).parquet(tableDir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
