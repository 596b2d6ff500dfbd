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
  * partitions the gigabyte lands in.
  *
  * Contract: the partition column must be IMMUTABLE per key — a key
  * that "moves" partitions would leave its old row stranded in a
  * partition this batch never reads. [[applyChanges]] validates the
  * violations it can see (a key with two distinct partition values
  * within existing-touched ∪ batch) and rejects the batch; a move
  * whose old partition is untouched by the batch is undetectable
  * without a full table scan, hence the contract. */
object Cdc {

  /** SCD-type-2 history from a changelog: every change row becomes a
    * version valid over [its sequence, next sequence for the key) —
    * the open current version carries Long.MaxValue. Delete rows
    * close their predecessor's validity (they bound the lead) but
    * emit no version themselves.
    *
    * Scale: one key-partition window (lead) — a single shuffle, O(1)
    * state per key during the scan.
    *
    * Ordering must be total per key: if a key can carry duplicate
    * sequences (e.g. several columns changed in one transaction LSN),
    * pass `tieBreak` columns that make (seqCol, tieBreak...) unique —
    * otherwise lead() over the tied rows is nondeterministic and
    * valid_from/valid_to can differ run to run. */
  def scd2(changes: DataFrame, keyCols: Seq[String], seqCol: String,
           opCol: Option[String] = None,
           tieBreak: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((seqCol +: tieBreak).map(col): _*)
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
    // Null partition values are first-class (they land in Spark's
    // __HIVE_DEFAULT_PARTITION__ directory), but `isin` is three-valued
    // — NULL IN (...) is NULL, never true — so every touched-membership
    // filter must carry an explicit isNull branch or null-partition
    // rows silently vanish from the merge.
    val touchedNonNull = touched.filter(_ != null)
    val touchedHasNull = touched.contains(null)
    def inTouched(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val nonNullHit =
        if (touchedNonNull.isEmpty) lit(false) else c.isin(touchedNonNull: _*)
      if (touchedHasNull) nonNullHit || c.isNull else nonNullHit
    }

    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tableDir), spark.sparkContext.hadoopConfiguration)
    val tablePath = new org.apache.hadoop.fs.Path(tableDir)
    val tableExisted = fs.exists(tablePath)

    // Bootstrap: a first batch against a not-yet-existing table has no
    // existing side — the merge below still runs (within-batch LWW and
    // delete suppression apply to the batch itself).
    val existing =
      if (tableExisted)
        spark.read.parquet(tableDir)
          .filter(inTouched(col(partCol)))
          .select(dataCols.map(col) :+ lit("u").as(opCol) :+
            lit(Long.MinValue).as(seqCol): _*)
      else
        changes.filter(lit(false))
          .select(dataCols.map(col) :+ lit("u").as(opCol) :+
            lit(Long.MinValue).as(seqCol): _*)

    val unioned = existing
      .unionByName(changes.filter(inTouched(col(partCol)))
        .select(dataCols.map(col) :+ col(opCol) :+ col(seqCol): _*))
      .persist()
    try {
      // Visible slice of the immutable-partition contract: a key seen
      // with two partition values inside the touched set is a moved
      // key and would end up duplicated — reject the batch.
      // countDistinct skips nulls, so the null partition is counted as
      // one extra distinct value explicitly — a key moving between the
      // null partition and a real one is as moved as any other.
      val moved = unioned
        .groupBy(keyCols.map(col): _*)
        .agg((countDistinct(col(partCol)) +
          max(when(col(partCol).isNull, 1).otherwise(0))).as("__np"))
        .filter(col("__np") > 1)
        .limit(1).collect()
      require(moved.isEmpty, s"key ${moved.headOption.map(_.toString).getOrElse("")} " +
        s"changes its $partCol value within this batch; the partition column " +
        "must be immutable per key (see Cdc contract)")

      val merged = unioned
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
        .persist()

      // Dynamic partition overwrite replaces only partitions PRESENT in
      // the written data — a touched partition whose rows were all
      // deleted contributes nothing to `merged` and would survive
      // stale. Find those survivors-of-nothing first, then drop their
      // directories after the write succeeds.
      val kept = merged.select(partCol).distinct().collect().map(_.get(0)).toSet
      val emptied = touched.filterNot(kept.contains)

      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try
        merged.write.mode("overwrite").partitionBy(partCol).parquet(tableDir)
      finally {
        merged.unpersist()
        prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
      // An emptied partition had rows before this batch, so its
      // directory MUST exist (unless this batch bootstrapped the
      // table); a miss means the `v.toString` rendering disagrees with
      // Spark's on-disk partition-path format for this column type —
      // fail loudly instead of silently leaving the stale partition
      // alive (string/date/numeric render identically; exotic types
      // like timestamp may not).
      if (tableExisted) emptied.foreach { v =>
        val dirName = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(partCol, if (v == null) null else v.toString)
        val p = new org.apache.hadoop.fs.Path(tablePath, dirName)
        require(fs.exists(p),
          s"emptied partition $partCol=$v resolved to missing path $p; " +
            "partition-path rendering for this column type disagrees with " +
            "Spark's — the stale partition cannot be dropped safely")
        fs.delete(p, true)
      }
    } finally unioned.unpersist()
  }
}
