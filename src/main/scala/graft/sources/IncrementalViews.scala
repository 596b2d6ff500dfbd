package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN views over [[Snapshots]] tables —
  * the change-feed consumer that closes the storage layer's loop:
  * CDC-in ([[Snapshots.mergeCommit]]) and CDC-out ([[Snapshots.diff]])
  * compose into a materialized `left JOIN right` whose refresh cost is
  * O(churn), never O(table).
  *
  * The view is stored as a Z-set (the DBSP / Differential-Dataflow
  * encoding): DISTINCT join-result rows annotated with a `__n`
  * multiplicity column. That makes every view row uniquely keyed by
  * its full value tuple, so the refresh lands through the keyed,
  * file-granular copy-on-write [[Snapshots.mergeCommit]] — and
  * multiset join semantics (duplicate rows on either input) survive
  * exactly.
  *
  * Refresh strategy is affected-key recompute, the plan that stays
  * correct under arbitrary mixes of insert/update/delete on BOTH
  * sides without signed-delta bookkeeping: the join keys named by
  * either side's change feed are re-joined from the two CURRENT
  * snapshots (each side semi-join-restricted to those keys first), and
  * the view's rows for exactly those keys are replaced. Keys nobody
  * touched are never read, and the view files they live in are carried
  * into the new manifest by reference. At 100 TB: a day's churn
  * re-joins a day's keys.
  *
  * Exactly-once across crashes: each refresh tick writes a WRITE-AHEAD
  * INTENT marker (file NAME carries tick + the pinned from/to versions
  * of both inputs — a torn write cannot corrupt it), then merges with
  * `batchId = tick` (fenced inside the view's own manifest), then
  * writes a PROCESSED marker. A replay of an interrupted tick re-reads
  * the intent's pinned versions — so it recomputes the identical
  * change batch — and the manifest fence drops it if the crash
  * happened after the merge committed.
  *
  * Reference scope: the reference's `price_prediction.ipynb` re-runs
  * its merge/join of weather+price tables from scratch on every
  * refresh; this is that join kept continuously current.
  */
object IncrementalViews {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    FileSystem.get(new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)

  private def stateRoot(viewDir: String) =
    s"${viewDir.stripSuffix("/")}/_view_state"

  private val MarkerRe =
    raw"(intent|processed)-T(\d{6,})-FL(-?\d+)-FR(-?\d+)-TL(-?\d+)-TR(-?\d+)".r

  private case class Tick(kind: String, t: Long, fl: Long, fr: Long,
                          tl: Long, tr: Long)

  private def markers(f: FileSystem, root: Path): Seq[Tick] =
    if (!f.exists(root)) Nil
    else f.listStatus(root).map(_.getPath.getName).toSeq.collect {
      case MarkerRe(k, t, fl, fr, tl, tr) =>
        Tick(k, t.toLong, fl.toLong, fr.toLong, tl.toLong, tr.toLong)
    }

  private def writeMarker(f: FileSystem, root: Path, tick: Tick): Unit = {
    f.mkdirs(root)
    val name = f"${tick.kind}-T${tick.t}%06d-FL${tick.fl}-FR${tick.fr}" +
      f"-TL${tick.tl}-TR${tick.tr}"
    f.create(new Path(root, name), true).close()
  }

  /** Create or refresh the materialized inner equi-join of two
    * snapshot tables: `viewDir` holds
    * `SELECT *, count(*) AS __n FROM left JOIN right USING (joinKeys)
    * GROUP BY ALL`, current as of both inputs' latest versions.
    * Non-key column names must be disjoint across the inputs (project
    * or rename upstream). Rows with a NULL in any join key never join
    * and never dirty the view — standard inner-join semantics.
    *
    * Returns the view version published this call, or None when the
    * view is already current (or the tick was replay-fenced).
    * Each call processes ONE tick covering everything that happened on
    * both inputs since the previous tick. */
  def refreshJoin(spark: SparkSession, leftDir: String, rightDir: String,
                  viewDir: String, joinKeys: Seq[String]): Option[Long] = {
    require(joinKeys.nonEmpty, "refreshJoin needs at least one join key")
    val f = fs(spark, viewDir)
    val root = new Path(stateRoot(viewDir))
    val ms = markers(f, root)
    val processed = ms.filter(_.kind == "processed")
    val intents = ms.filter(_.kind == "intent")
    val doneT = if (processed.isEmpty) -1L else processed.map(_.t).max
    val pending = intents.filter(_.t > doneT).sortBy(_.t).headOption

    val tick = pending match {
      case Some(p) => p.copy(kind = "intent") // replay the pinned tick
      case None =>
        val last = processed.sortBy(_.t).lastOption
        val (fl, fr) = last.map(p => (p.tl, p.tr)).getOrElse((-1L, -1L))
        val tl = Snapshots.latestVersion(spark, leftDir).getOrElse(
          throw new IllegalArgumentException(s"no snapshots at $leftDir"))
        val tr = Snapshots.latestVersion(spark, rightDir).getOrElse(
          throw new IllegalArgumentException(s"no snapshots at $rightDir"))
        if (tl == fl && tr == fr) return None // already current
        val t = Tick("intent", doneT + 1, fl, fr, tl, tr)
        writeMarker(f, root, t)
        t
    }

    // the change feeds, pinned to the intent's versions: deterministic
    // on replay even if the inputs advanced further in the meantime
    def delta(dir: String, from: Long, to: Long): DataFrame =
      if (from < 0L)
        Snapshots.read(spark, dir, Some(to)).withColumn("__change", lit("insert"))
      else if (from == to)
        Snapshots.read(spark, dir, Some(to)).limit(0)
          .withColumn("__change", lit("insert"))
      else Snapshots.diff(spark, dir, from, to)
    val dA = delta(leftDir, tick.fl, tick.tl)
    val dB = delta(rightDir, tick.fr, tick.tr)

    val keyCols = joinKeys.map(col)
    val notNullKeys = joinKeys.map(col(_).isNotNull).reduce(_ && _)
    val affected = dA.select(keyCols: _*).unionByName(dB.select(keyCols: _*))
      .filter(notNullKeys).distinct()

    val version: Option[Long] =
      if (affected.isEmpty) None // pure-rewrite churn (compaction): no keys moved
      else {
        val leftNow = Snapshots.read(spark, leftDir, Some(tick.tl))
          .join(affected, joinKeys, "left_semi")
        val rightNow = Snapshots.read(spark, rightDir, Some(tick.tr))
          .join(affected, joinKeys, "left_semi")
        val recomputed = leftNow.join(rightNow, joinKeys)
        val valueCols = recomputed.columns.toSeq
        val fresh = recomputed.groupBy(valueCols.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .withColumn("__op", lit("u")).withColumn("__seq", lit(1L))
        val viewExists = Snapshots.latestVersion(spark, viewDir).isDefined
        val stale =
          if (!viewExists) fresh.limit(0)
          else Snapshots.read(spark, viewDir)
            .join(affected, joinKeys, "left_semi")
            .withColumn("__op", lit("d")).withColumn("__seq", lit(0L))
        val changes = stale.unionByName(fresh)
        // keys = the full value tuple (the Z-set identity); __n is the
        // value a same-tuple upsert replaces; file pruning AND file
        // clustering on the first join key — the merge range-partitions
        // its rewrite so view files keep tight, tiling key ranges, and
        // the next tick's CoW rewrites only the files its keys land in
        if (changes.isEmpty) None // churned keys join nothing, before and after
        else Snapshots.mergeStreamBatch(changes, viewDir, tick.t,
          keyCols = valueCols, opCol = "__op", seqCol = "__seq",
          pruneCol = Some(joinKeys.head), clusterBy = Some(joinKeys.head))
      }

    writeMarker(f, root, tick.copy(kind = "processed"))
    // intents at or below the new watermark are spent
    markers(f, root).filter(m => m.kind == "intent" && m.t <= tick.t)
      .foreach { m =>
        val name = f"intent-T${m.t}%06d-FL${m.fl}-FR${m.fr}-TL${m.tl}-TR${m.tr}"
        f.delete(new Path(root, name), false)
      }
    version
  }

  /** Incrementally-maintained GROUP BY view over ONE snapshot table:
    * `viewDir` holds per-group `sum_<c>` (exact decimal accumulators),
    * `__cnt`, and optionally `min_<c>`/`max_<c>`, current as of the
    * source's latest version. Built on [[Snapshots.consumeChanges]],
    * so each source version is folded in exactly once (write-ahead
    * marker + the view manifest's batch fence).
    *
    * Sums and counts are maintained PURELY from the change feed —
    * inserts add, deletes subtract, no source rescan ever; decimal
    * accumulation makes the fold exact and order-independent, so the
    * maintained totals equal a from-scratch aggregation bit for bit.
    * Min/max cannot be folded under deletes, so when `minMaxCols` is
    * set the affected GROUPS (only) are re-scanned from the source
    * as-of the consumed version — still O(churned groups), never
    * O(table). A group whose count reaches zero leaves the view.
    * Groups with NULL keys aggregate like SQL GROUP BY (null-safe
    * joins throughout). Returns the source versions folded this call. */
  def refreshAgg(spark: SparkSession, srcDir: String, viewDir: String,
                 groupKeys: Seq[String], sumCols: Seq[String],
                 sumScale: Int = 6,
                 minMaxCols: Seq[String] = Nil): Seq[Long] = {
    require(groupKeys.nonEmpty, "refreshAgg needs at least one group key")
    val stateDir = s"${viewDir.stripSuffix("/")}/_agg_state"
    Snapshots.consumeChanges(spark, srcDir, stateDir) { (changes, v) =>
      applyAggDelta(spark, srcDir, viewDir, groupKeys, sumCols, sumScale,
        minMaxCols, changes, v)
    }
  }

  private def applyAggDelta(spark: SparkSession, srcDir: String,
                            viewDir: String, groupKeys: Seq[String],
                            sumCols: Seq[String], sumScale: Int,
                            minMaxCols: Seq[String], changes: DataFrame,
                            v: Long): Unit = {
    val dec = s"decimal(30,$sumScale)"
    val sign = when(col("__change") === lit("insert"), lit(1)).otherwise(lit(-1))
    val dAggs = sumCols.map(c =>
      sum(sign * col(c).cast(dec)).cast(dec).as(s"__d_$c")) :+
      sum(sign.cast("long")).as("__d_cnt")
    val delta = changes.groupBy(groupKeys.map(col): _*)
      .agg(dAggs.head, dAggs.tail: _*)
    val affKeys = delta.select(groupKeys.map(col): _*).distinct()
    def nullSafeOn(a: String, b: String) =
      groupKeys.map(k => col(s"$a.$k") <=> col(s"$b.$k")).reduce(_ && _)

    val viewExists = Snapshots.latestVersion(spark, viewDir).isDefined
    val viewCols = groupKeys ++ sumCols.map(c => s"sum_$c") ++ Seq("__cnt") ++
      minMaxCols.flatMap(c => Seq(s"min_$c", s"max_$c"))
    val oldAff =
      if (!viewExists)
        // shape an empty frame with the view's schema (typed nulls)
        delta.limit(0).select(
          (groupKeys.map(col) ++
            sumCols.map(c => lit(null).cast(dec).as(s"sum_$c")) :+
            lit(null).cast("long").as("__cnt")) ++
            minMaxCols.flatMap(c => Seq(
              lit(null).cast(changes.schema(c).dataType).as(s"min_$c"),
              lit(null).cast(changes.schema(c).dataType).as(s"max_$c"))): _*)
      else Snapshots.read(spark, viewDir).as("vw")
        .join(affKeys.as("ak"), nullSafeOn("vw", "ak"), "left_semi")

    val folded = oldAff.as("o").join(delta.as("d"),
        nullSafeOn("o", "d"), "full_outer")
      .select(
        (groupKeys.map(k => coalesce(col(s"o.$k"), col(s"d.$k")).as(k)) ++
          sumCols.map(c =>
            (coalesce(col(s"o.sum_$c"), lit(0).cast(dec)) +
              coalesce(col(s"d.__d_$c"), lit(0).cast(dec)))
              .cast(dec).as(s"sum_$c")) :+
          (coalesce(col("o.__cnt"), lit(0L)) +
            coalesce(col("d.__d_cnt"), lit(0L))).as("__cnt")): _*)

    val withMm =
      if (minMaxCols.isEmpty) folded
      else {
        // min/max are not delta-foldable under deletes: re-scan just
        // the affected groups from the source AS-OF the consumed
        // version (pinned — a replay sees identical data)
        val srcAff = Snapshots.read(spark, srcDir, Some(v)).as("s")
          .join(affKeys.as("ak2"), nullSafeOn("s", "ak2"), "left_semi")
        val mmAggs = minMaxCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        val mm = srcAff.groupBy(groupKeys.map(col): _*)
          .agg(mmAggs.head, mmAggs.tail: _*)
        folded.as("f").join(mm.as("m"), nullSafeOn("f", "m"), "left_outer")
          .select((groupKeys ++ sumCols.map(c => s"sum_$c") :+ "__cnt")
            .map(c => col(s"f.$c")) ++
            minMaxCols.flatMap(c =>
              Seq(col(s"m.min_$c"), col(s"m.max_$c"))): _*)
      }

    val out = withMm
      .withColumn("__op", when(col("__cnt") === 0L, lit("d")).otherwise(lit("u")))
      .withColumn("__seq", lit(v))
      .select((viewCols :+ "__op" :+ "__seq").map(col): _*)
    Snapshots.mergeStreamBatch(out, viewDir, v,
      keyCols = groupKeys, opCol = "__op", seqCol = "__seq",
      pruneCol = Some(groupKeys.head), clusterBy = Some(groupKeys.head))
    ()
  }

  /** The view with multiplicities expanded back into duplicate rows —
    * exactly `left JOIN right USING (joinKeys)` as a plain DataFrame.
    * `__n` is bounded by the product of the inputs' per-key duplicate
    * counts; `array_repeat` expands it executor-side, no driver
    * round-trip. */
  def readExpanded(spark: SparkSession, viewDir: String): DataFrame = {
    val v = Snapshots.read(spark, viewDir)
    val dataCols = v.columns.filterNot(_ == "__n")
    v.withColumn("__r", explode(array_repeat(lit(1), col("__n").cast("int"))))
      .select(dataCols.map(col): _*)
  }
}
