package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch rollup tables — the pre-aggregation pattern that makes
  * distinct-count / quantile dashboards affordable at 100 TB.
  *
  * The raw-data answer to "distinct users per type per week" rescans
  * the fact table for every granularity. The sketch-table answer
  * scans ONCE, emitting one bounded binary sketch per fine-grained
  * cell (theta + HLL for distinct counts, KLL for quantiles), and
  * every coarser rollup — any key subset, any date range — is a merge
  * of the stored sketches: no raw-data rescan, shuffle rows = cells,
  * state per cell = O(k) bytes regardless of row count. Sketch
  * merging is LOSSLESS in sketch space (union of theta/HLL sketches
  * ≡ sketch of the union; KLL merge obeys the same rank-error bound),
  * so rollups never compound error. All sketches are Apache
  * DataSketches binaries via Spark's built-in codegen aggregates
  * (`theta_sketch_agg` etc.) — portable to any DataSketches runtime,
  * no UDFs, no driver-side state.
  *
  * Exactness regimes (what the oracles exploit): a theta sketch
  * below its nominal-entries capacity (4096 at the default lgK=12)
  * never samples, so `theta_sketch_estimate` is the EXACT distinct
  * count, and union/intersection/difference estimates are exact set
  * cardinalities; a KLL sketch holds every value while n ≤ k, so its
  * quantiles are exact order statistics. Above capacity the same
  * code degrades gracefully to the published error bounds (theta/HLL
  * ~1.6%/√k RSE; KLL ~1.33%/k rank error) — the specs pin the exact
  * regime bit-for-bit and bound the sampling regime.
  *
  * Reference scope: ksqlDB exposes HLL-style distinct sketches via
  * COUNT_DISTINCT's implementation; the rollup-table pattern itself
  * is the standard large-scale extension (druid/pinot-style
  * pre-aggregation) a reference user needs at 100 TB.
  */
object Sketches {

  /** One-pass distinct-count sketch table: one row per `keys` cell
    * with theta + HLL sketches of `col` and the cell's row count.
    * Persist this (parquet handles the binary columns natively);
    * every later rollup reads it instead of the raw table. */
  def distinctSketchTable(df: DataFrame, keys: Seq[String], idCol: String,
                          lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(c => df(c)): _*)
      .agg(
        theta_sketch_agg(df(idCol), lgK).as(s"${idCol}_theta"),
        hll_sketch_agg(df(idCol), lgK).as(s"${idCol}_hll"),
        count(lit(1L)).as("n_rows"))

  /** Roll a distinct sketch table up to `subKeys`: merge the stored
    * sketches, estimate both ways. Theta estimates round to LONG —
    * exact below capacity, and the long keeps the column an integer
    * kind for engine-portable comparison. `lgK` must match the build
    * (the union gate is sized by it). */
  def rollupDistinct(sketches: DataFrame, subKeys: Seq[String], idCol: String,
                     lgK: Int = 12): DataFrame =
    sketches.groupBy(subKeys.map(c => sketches(c)): _*)
      .agg(
        theta_sketch_estimate(theta_union_agg(sketches(s"${idCol}_theta"), lgK))
          .as(s"${idCol}_distinct_theta"),
        hll_sketch_estimate(hll_union_agg(sketches(s"${idCol}_hll")))
          .as(s"${idCol}_distinct_hll"),
        sum(sketches("n_rows")).as("n_rows"))

  /** Pairwise cohort overlap from a distinct sketch table: for every
    * ordered pair of `keyCol` cells (a < b), the exact-regime
    * |A|, |B|, |A ∪ B|, |A ∩ B|, |A \ B| — the "users who did BOTH /
    * EITHER / ONLY-ONE" analysis WITHOUT joining raw data: the sketch
    * table has one bounded row per cell, so the pair join is bounded
    * metadata however large the fact table was. */
  def cohortOverlap(sketches: DataFrame, keyCol: String, idCol: String,
                    maxCohorts: Int = 10000): DataFrame = {
    // The pair join below is an inequality join — a nested-loop plan
    // that is quadratic in the number of cohort cells. That is exactly
    // right for its intended input (one bounded sketch row per cohort:
    // metadata, like a manifest), and exactly wrong for a
    // high-cardinality key, where it would silently go n². Fail fast
    // with the actual count instead; the cap is generous for any
    // "cohort" worth pairwise analysis (10k cohorts = 50M pairs).
    val nCohorts = sketches.select(keyCol).distinct().count()
    require(nCohorts <= maxCohorts,
      s"cohortOverlap pairs every two '$keyCol' cells — $nCohorts cells would " +
        s"produce ~${nCohorts * nCohorts / 2} pairs via a nested-loop join. " +
        s"This operator is for metadata-sized cohort keys (<= $maxCohorts); " +
        "aggregate the sketch table to a coarser key first, or raise maxCohorts " +
        "deliberately.")
    val a = sketches.select(
      sketches(keyCol).as("cohort_a"), sketches(s"${idCol}_theta").as("__sa"))
    val b = sketches.select(
      sketches(keyCol).as("cohort_b"), sketches(s"${idCol}_theta").as("__sb"))
    a.join(b, a("cohort_a") < b("cohort_b"))
      .select(
        a("cohort_a"), b("cohort_b"),
        theta_sketch_estimate(col("__sa")).as("n_a"),
        theta_sketch_estimate(col("__sb")).as("n_b"),
        theta_sketch_estimate(
          theta_union(col("__sa"), col("__sb"))).as("n_union"),
        theta_sketch_estimate(
          theta_intersection(col("__sa"), col("__sb"))).as("n_intersect"),
        theta_sketch_estimate(
          theta_difference(col("__sa"), col("__sb"))).as("n_only_a"))
  }

  /** Streaming twin of [[distinctSketchTable]] keyed by event-time
    * window: the theta/HLL buffers are TypedImperativeAggregates, so
    * they live in the streaming state store (RocksDB by default in
    * [[graft.GraftSession]]) with O(k)-byte state per open window ×
    * key, merged map-side per micro-batch; the watermark evicts
    * closed windows. The output rows are sketch-TABLE rows — append
    * them to the stored table and historical rollups via
    * [[rollupDistinct]] include the live data with no batch backfill.
    * On a batch frame the watermark is a no-op and the result is the
    * exact batch windowed sketch table (the parity the spec drains). */
  def distinctSketchStream(df: DataFrame, tsCol: String, windowSize: String,
                           keys: Seq[String], idCol: String, lgK: Int = 12,
                           watermarkDelay: String = "2 minutes"): DataFrame = {
    val marked =
      if (df.isStreaming) df.withWatermark(tsCol, watermarkDelay) else df
    marked
      .groupBy(window(col(tsCol), windowSize) +: keys.map(col): _*)
      .agg(
        theta_sketch_agg(col(idCol), lgK).as(s"${idCol}_theta"),
        hll_sketch_agg(col(idCol), lgK).as(s"${idCol}_hll"),
        count(lit(1L)).as("n_rows"))
      .select(col("window.start").as("window_start") +: keys.map(col) :+
        col(s"${idCol}_theta") :+ col(s"${idCol}_hll") :+ col("n_rows"): _*)
  }

  /** One-pass quantile sketch table: one KLL(double) sketch of
    * `valueCol` per `keys` cell. With k ≥ the largest cell's row
    * count the sketch holds every value and quantiles are exact;
    * above that the DataSketches rank-error bound applies. */
  def quantileSketchTable(df: DataFrame, keys: Seq[String], valueCol: String,
                          k: Int = 2048): DataFrame =
    df.groupBy(keys.map(c => df(c)): _*)
      .agg(kll_sketch_agg_double(df(valueCol), k).as(s"${valueCol}_kll"),
        count(lit(1L)).as("n_rows"))

  /** Roll a quantile sketch table up to `subKeys` and read the given
    * quantiles from the merged sketch (DataSketches inclusive-rank
    * semantics: the smallest item whose inclusive rank ≥ p — in the
    * exact regime, the order statistic at ceil(p·n)). */
  def rollupQuantiles(sketches: DataFrame, subKeys: Seq[String],
                      valueCol: String, ps: Seq[Double], k: Int = 2048): DataFrame = {
    val merged = sketches.groupBy(subKeys.map(c => sketches(c)): _*)
      .agg(kll_merge_agg_double(sketches(s"${valueCol}_kll"), k).as("__m"),
        sum(sketches("n_rows")).as("n_rows"))
    val qs = ps.map(p =>
      kll_sketch_get_quantile_double(col("__m"), lit(p))
        .as(s"${valueCol}_p${(p * 100).round}"))
    merged.select(subKeys.map(c => merged(c)) ++ qs :+ merged("n_rows"): _*)
  }
}
