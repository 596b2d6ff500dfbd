package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Exact

/** The reference notebook's price-prediction FEATURE MATRIX as one
  * verified composition — price_prediction.ipynb "Data preparation" +
  * "Data Analysis" (cells 6–14): four per-source time series
  * (day-ahead price, consumption, sunlight, wind), each normalized to
  * a common datetime axis and tagged with a derived DK area
  * (`calculate_dk_area`), outer-merged on datetime, forward-filled
  * (`merged.ffill()`), then reduced to the numeric Pearson
  * correlation matrix (`merged.select_dtypes("number").corr()`).
  *
  * Every stage is an already-oracled operator — the point of this
  * object is the COMPOSITION, verified end-to-end as `q_feature_matrix`
  * against a DuckDB oracle that rebuilds the same frame:
  *  - per-series aggregation   ≙ q_pivot's exact-decimal cells,
  *  - outer datetime merge     ≙ the notebook's `join(how='outer')`,
  *    spelled spine + left joins so both engines share one plan shape,
  *  - forward fill             ≙ [[Relational.forwardFill]],
  *  - area derivation          ≙ the ipynb `calculate_dk_area` split
  *    (parity of the actor id, the same derivation q_pivot uses),
  *  - correlation matrix       ≙ [[Relational.corrMatrixBy]] per area.
  *
  * Scale: the raw event stream passes through ONE map-side-combined
  * `groupBy(hour, area)` per series — the only stage that touches
  * full-volume data. Everything after (spine union, outer merge,
  * window fill, correlation) runs on the AGGREGATED hourly frame,
  * whose size is O(hours × areas) — ~88k rows per area per DECADE —
  * independent of event volume, so the 2-partition fill window is a
  * driver-sized detail, not a skew hazard. The correlation is one
  * further aggregation pass (k + k(k+1)/2 exact sums per area).
  *
  * Fidelity note: pandas `.corr()` uses pairwise-complete rows;
  * [[corrByArea]] uses listwise-complete (rows where every filled
  * series exists). After a forward fill the two differ only in each
  * area's leading rows (before a series' first observation), and
  * listwise keeps the matrix a single exact-sum pass that two engines
  * reproduce bit-for-bit. [[corrByAreaPairwise]] is the exact
  * `.corr()` replay — per-pair complete rows over the UNfiltered
  * filled frame ([[Relational.corrMatrixPairwiseBy]], still one
  * pass) — for users who need the leading-edge cells to match pandas
  * bit-for-bit too.
  */
object FeatureMatrix {

  /** The notebook's four numeric feature series, in matrix order. */
  val SeriesCols: Seq[String] = Seq("price", "consumption", "sunlight", "wind")

  private def series(src: DataFrame, eventType: String, name: String,
                     sumAgg: Boolean): DataFrame = {
    val cell =
      if (sumAgg) Exact.round2(Exact.sumExact(col("value")))
      else Exact.round2(Exact.avgExact(col("value")))
    src.filter(col("event_type") === eventType)
      .groupBy("hour", "area").agg(cell.as(name))
  }

  /** The merged + forward-filled hourly frame
    * `(hour, area, price, consumption, sunlight, wind)`, complete
    * cases only — the notebook's `merged` DataFrame after `ffill()`,
    * keyed like its datetime index with the derived DK area.
    * Consumption aggregates as a SUM (the notebook sums kWh across
    * municipalities); the other series as exact means. */
  def hourlyFrame(events: DataFrame): DataFrame =
    hourlyFrameAll(events)
      .filter(SeriesCols.map(col(_).isNotNull).reduce(_ && _))

  /** The filled frame WITHOUT the trailing complete-case filter:
    * still carrying each area's leading-edge NULLs (hours before a
    * series' first observation) — the exact frame pandas' `.corr()`
    * sees. */
  def hourlyFrameAll(events: DataFrame): DataFrame = {
    val src = events.select(
      date_trunc("hour", col("ts")).as("hour"),
      when(col("user_id") % 2 === 0, lit("1")).otherwise(lit("2")).as("area"),
      col("event_type"), col("value"))
    val all = Seq(
      series(src, "purchase", "price", sumAgg = false),
      series(src, "click", "consumption", sumAgg = true),
      series(src, "view", "sunlight", sumAgg = false),
      series(src, "signup", "wind", sumAgg = false))
    // the outer-merge key spine — one scan, not a union of the four
    // aggregated key sets: an (hour, area) is in some series iff it
    // has at least one event of that series' type, so DISTINCT over
    // the type-filtered source is the same set (plan audit: 8 events
    // scans → 5)
    val spine = src
      .filter(col("event_type").isin("purchase", "click", "view", "signup"))
      .select("hour", "area").distinct()
    val merged = all.foldLeft(spine)((acc, s) =>
      acc.join(s, Seq("hour", "area"), "left"))
    Relational.forwardFill(merged, Seq("area"), "hour", SeriesCols)
  }

  /** The notebook's final artifact: the per-area correlation matrix of
    * the filled feature frame, as `(area, col_x, col_y, corr_v)`. */
  def corrByArea(events: DataFrame): DataFrame =
    Relational.corrMatrixBy(hourlyFrame(events), Seq("area"), SeriesCols)

  /** pandas-semantics twin: per-pair complete rows over the unfiltered
    * filled frame — matches `.corr()` on frames with late-starting
    * series, leading-edge cells included. */
  def corrByAreaPairwise(events: DataFrame): DataFrame =
    Relational.corrMatrixPairwiseBy(hourlyFrameAll(events), Seq("area"),
      SeriesCols)
}
