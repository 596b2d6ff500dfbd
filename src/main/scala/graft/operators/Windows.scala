package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed aggregation — the reference's core operator.
  *
  * Mirrors the semantics of the reference consumer's windowed
  * aggregation (spark-consumer SparkWeatherConsumer.scala:225-271 and
  * ksqldb-consumer profiles/low_latency.sql): group a (possibly
  * unioned) event stream by a time window plus key columns, compute
  * avg/min/max rounded to 2 decimals, a message count, and the
  * earliest ordering stamp in the window, then emit window bounds as
  * formatted strings.
  *
  * The exact same builders work for batch DataFrames and Structured
  * Streaming DataFrames (add a watermark upstream for streaming);
  * see graft.streaming.WeatherPipeline.
  *
  * Scale notes: `groupBy(window(...), keys)` is a hash aggregation —
  * Spark plans a partial (map-side) aggregate before the shuffle, so
  * per-(window,key) state is combined locally first; AQE coalesces
  * post-shuffle partitions. No driver-side state, no collect().
  */
object Windows {

  /** Which clock drives the window, mirroring the reference's
    * USE_EVENT_TIME switch (SparkWeatherConsumer.scala:236-243). */
  sealed trait AggTime
  case object EventTime extends AggTime
  case object ProcessingTime extends AggTime

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  /** The reference's aggregate list over a window struct column.
    * `extraAggs` lets callers append further aggregates the way the
    * ksqlDB profile mixes LATEST_BY_OFFSET / MAX(ROWTIME) into the
    * same windowed SELECT (low_latency.sql:10-22); `tsFmt` matches
    * TIMESTAMPTOSTRING's pattern argument. */
  private def aggAndFormat(
      grouped: org.apache.spark.sql.RelationalGroupedDataset,
      keys: Seq[String],
      valueCol: String,
      ordCol: String,
      extraAggs: Seq[(Column, String)],
      tsFmt: String): DataFrame = {
    // avg rounded to 2 like the reference; min/max of 2-decimal data
    // are already 2-decimal so the reference's round is an identity.
    val out = grouped.agg(
      graft.functions.Exact.round2(graft.functions.Exact.avgExact(col(valueCol))).as("avg_value"),
      (Seq(
        min(valueCol).as("min_value"),
        max(valueCol).as("max_value"),
        count(lit(1)).as("message_count"),
        min(ordCol).as("min_ord")
      ) ++ extraAggs.map { case (c, alias) => c.as(alias) }): _*
    )
    out.select(
      (Seq(
        date_format(col("window.start"), tsFmt).as("window_start"),
        date_format(col("window.end"), tsFmt).as("window_end")
      ) ++ (keys ++ Seq("avg_value", "min_value", "max_value",
        "message_count", "min_ord") ++ extraAggs.map(_._2)).map(col)): _*
    )
  }

  /** Tumbling windows (WINDOW TUMBLING in the ksqlDB profile). */
  def tumblingAgg(
      events: DataFrame,
      tsCol: String,
      keys: Seq[String],
      valueCol: String,
      ordCol: String,
      size: String,
      extraAggs: Seq[(Column, String)] = Nil,
      tsFmt: String = TsFmt): DataFrame =
    aggAndFormat(
      events.groupBy((window(col(tsCol), size) +: keys.map(col)): _*),
      keys, valueCol, ordCol, extraAggs, tsFmt)

  /** Hopping windows (WINDOW HOPPING): each event lands in
    * size/slide overlapping windows. */
  def hoppingAgg(
      events: DataFrame,
      tsCol: String,
      keys: Seq[String],
      valueCol: String,
      ordCol: String,
      size: String,
      slide: String,
      extraAggs: Seq[(Column, String)] = Nil,
      tsFmt: String = TsFmt): DataFrame =
    aggAndFormat(
      events.groupBy((window(col(tsCol), size, slide) +: keys.map(col)): _*),
      keys, valueCol, ordCol, extraAggs, tsFmt)

  /** Session windows (WINDOW SESSION): gap-based, per key. */
  def sessionAgg(
      events: DataFrame,
      tsCol: String,
      keys: Seq[String],
      valueCol: String,
      ordCol: String,
      gap: String,
      extraAggs: Seq[(Column, String)] = Nil,
      tsFmt: String = TsFmt): DataFrame =
    aggAndFormat(
      events.groupBy((session_window(col(tsCol), gap).as("window") +: keys.map(col)): _*),
      keys, valueCol, ordCol, extraAggs, tsFmt)

  /** Union N homogeneous source streams before aggregating — the
    * reference unions its wind + sunshine streams
    * (SparkWeatherConsumer.scala:232). Union is a no-shuffle plan
    * node; the single downstream aggregation shuffles once. */
  def unionAll(streams: Seq[DataFrame]): DataFrame =
    streams.reduce(_.unionByName(_))

  /** Stamp a processing-time column (reference's processing-time
    * mode adds current_timestamp(); .scala:243). Kept separate so
    * event-time plans stay deterministic/testable. */
  def withClock(df: DataFrame, mode: AggTime, tsCol: String): (DataFrame, String) =
    mode match {
      case EventTime      => (df, tsCol)
      case ProcessingTime => (df.withColumn("processing_time", current_timestamp()), "processing_time")
    }
}
