package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference pipeline's core: tumbling-window multi-agg over an
    * event stream (SparkWeatherConsumer.scala:246-271). */
  def entry(spark: SparkSession): DataFrame =
    Windows.tumblingAgg(
      Tables.events(spark, "/root/testdata/sf0.001"),
      tsCol = "ts", keys = Seq("event_type"), valueCol = "value",
      ordCol = "event_id", size = "1 hour")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_tumbling" -> ((s, dir) =>
      Windows.tumblingAgg(Tables.events(s, dir),
        "ts", Seq("event_type", "user_id"), "value", "event_id", "1 hour")),

    "q_window_union" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // Mirror of the reference's two-topic union (wind + sunshine →
      // one aggregation): two disjoint filtered streams, unioned,
      // then windowed (SparkWeatherConsumer.scala:90-99,232).
      val a = ev.filter(org.apache.spark.sql.functions.col("event_type").isin("view", "click"))
      val b = ev.filter(org.apache.spark.sql.functions.col("event_type").isin("purchase", "signup"))
      Windows.tumblingAgg(Windows.unionAll(Seq(a, b)),
        "ts", Seq("event_type"), "value", "event_id", "6 hours")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_window_tumbling" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       strftime(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour', '%Y-%m-%d %H:%M:%S') AS window_end,
        |       event_type, user_id,
        |       floor((CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) / count(*)) * 100 + 0.5) / 100 AS avg_value,
        |       min(value) AS min_value,
        |       max(value) AS max_value,
        |       count(*) AS message_count,
        |       min(event_id) AS min_ord
        |FROM events GROUP BY ALL""".stripMargin,

    "q_window_union" ->
      """SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       strftime(time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours', '%Y-%m-%d %H:%M:%S') AS window_end,
        |       event_type,
        |       floor((CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) / count(*)) * 100 + 0.5) / 100 AS avg_value,
        |       min(value) AS min_value,
        |       max(value) AS max_value,
        |       count(*) AS message_count,
        |       min(event_id) AS min_ord
        |FROM (SELECT * FROM events WHERE event_type IN ('view','click')
        |      UNION ALL
        |      SELECT * FROM events WHERE event_type IN ('purchase','signup'))
        |GROUP BY ALL""".stripMargin
  )
}
