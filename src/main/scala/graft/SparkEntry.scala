package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Oracle discipline (SURVEY.md §5): aliases identical on both sides;
  * doubles either bit-identical by construction (graft.functions.Exact)
  * or rounded with the engine-portable floor formula on both sides.
  */
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
    // ---- reference streaming surface (SURVEY §2.1), batch-verified ----
    "q_window_tumbling" -> ((s, dir) =>
      Windows.tumblingAgg(Tables.events(s, dir),
        "ts", Seq("event_type", "user_id"), "value", "event_id", "1 hour")),

    "q_window_union" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // Mirror of the reference's two-topic union (wind + sunshine →
      // one aggregation, SparkWeatherConsumer.scala:90-99,232).
      val a = ev.filter(col("event_type").isin("view", "click"))
      val b = ev.filter(col("event_type").isin("purchase", "signup"))
      Windows.tumblingAgg(Windows.unionAll(Seq(a, b)),
        "ts", Seq("event_type"), "value", "event_id", "6 hours")
    }),

    "q_window_hopping" -> ((s, dir) =>
      Windows.hoppingAgg(Tables.events(s, dir),
        "ts", Seq("event_type"), "value", "event_id", "2 hours", "1 hour")),

    "q_window_session" -> ((s, dir) =>
      Windows.sessionAgg(Tables.events(s, dir),
        "ts", Seq("user_id"), "value", "event_id", "30 minutes")),

    "q_latest_by_offset" -> ((s, dir) =>
      Relational.latestByOffset(Tables.events(s, dir),
        keys = Seq("user_id"), offsetCol = "event_id",
        valueCols = Seq("value", "event_type"))),

    "q_latency_stats" -> ((s, dir) =>
      Relational.distributionStats(Tables.events(s, dir),
        keys = Seq("event_type"), valueCol = "value")),

    "q_latency_report" -> ((s, dir) =>
      Relational.latencyReport(Tables.events(s, dir),
        tsCol = "ts", keys = Seq("user_id"), windowSize = "1 hour")),

    "q_event_json" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          (sum(col("k")).cast("double") / count(lit(1L))).as("avg_k"),
          count(lit(1L)).as("n")))
  )

  // ---- oracle SQL (DuckDB dialect) ----

  /** Engine-portable formulas shared by many oracles (see
    * graft.functions.Exact for the Spark side + rationale). */
  private def round2(x: String) = s"floor(($x) * 100 + 0.5) / 100"
  private def round4(x: String) = s"floor(($x) * 10000 + 0.5) / 10000"
  private def sumExact(x: String, scale: Int = 2) =
    s"CAST(sum(CAST($x AS DECIMAL(30,$scale))) AS DOUBLE)"
  private val fmt = "'%Y-%m-%d %H:%M:%S'"

  /** The reference agg list (avg/min/max/count/min-offset) in DuckDB. */
  private def windowAggs = s"""
    |       ${round2(s"${sumExact("value")} / count(*)")} AS avg_value,
    |       min(value) AS min_value,
    |       max(value) AS max_value,
    |       count(*) AS message_count,
    |       min(event_id) AS min_ord""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_window_tumbling" ->
      s"""SELECT strftime(time_bucket(INTERVAL '1 hour', ts), $fmt) AS window_start,
         |       strftime(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour', $fmt) AS window_end,
         |       event_type, user_id,$windowAggs
         |FROM events GROUP BY ALL""".stripMargin,

    "q_window_union" ->
      s"""SELECT strftime(time_bucket(INTERVAL '6 hours', ts), $fmt) AS window_start,
         |       strftime(time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours', $fmt) AS window_end,
         |       event_type,$windowAggs
         |FROM (SELECT * FROM events WHERE event_type IN ('view','click')
         |      UNION ALL
         |      SELECT * FROM events WHERE event_type IN ('purchase','signup'))
         |GROUP BY ALL""".stripMargin,

    "q_window_hopping" ->
      s"""WITH hopped AS (
         |  SELECT *, time_bucket(INTERVAL '1 hour', ts) AS ws FROM events
         |  UNION ALL
         |  SELECT *, time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour' AS ws FROM events
         |)
         |SELECT strftime(ws, $fmt) AS window_start,
         |       strftime(ws + INTERVAL '2 hours', $fmt) AS window_end,
         |       event_type,$windowAggs
         |FROM hopped GROUP BY ALL""".stripMargin,

    "q_window_session" ->
      s"""WITH s AS (
         |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
         |                   OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
         |                 THEN 1 ELSE 0 END AS new_sess
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         |), g AS (
         |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
         |                                ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM s
         |)
         |SELECT strftime(min(ts), $fmt) AS window_start,
         |       strftime(max(ts) + INTERVAL '30 minutes', $fmt) AS window_end,
         |       user_id,$windowAggs
         |FROM g GROUP BY user_id, sess""".stripMargin,

    "q_latest_by_offset" ->
      """SELECT user_id,
        |       arg_max(value, event_id) AS latest_value,
        |       arg_max(event_type, event_id) AS latest_event_type,
        |       max(event_id) AS last_offset,
        |       count(*) AS row_count
        |FROM events GROUP BY user_id""".stripMargin,

    "q_latency_stats" ->
      s"""SELECT event_type,
         |       ${sumExact("value")} / count(*) AS avg_v,
         |       ${round4("quantile_cont(value, 0.5)")} AS p50_v,
         |       ${round4("quantile_cont(value, 0.95)")} AS p95_v,
         |       ${round4("quantile_cont(value, 0.99)")} AS p99_v,
         |       min(value) AS min_v,
         |       max(value) AS max_v,
         |       sqrt((${sumExact("value*value", 4)} - ${sumExact("value")} * ${sumExact("value")} / count(*)) / (count(*) - 1)) AS stddev_v,
         |       count(*) AS sample_count
         |FROM events GROUP BY event_type""".stripMargin,

    "q_latency_report" ->
      """WITH w AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, user_id,
        |         epoch_ns(max(ts)) // 1000000 - epoch_ns(min(ts)) // 1000000 AS latency_ms
        |  FROM events GROUP BY 1, 2
        |), v AS (
        |  SELECT latency_ms FROM w WHERE latency_ms > 0 AND latency_ms < 600000
        |)
        |SELECT CAST(sum(latency_ms) AS DOUBLE) / count(*) AS avg_latency_ms,
        |       quantile_cont(latency_ms, 0.5) AS p50_latency_ms,
        |       quantile_cont(latency_ms, 0.95) AS p95_latency_ms,
        |       quantile_cont(latency_ms, 0.99) AS p99_latency_ms,
        |       min(latency_ms) AS min_latency_ms,
        |       max(latency_ms) AS max_latency_ms,
        |       sqrt((CAST(sum(latency_ms*latency_ms) AS DOUBLE) - CAST(sum(latency_ms) AS DOUBLE) * CAST(sum(latency_ms) AS DOUBLE) / count(*)) / (count(*) - 1)) AS stddev_latency_ms,
        |       count(*) AS sample_count
        |FROM v""".stripMargin,

    "q_event_json" ->
      """SELECT event_type,
        |       sum(k) AS sum_k, min(k) AS min_k, max(k) AS max_k,
        |       CAST(sum(k) AS DOUBLE) / count(*) AS avg_k,
        |       count(*) AS n
        |FROM (SELECT event_type,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type""".stripMargin
  )
}
