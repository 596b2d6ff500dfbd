package graft

import org.apache.spark.sql.functions._

/** Proves the SQL-only migration path: the reference's ksqlDB script
  * (ksqldb-consumer profiles/low_latency.sql) ports to a pure Spark
  * SQL string — window TVF for WINDOW TUMBLING, date_format for
  * TIMESTAMPTOSTRING, max_by for LATEST_BY_OFFSET, plus graft's
  * injected functions — and produces exactly what the DataFrame
  * builder produces. A ksqlDB user can bring their .sql file, not
  * learn a new API.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("the ksqlDB profile as one Spark SQL string == the DataFrame builder") {
    Tables.events(spark, sf("sf0.001")).createOrReplaceTempView("weather_events")
    // low_latency.sql:5-27, translated clause by clause
    val sql = spark.sql(
      """SELECT
        |  date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS window_start,
        |  date_format(window.end, 'yyyy-MM-dd HH:mm:ss') AS window_end,
        |  event_type,
        |  floor(cast(sum(cast(value AS DECIMAL(30,2))) AS DOUBLE) / count(1) * 100 + 0.5) / 100 AS avg_value,
        |  min(value) AS min_value,
        |  max(value) AS max_value,
        |  count(1) AS message_count,
        |  min(event_id) AS min_ord
        |FROM weather_events
        |GROUP BY window(ts, '1 hour'), event_type""".stripMargin)
    val dsl = operators.Windows.tumblingAgg(
      Tables.events(spark, sf("sf0.001")),
      "ts", Seq("event_type"), "value", "event_id", "1 hour")
    assert(sql.collect().map(_.toSeq).toSet == dsl.collect().map(_.toSeq).toSet)
    assert(sql.count() > 0)
  }

  test("graft's custom expressions are first-class in SQL (cosine ranking query)") {
    Tables.embeddings(spark, sf("sf0.001")).createOrReplaceTempView("emb")
    val r = spark.sql(
      """SELECT a.vec_id, b.vec_id AS other, graft_cosine(a.embedding, b.embedding) AS cos
        |FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id BETWEEN 1 AND 20
        |ORDER BY cos DESC LIMIT 3""".stripMargin).collect()
    assert(r.length == 3)
    assert(r.map(_.getDouble(2)).toSeq == r.map(_.getDouble(2)).sortBy(-_).toSeq)
  }
}
