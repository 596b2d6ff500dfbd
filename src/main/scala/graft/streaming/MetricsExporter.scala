package graft.streaming

import org.apache.spark.sql.Row

/** Prometheus export surface for the latency monitor's metric block —
  * name-for-name, label-for-label parity with the reference exporter
  * (latency-monitor MetricsExporter.scala:16-60: `/metrics` HTTP
  * endpoint over `com.sun.net.httpserver`, gauges
  * `streaming_latency_{avg,p50,p95,p99,min,max,stddev}_ms` and
  * `streaming_sample_count`, each labeled
  * `{throughput="<target msg/s>"}`).
  *
  * The metric VALUES come from the engine's own distributed
  * aggregation ([[graft.operators.Relational.distributionStats]], one
  * exact-decimal pass) — this object only renders a driver-side row
  * of that output and serves it; no metric math happens here. */
object MetricsExporter {

  /** The reference's LatencyMetrics record (latency-monitor
    * models/Models.scala:21-32), minus the free-text timestamp. */
  case class LatencyMetrics(
      avgLatencyMs: Double,
      p50LatencyMs: Double,
      p95LatencyMs: Double,
      p99LatencyMs: Double,
      minLatencyMs: Double,
      maxLatencyMs: Double,
      stdDevLatencyMs: Double,
      sampleCount: Long,
      testThroughput: Int)

  private def num(row: Row, field: String): Double = row.get(row.fieldIndex(field)) match {
    case null => Double.NaN
    case d: java.math.BigDecimal => d.doubleValue()
    case n: Number => n.doubleValue()
    case other => other.toString.toDouble
  }

  /** Lift one output row of `Relational.distributionStats` (columns
    * avg_v/p50_v/p95_v/p99_v/min_v/max_v/stddev_v/sample_count) into
    * the exporter's record. */
  def fromStatsRow(row: Row, testThroughput: Int): LatencyMetrics =
    LatencyMetrics(
      avgLatencyMs = num(row, "avg_v"),
      p50LatencyMs = num(row, "p50_v"),
      p95LatencyMs = num(row, "p95_v"),
      p99LatencyMs = num(row, "p99_v"),
      minLatencyMs = num(row, "min_v"),
      maxLatencyMs = num(row, "max_v"),
      stdDevLatencyMs = num(row, "stddev_v"),
      sampleCount = row.getAs[Number]("sample_count").longValue(),
      testThroughput = testThroughput)

  /** Prometheus text exposition — the reference's exact metric names,
    * HELP/TYPE lines, label set, and block layout
    * (MetricsExporter.generatePrometheusMetrics). */
  def render(m: LatencyMetrics): String = {
    val t = m.testThroughput
    s"""
       |# HELP streaming_latency_avg_ms Average end-to-end latency in milliseconds
       |# TYPE streaming_latency_avg_ms gauge
       |streaming_latency_avg_ms{throughput="$t"} ${m.avgLatencyMs}
       |
       |# HELP streaming_latency_p50_ms Median (P50) latency in milliseconds
       |# TYPE streaming_latency_p50_ms gauge
       |streaming_latency_p50_ms{throughput="$t"} ${m.p50LatencyMs}
       |
       |# HELP streaming_latency_p95_ms P95 latency in milliseconds
       |# TYPE streaming_latency_p95_ms gauge
       |streaming_latency_p95_ms{throughput="$t"} ${m.p95LatencyMs}
       |
       |# HELP streaming_latency_p99_ms P99 latency in milliseconds
       |# TYPE streaming_latency_p99_ms gauge
       |streaming_latency_p99_ms{throughput="$t"} ${m.p99LatencyMs}
       |
       |# HELP streaming_latency_min_ms Minimum latency in milliseconds
       |# TYPE streaming_latency_min_ms gauge
       |streaming_latency_min_ms{throughput="$t"} ${m.minLatencyMs}
       |
       |# HELP streaming_latency_max_ms Maximum latency in milliseconds
       |# TYPE streaming_latency_max_ms gauge
       |streaming_latency_max_ms{throughput="$t"} ${m.maxLatencyMs}
       |
       |# HELP streaming_latency_stddev_ms Standard deviation of latency
       |# TYPE streaming_latency_stddev_ms gauge
       |streaming_latency_stddev_ms{throughput="$t"} ${m.stdDevLatencyMs}
       |
       |# HELP streaming_sample_count Number of latency samples collected
       |# TYPE streaming_sample_count gauge
       |streaming_sample_count{throughput="$t"} ${m.sampleCount}
       |""".stripMargin
  }

  /** Serve `/metrics` on `port` (0 = ephemeral, read the bound port
    * off the returned server). Pure JDK (`com.sun.net.httpserver`),
    * re-renders on every scrape from the supplied thunk so a
    * long-running job can refresh the served metrics. Caller owns the
    * lifecycle: `server.stop(0)` when done — opt-in only (in Bench the
    * flag is the SPARK_GRAFT_METRICS_PORT env var), never started
    * implicitly. */
  def serve(metrics: () => LatencyMetrics, port: Int): com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)
    server.createContext("/metrics", new com.sun.net.httpserver.HttpHandler {
      def handle(exchange: com.sun.net.httpserver.HttpExchange): Unit = {
        val body = render(metrics()).getBytes("UTF-8")
        exchange.sendResponseHeaders(200, body.length.toLong)
        val os = exchange.getResponseBody
        try os.write(body) finally os.close()
      }
    })
    server.setExecutor(null)
    server.start()
    server
  }
}
