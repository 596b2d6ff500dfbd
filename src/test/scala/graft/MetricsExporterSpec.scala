package graft

import graft.operators.Relational
import graft.streaming.MetricsExporter
import graft.streaming.MetricsExporter.LatencyMetrics

class MetricsExporterSpec extends SparkSpec {

  test("exposition format matches the reference exporter line for line") {
    val m = LatencyMetrics(
      avgLatencyMs = 12.5, p50LatencyMs = 10.0, p95LatencyMs = 31.0,
      p99LatencyMs = 44.0, minLatencyMs = 2.0, maxLatencyMs = 50.0,
      stdDevLatencyMs = 9.25, sampleCount = 1000L, testThroughput = 100)
    val expected =
      s"""
         |# HELP streaming_latency_avg_ms Average end-to-end latency in milliseconds
         |# TYPE streaming_latency_avg_ms gauge
         |streaming_latency_avg_ms{throughput="100"} 12.5
         |
         |# HELP streaming_latency_p50_ms Median (P50) latency in milliseconds
         |# TYPE streaming_latency_p50_ms gauge
         |streaming_latency_p50_ms{throughput="100"} 10.0
         |
         |# HELP streaming_latency_p95_ms P95 latency in milliseconds
         |# TYPE streaming_latency_p95_ms gauge
         |streaming_latency_p95_ms{throughput="100"} 31.0
         |
         |# HELP streaming_latency_p99_ms P99 latency in milliseconds
         |# TYPE streaming_latency_p99_ms gauge
         |streaming_latency_p99_ms{throughput="100"} 44.0
         |
         |# HELP streaming_latency_min_ms Minimum latency in milliseconds
         |# TYPE streaming_latency_min_ms gauge
         |streaming_latency_min_ms{throughput="100"} 2.0
         |
         |# HELP streaming_latency_max_ms Maximum latency in milliseconds
         |# TYPE streaming_latency_max_ms gauge
         |streaming_latency_max_ms{throughput="100"} 50.0
         |
         |# HELP streaming_latency_stddev_ms Standard deviation of latency
         |# TYPE streaming_latency_stddev_ms gauge
         |streaming_latency_stddev_ms{throughput="100"} 9.25
         |
         |# HELP streaming_sample_count Number of latency samples collected
         |# TYPE streaming_sample_count gauge
         |streaming_sample_count{throughput="100"} 1000
         |""".stripMargin
    assert(MetricsExporter.render(m) == expected)
  }

  test("metrics lift off a distributionStats row with the engine's own values") {
    val s = spark
    import s.implicits._
    val lat = Seq(2.0, 4.0, 6.0, 8.0).toDF("latency_ms")
    val row = Relational.distributionStats(lat, Nil, "latency_ms").head()
    val m = MetricsExporter.fromStatsRow(row, testThroughput = 250)
    assert(m.avgLatencyMs == 5.0 && m.minLatencyMs == 2.0 && m.maxLatencyMs == 8.0)
    assert(m.p50LatencyMs == 5.0) // exact percentile interpolates
    assert(m.sampleCount == 4L && m.testThroughput == 250)
    assert(math.abs(m.stdDevLatencyMs - math.sqrt(20.0 / 3)) < 1e-12)
    assert(MetricsExporter.render(m).contains(
      """streaming_latency_avg_ms{throughput="250"} 5.0"""))
  }

  test("/metrics HTTP endpoint serves the rendered exposition") {
    val m = LatencyMetrics(1.0, 1.0, 2.0, 3.0, 0.5, 3.5, 0.8, 42L, 100)
    val server = MetricsExporter.serve(() => m, port = 0)
    try {
      val port = server.getAddress.getPort
      val conn = new java.net.URL(s"http://localhost:$port/metrics")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      assert(body == MetricsExporter.render(m))
      assert(body.contains("""streaming_sample_count{throughput="100"} 42"""))
    } finally server.stop(0)
  }
}
