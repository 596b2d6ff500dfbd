package graft

import graft.streaming.ThroughputSweep

class ThroughputSweepSpec extends SparkSpec {

  test("percentile is nearest-rank over the sample") {
    assert(ThroughputSweep.percentile(Nil, 0.5) == -1L)
    assert(ThroughputSweep.percentile(Seq(7L), 0.99) == 7L)
    val xs = (1L to 100L).reverse
    assert(ThroughputSweep.percentile(xs, 0.50) == 51L)
    assert(ThroughputSweep.percentile(xs, 0.95) == 95L)
    assert(ThroughputSweep.percentile(xs, 0.99) == 99L)
  }

  test("one-level sweep measures achieved rate and update latency") {
    val r = ThroughputSweep.run(spark, sf("sf0.001"),
      targets = Seq(500), secondsPerLevel = 6)
    assert(r.levels.size == 1)
    val l = r.levels.head
    assert(l.target == 500)
    assert(l.achievedPerS > 0, "rate-source replay produced no rows")
    assert(l.samples > 0, "no post-startup window updates observed")
    assert(l.p50Ms >= 0 && l.p95Ms >= l.p50Ms && l.p99Ms >= l.p95Ms)
    // JSON surfaces: full block carries the level, compact block is
    // the bounded {target:[achieved,p95]} form for the bench line
    assert(r.json.contains("\"target\":500") && r.json.contains("\"p99_ms\":"))
    assert(r.compactJson.startsWith("{\"500\":["))
  }
}
