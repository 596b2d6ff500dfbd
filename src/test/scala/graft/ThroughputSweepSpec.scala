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

  test("a dead level is an error, never an achieved:0 data row") {
    import ThroughputSweep.{SweepLevel, sweepWithMeasure}
    // 1000 is permanently dead (zero post-startup samples every
    // attempt); 100 and 10000 measure fine
    def measure(t: Int): SweepLevel =
      if (t == 1000) SweepLevel(t, 0.0, -1, -1, -1, 0)
      else SweepLevel(t, t.toDouble, 5, 9, 12, 40)
    val r = sweepWithMeasure(Seq(100, 1000, 10000), measure, retries = 1)
    assert(r.levels.map(_.target) == Seq(100, 10000),
      "dead level leaked into the data rows")
    assert(r.errors.keySet == Set(1000))
    assert(r.errors(1000).contains("zero post-startup samples"))
    // the JSON block carries the marker, and no zero-achieved row
    assert(r.json.contains("\"errors\":{\"1000\":"))
    assert(!r.json.contains("\"achieved_msgs_per_s\":0"))
  }

  test("a transiently dead level is retried once and then reported as data") {
    import ThroughputSweep.{SweepLevel, sweepWithMeasure}
    var calls = 0
    def measure(t: Int): SweepLevel = {
      calls += 1
      if (calls == 1) SweepLevel(t, 0.0, -1, -1, -1, 0) // first attempt starved
      else SweepLevel(t, t.toDouble, 5, 9, 12, 40)
    }
    val r = sweepWithMeasure(Seq(50000), measure, retries = 1)
    assert(calls == 2, "zero-sample first attempt was not retried")
    assert(r.errors.isEmpty && r.levels.map(_.target) == Seq(50000))
  }

  test("an ALL-levels stall re-runs the whole sweep once (sick window, not a measurement)") {
    import ThroughputSweep.{SweepLevel, sweepWithMeasure}
    var calls = 0
    def measure(t: Int): SweepLevel = {
      calls += 1
      // first FULL pass (2 targets × (1+1 retries) = 4 calls) starved —
      // the r18 artifact's shape; the window then heals
      if (calls <= 4) SweepLevel(t, 0.0, -1, -1, -1, 0)
      else SweepLevel(t, t.toDouble, 5, 9, 12, 40)
    }
    val r = sweepWithMeasure(Seq(100, 1000), measure, retries = 1,
      fullRetries = 1)
    assert(r.errors.isEmpty && r.levels.map(_.target) == Seq(100, 1000),
      s"healed window's sweep still reported errors: ${r.errors}")
    assert(calls == 6, "full-sweep retry did not run (or ran twice)")
    // a PERMANENTLY sick window still reports the stall — the retry
    // must not loop or fabricate data
    var calls2 = 0
    def dead(t: Int): SweepLevel = {
      calls2 += 1; SweepLevel(t, 0.0, -1, -1, -1, 0)
    }
    val r2 = sweepWithMeasure(Seq(100, 1000), dead, retries = 1,
      fullRetries = 1)
    assert(r2.levels.isEmpty && r2.errors.keySet == Set(100, 1000))
    assert(calls2 == 8, "permanent stall should try each level 2×2 times")
    // a PARTIAL stall is data + errors, no full retry
    var calls3 = 0
    def partial(t: Int): SweepLevel = {
      calls3 += 1
      if (t == 100) SweepLevel(t, 0.0, -1, -1, -1, 0)
      else SweepLevel(t, t.toDouble, 5, 9, 12, 40)
    }
    val r3 = sweepWithMeasure(Seq(100, 1000), partial, retries = 1,
      fullRetries = 1)
    assert(r3.levels.map(_.target) == Seq(1000) &&
      r3.errors.keySet == Set(100))
    assert(calls3 == 3, "partial stall must not trigger the full retry")
  }

  test("a level whose measurement throws lands in errors with the cause") {
    import ThroughputSweep.{SweepLevel, sweepWithMeasure}
    def measure(t: Int): SweepLevel =
      if (t == 100) throw new IllegalStateException("stream never started")
      else SweepLevel(t, t.toDouble, 5, 9, 12, 40)
    val r = sweepWithMeasure(Seq(100, 1000), measure)
    assert(r.levels.map(_.target) == Seq(1000))
    assert(r.errors(100).contains("IllegalStateException"))
  }

  test("one-level sweep measures achieved rate and update latency") {
    // 10s level: on the shared 4-core test session under a loaded
    // suite JVM, batch 0 alone can eat a 6s level — zero post-startup
    // samples is then the dead-level GUARD firing (correctly), not a
    // measurement; give the level room so the test measures
    val r = ThroughputSweep.run(spark, sf("sf0.001"),
      targets = Seq(500), secondsPerLevel = 10)
    assert(r.errors.isEmpty, s"sweep level starved twice: ${r.errors}")
    assert(r.levels.size == 1)
    val l = r.levels.head
    assert(l.target == 500)
    assert(l.achievedPerS > 0, "rate-source replay produced no rows")
    assert(l.samples > 0, "no post-startup window updates observed")
    assert(l.p50Ms >= 0 && l.p95Ms >= l.p50Ms && l.p99Ms >= l.p95Ms)
    // JSON surfaces: full block carries the level, compact block is
    // the bounded {target:[achieved,p95]} form for the bench line
    assert(r.json.contains("\"target\":500") && r.json.contains("\"p99_ms\":"))
    // the shape is STABLE across error states: always the
    // {levels, errors} object, errors empty on the happy path
    assert(r.json.startsWith("{\"levels\":[") &&
      r.json.endsWith("\"errors\":{}}"))
    assert(r.compactJson.startsWith("{\"500\":["))
  }
}
