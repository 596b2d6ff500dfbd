package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.FeatureMatrix

/** The notebook's merged feature frame as one composition: outer
  * datetime merge semantics, forward fill across series gaps,
  * complete-case trimming, and the per-area matrix shape. */
class FeatureMatrixSpec extends SparkSpec {

  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")

  test("hourlyFrame: outer merge + forward fill reproduce the notebook's merged.ffill()") {
    val s = spark; import s.implicits._
    // area '1' (even user): price at h0+h2, consumption h0..h2,
    // sunlight h0, wind h0 — hour 1 has NO price row (outer merge
    // must synthesize it; ffill must carry 10.0), hour 2 carries
    // sunlight/wind from hour 0
    val events = Seq(
      (ts(0), 0L, "purchase", 10.0), (ts(2), 0L, "purchase", 30.0),
      (ts(0), 0L, "click", 5.0), (ts(1), 0L, "click", 6.0), (ts(2), 0L, "click", 7.0),
      (ts(0), 0L, "view", 100.0), (ts(0), 0L, "signup", 1.0),
      // area '2' (odd user): complete only from hour 1
      (ts(1), 1L, "purchase", 50.0), (ts(1), 1L, "click", 9.0),
      (ts(0), 1L, "view", 60.0), (ts(1), 1L, "signup", 2.0),
      // an error event must not contribute to any series
      (ts(0), 0L, "error", 999.0)
    ).toDF("ts", "user_id", "event_type", "value")
    val frame = FeatureMatrix.hourlyFrame(events)
      .orderBy("area", "hour")
      .select("area", "price", "consumption", "sunlight", "wind")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(frame == Seq(
      ("1", 10.0, 5.0, 100.0, 1.0),  // h0: all observed
      ("1", 10.0, 6.0, 100.0, 1.0),  // h1: price/sunlight/wind ffilled
      ("1", 30.0, 7.0, 100.0, 1.0),  // h2: price fresh, rest carried
      // area 2: h0 dropped (no price/consumption/wind yet — complete
      // cases only); h1 has sunlight carried forward from h0
      ("2", 50.0, 9.0, 60.0, 2.0)))
  }

  test("corrByArea on testdata: two full 4x4 matrices, symmetric, unit diagonal") {
    val out = FeatureMatrix.corrByArea(
      Tables.events(spark, sf("sf0.001"))).collect()
    assert(out.length == 32) // 2 areas x 16 cells
    val m = out.map(r => ((r.getString(0), r.getString(1), r.getString(2)),
      r.getDouble(3))).toMap
    val areas = out.map(_.getString(0)).distinct.sorted
    assert(areas.toSeq == Seq("1", "2"))
    for (a <- areas; c <- FeatureMatrix.SeriesCols) {
      assert(math.abs(m((a, c, c)) - 1.0) < 1e-12, s"diag ($a,$c)")
      for (d <- FeatureMatrix.SeriesCols) {
        assert(m((a, c, d)) == m((a, d, c)), s"symmetry ($a,$c,$d)")
        assert(math.abs(m((a, c, d))) <= 1.0 + 1e-12, s"range ($a,$c,$d)")
      }
    }
  }
}
