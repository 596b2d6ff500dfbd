package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp

case class L(id: Long, k: String, ts: Timestamp)
case class R(k: String, ts: Timestamp, p: Double)

class AsOfJoinSpec extends SparkSpec {
  private def t(s: String) = Timestamp.valueOf(s)

  test("leftAsOf picks latest right at-or-before each left ts; null when none") {
    val s = spark
    import s.implicits._
    val left = Seq(
      L(1, "a", t("2024-01-01 10:00:00")),
      L(2, "a", t("2024-01-01 12:00:00")),
      L(3, "a", t("2024-01-01 09:00:00")), // before any right → null
      L(4, "b", t("2024-01-01 10:00:00"))  // key with no right rows → null
    ).toDF
    val right = Seq(
      R("a", t("2024-01-01 09:30:00"), 1.0),
      R("a", t("2024-01-01 10:00:00"), 2.0), // ties left ts=10:00 → wins (>= convention)
      R("a", t("2024-01-01 11:00:00"), 3.0)
    ).toDF
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "ts", "ts",
      payload = Seq("p" -> "p_asof"))
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("p_asof") == 2.0) // equal-ts tie → right included
    assert(out(1).getAs[Double]("p_asof") == 3.0)
    assert(out(2).isNullAt(out(2).fieldIndex("p_asof")))
    assert(out(3).isNullAt(out(3).fieldIndex("p_asof")))
  }
}
