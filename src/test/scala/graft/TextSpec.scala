package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

class TextSpec extends SparkSpec {

  private def one(textVal: String) = {
    val s = spark
    import s.implicits._
    Seq(textVal).toDF("text")
  }

  test("token counts: whitespace, regex pieces, subword estimate") {
    val r = one("hello world 42 x-ray").select(
      Text.tokenCountWs(col("text")).as("ws"),
      Text.tokenCountRegex(col("text")).as("re"),
      Text.tokenCountSubwordEst(col("text")).as("sub")).head
    assert(r.getAs[Int]("ws") == 4)
    // pieces: hello, world, 42, x, -, ray
    assert(r.getAs[Int]("re") == 6)
    assert(r.getAs[Long]("sub") == 5) // ceil(20/4)
  }

  test("fingerprint matches the hand-computed rolling hash") {
    val M = 1000000007L
    def th(t: String) = t.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % M)
    def fp(s: String) = s.split(" ").foldLeft(0L)((a, t) => (a * 131 + th(t)) % M)
    val r = one("ab c").select(Text.fingerprint(col("text"))).head.getLong(0)
    assert(r == fp("ab c"))
  }

  test("canonical fingerprint is order-insensitive") {
    val a = one("x y z").select(Text.fingerprintCanonical(col("text"))).head.getLong(0)
    val b = one("z x y").select(Text.fingerprintCanonical(col("text"))).head.getLong(0)
    val c = one("x y w").select(Text.fingerprintCanonical(col("text"))).head.getLong(0)
    assert(a == b && a != c)
  }

  test("langId: marker dominance and CJK override") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("d1", "el que de los la en madrid"),
      ("d2", "the cat is that of it"),
      ("d3", "der und das von den berlin"),
      ("d4", "完全 中文 文本"),
      ("d5", "zzz qqq www")).toDF("id", "text")
    val out = df.select(col("id"), Text.langId(col("text")).as("l"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("d1") == "es" && out("d2") == "en" && out("d3") == "de")
    assert(out("d4") == "zh" && out("d5") == "und")
  }

  test("repetition signals: looping text scores high, varied text low, short text safe") {
    def rep(t: String) = one(t)
      .select(Text.repetitionRatio(col("text"), 2).as("r"),
        Text.topTokenFraction(col("text")).as("f")).head
    val loop = rep("spam ham spam ham spam ham spam ham")
    assert(loop.getDouble(0) > 0.6) // 7 bigrams, 2 distinct
    assert(loop.getDouble(1) == 0.5)
    val varied = rep("every word here is used exactly once today")
    assert(varied.getDouble(0) == 0.0)
    assert(varied.getDouble(1) == 0.125)
    val single = rep("lonely")
    assert(single.getDouble(0) == 0.0) // no bigrams -> guarded to 0
    assert(single.getDouble(1) == 1.0)
  }

  test("quality score stays in [0,1] on real docs") {
    val d = Tables.documents(spark, sf("sf0.001"))
    val bad = d.select(Text.qualityScore(col("text")).as("q"))
      .filter(col("q") < 0 || col("q") > 1).count()
    assert(bad == 0)
  }
}
