package graft

import org.apache.spark.sql.functions._
import graft.functions.{PortableHashKernel, Text}
import org.apache.spark.unsafe.types.UTF8String

/** Differential spec for the compiled portable-hash kernel: the
  * doGenCode expressions must be bit-identical to the interpreted HOF
  * reference forms they replaced (which are in turn oracle-proven
  * against DuckDB), on real corpus text AND on the splitter edge
  * cases (empty string, leading/trailing/consecutive spaces, unicode,
  * tabs inside tokens). */
class PortableHashSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  private def edgeDf = Seq(
    "",
    " ",
    "  ",
    "a",
    "a b",
    "a  b",
    " leading",
    "trailing ",
    "a\tb c",
    "dup dup dup",
    "zz aa mm aa",
    "日本 語 テスト",
    "mixed 日本 ascii",
    "123-456 7890",
    "ünïcøde tökens"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def docsDf =
    spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text"))

  test("kernel fingerprint == HOF fingerprint (ordered + canonical), edges and corpus") {
    for (df <- Seq(edgeDf, docsDf)) {
      val bad = df.select(
        col("text"),
        Text.fingerprint(col("text")).as("k_fp"),
        Text.fingerprintHof(col("text")).as("h_fp"),
        Text.fingerprintCanonical(col("text")).as("k_fpc"),
        Text.fingerprintCanonicalHof(col("text")).as("h_fpc"))
        .filter(col("k_fp") =!= col("h_fp") || col("k_fpc") =!= col("h_fpc"))
        .collect()
      assert(bad.isEmpty, s"kernel/HOF fingerprint mismatch: ${bad.take(3).mkString(";")}")
    }
  }

  test("kernel portableHash == HOF portableHash on ids and text") {
    for ((df, c) <- Seq((docsDf, col("doc_id")), (docsDf, col("text")), (edgeDf, col("text")))) {
      val bad = df.select(
        Text.portableHash(c).as("k"),
        Text.portableHashHof(c).as("h"))
        .filter(col("k") =!= col("h")).count()
      assert(bad == 0L)
    }
  }

  test("portableMix distribution still equidistributed (deciles within ±3%)") {
    val n = 5000
    val ids = (1L to n.toLong).toDF("id")
    val deciles = ids
      .select((Text.portableMix(col("id")) * 10 / 1000000007L).cast("long").as("d"))
      .groupBy("d").count().collect().map(r => r.getLong(1)).toSeq
    assert(deciles.size == 10)
    deciles.foreach(c => assert(math.abs(c - n / 10.0) < n * 0.03, s"decile $c"))
  }

  test("kernel handles null input") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("doc_id", "text")
    val out = df.select(Text.fingerprint(col("text")).as("fp")).collect()
    assert(out.count(_.isNullAt(0)) == 1)
  }

  test("direct kernel edge semantics match the documented split contract") {
    // "".split(" ", -1) == [""] and hash("") == 0 → fingerprint("") == 0
    assert(PortableHashKernel.fingerprint(UTF8String.fromString(""), false) == 0L)
    // single space → two empty tokens: acc = (0*131+0)=0 twice → 0
    assert(PortableHashKernel.fingerprint(UTF8String.fromString(" "), false) == 0L)
    // canonical of "b a" == canonical of "a b"
    val a = PortableHashKernel.fingerprint(UTF8String.fromString("a b"), true)
    val b = PortableHashKernel.fingerprint(UTF8String.fromString("b a"), true)
    assert(a == b)
  }
}
