package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  private def filesOf(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq

  test("zValue interleaves bits: curve locality beats dimension-order") {
    val s = spark
    import s.implicits._
    val df = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
    // reference interleave: bit i of x lands at 2i, of y at 2i+1
    def spreadRef(v: Long): Long =
      (0 until 16).map(i => ((v >> i) & 1L) << (2 * i)).sum
    val expect = spreadRef(3L) | (spreadRef(5L) << 1)
    assert(df.as[Long].head() == expect)
  }

  test("Z-clustered layout: a single-user predicate touches few files; plain layout touches all") {
    val s = spark
    import s.implicits._
    val ev = Tables.events(s, sf("sf0.01"))
      .select(col("event_id"), col("user_id"), col("value"))
    val (vLo, vHi) = {
      val r = ev.agg(min("value"), max("value")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val zDir = s"$base/z"; val pDir = s"$base/plain"
    Layout.writeZClustered(ev,
      Layout.to16(col("user_id") * 437, 0, 65535), // spread users over the axis
      Layout.to16(col("value"), vLo, vHi),
      numFiles = 16, zDir)
    ev.repartition(16).write.parquet(pDir)

    def filesContaining(dir: String, uid: Long): Int =
      filesOf(dir).count(f =>
        s.read.parquet(f).filter(col("user_id") === uid).limit(1).count() > 0)

    val uid = ev.select("user_id").head().getLong(0)
    val zTouched = filesContaining(zDir, uid)
    val pTouched = filesContaining(pDir, uid)
    assert(filesOf(zDir).size == 16 && filesOf(pDir).size == 16)
    assert(pTouched >= 14, s"plain layout should smear user $uid everywhere, got $pTouched")
    assert(zTouched <= 6, s"z-layout should confine user $uid, got $zTouched files")
    // layout changes bytes, never data
    assert(s.read.parquet(zDir).count() == ev.count())
    assert(s.read.parquet(zDir).select("event_id").except(
      ev.select("event_id")).isEmpty)
  }

  test("compaction merges small files, preserves data exactly, and is verify-before-swap") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val ev = Tables.events(s, sf("sf0.001")).select("event_id", "user_id", "value")
    ev.repartition(37).write.parquet(dir) // the streaming-sink mess
    assert(filesOf(dir).size == 37)
    val before = ev.collect().toSet
    val n = Layout.compact(s, dir, targetRows = 500)
    assert(n == before.size)
    val after = s.read.parquet(dir)
    assert(filesOf(dir).size == math.ceil(n / 500.0).toInt)
    assert(after.collect().toSet == before)
  }
}
