package graft

import graft.sources.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {

  private def partFiles(dir: String, part: String): Set[String] = {
    val d = new java.io.File(s"$dir/part=$part")
    if (!d.isDirectory) Set.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName + ":" + f.lastModified()).toSet
  }

  test("scd2: versions span [seq, next seq); deletes close validity but emit nothing") {
    val s = spark
    import s.implicits._
    val changes = Seq(
      (1L, "v1", "u", 10L),
      (1L, "v2", "u", 20L),
      (1L, "v2", "d", 30L), // closes v2 at 30, key has no current row
      (2L, "w1", "u", 5L)   // open current version
    ).toDF("id", "v", "op", "seq")
    val out = Cdc.scd2(changes, Seq("id"), "seq", opCol = Some("op"))
      .select("id", "v", "valid_from", "valid_to")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, "v1", 10L, 20L),
      (1L, "v2", 20L, 30L),
      (2L, "w1", 5L, Long.MaxValue)))
  }

  test("CDC apply: merges only touched partitions, last-writer-wins incl. deletes") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString + "/t"
    Seq(
      (1L, "a1", "p0"), (2L, "a2", "p1"), (3L, "a3", "p1"),
      (4L, "a4", "p2"), (5L, "a5", "p3"), (6L, "a6", "p4")
    ).toDF("id", "v", "part").write.partitionBy("part").parquet(dir)
    val before = Seq("p0", "p3", "p4").map(p => p -> partFiles(dir, p)).toMap

    val changes = Seq(
      (2L, "a2-new", "p1", "u", 1L),  // update
      (7L, "a7", "p1", "u", 2L),      // insert
      (4L, "a4", "p2", "d", 3L),      // delete
      (8L, "x", "p2", "u", 4L),       // upsert then ...
      (8L, "x", "p2", "d", 5L),       //   later delete wins -> absent
      (9L, "y0", "p2", "d", 6L),      // delete then ...
      (9L, "y1", "p2", "u", 7L)       //   later upsert wins -> present
    ).toDF("id", "v", "part", "op", "seq")

    Cdc.applyChanges(s, dir, changes, keyCols = Seq("id"), partCol = "part")

    val after = s.read.parquet(dir).select("id", "v", "part")
      .as[(Long, String, String)].collect().toSet
    assert(after == Set(
      (1L, "a1", "p0"), (2L, "a2-new", "p1"), (3L, "a3", "p1"),
      (7L, "a7", "p1"), (9L, "y1", "p2"),
      (5L, "a5", "p3"), (6L, "a6", "p4")))
    // untouched partitions: identical files, identical mtimes
    Seq("p0", "p3", "p4").foreach { p =>
      assert(partFiles(dir, p) == before(p), s"partition $p was rewritten")
    }
    // idempotence: re-applying the same batch changes nothing
    Cdc.applyChanges(s, dir, changes, Seq("id"), "part")
    assert(s.read.parquet(dir).select("id", "v", "part")
      .as[(Long, String, String)].collect().toSet == after)
  }
}
