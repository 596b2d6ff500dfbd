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

  test("scd2: duplicate sequences order deterministically through tieBreak") {
    val s = spark
    import s.implicits._
    // two rows share (id=1, seq=10); tieBreak on v makes the order total
    val changes = Seq(
      (1L, "a", "u", 10L),
      (1L, "b", "u", 10L),
      (1L, "c", "u", 20L)
    ).toDF("id", "v", "op", "seq")
    val expect = Set(
      (1L, "a", 10L, 10L),          // a < b at equal seq
      (1L, "b", 10L, 20L),
      (1L, "c", 20L, Long.MaxValue))
    (1 to 3).foreach { _ =>
      val out = Cdc.scd2(changes.repartition(7), Seq("id"), "seq",
        opCol = Some("op"), tieBreak = Seq("v"))
        .select("id", "v", "valid_from", "valid_to")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(out == expect)
    }
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

  test("CDC apply: a batch that deletes every row of a partition removes the partition") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString + "/t"
    Seq((1L, "a1", "p0"), (2L, "a2", "p1"), (3L, "a3", "p1"))
      .toDF("id", "v", "part").write.partitionBy("part").parquet(dir)

    // empty p1 entirely; touch p0 with an update so the batch is mixed
    val changes = Seq(
      (2L, "a2", "p1", "d", 1L),
      (3L, "a3", "p1", "d", 2L),
      (1L, "a1-new", "p0", "u", 3L)
    ).toDF("id", "v", "part", "op", "seq")
    Cdc.applyChanges(s, dir, changes, Seq("id"), "part")

    assert(s.read.parquet(dir).select("id", "v", "part")
      .as[(Long, String, String)].collect().toSet == Set((1L, "a1-new", "p0")))
    assert(!new java.io.File(s"$dir/part=p1").exists(),
      "fully-deleted partition directory must be dropped, not left stale")
    // a batch that empties EVERY touched partition (nothing written) still cleans up
    Cdc.applyChanges(s, dir,
      Seq((1L, "a1-new", "p0", "d", 4L)).toDF("id", "v", "part", "op", "seq"),
      Seq("id"), "part")
    assert(!new java.io.File(s"$dir/part=p0").exists())
    // table is now empty: no partition directories (an empty parquet dir
    // has no footer to infer a schema from, so we assert on the files)
    assert(new java.io.File(dir).listFiles().forall(!_.getName.startsWith("part=")))
  }

  test("CDC apply: bootstraps a not-yet-existing table from the first batch") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString + "/fresh"
    val changes = Seq(
      (1L, "x0", "p0", "u", 1L),
      (1L, "x1", "p0", "u", 2L), // within-batch LWW still applies
      (2L, "y", "p1", "u", 3L),
      (3L, "z", "p1", "d", 4L)   // delete of a never-seen key: no row
    ).toDF("id", "v", "part", "op", "seq")
    Cdc.applyChanges(s, dir, changes, Seq("id"), "part")
    assert(s.read.parquet(dir).select("id", "v", "part")
      .as[(Long, String, String)].collect().toSet ==
      Set((1L, "x1", "p0"), (2L, "y", "p1")))
  }

  test("CDC apply: null partition values merge, delete, and drop like any other") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString + "/t"
    Seq((1L, "a1", Some("p0")), (2L, "a2", None), (3L, "a3", None))
      .toDF("id", "v", "part").write.partitionBy("part").parquet(dir)
    val hiveDefault = new java.io.File(s"$dir/part=__HIVE_DEFAULT_PARTITION__")
    assert(hiveDefault.isDirectory)
    val p0Before = partFiles(dir, "p0")

    // touch ONLY the null partition: update 2, delete 3, insert 4
    val changes = Seq[(Long, String, Option[String], String, Long)](
      (2L, "a2-new", None, "u", 1L),
      (3L, "a3", None, "d", 2L),
      (4L, "a4", None, "u", 3L)
    ).toDF("id", "v", "part", "op", "seq")
    Cdc.applyChanges(s, dir, changes, Seq("id"), "part")
    assert(s.read.parquet(dir).select("id", "v", "part")
      .as[(Long, String, Option[String])].collect().toSet == Set(
      (1L, "a1", Some("p0")), (2L, "a2-new", None), (4L, "a4", None)))
    assert(partFiles(dir, "p0") == p0Before, "untouched p0 was rewritten")

    // a batch that empties the null partition drops its directory too
    Cdc.applyChanges(s, dir, Seq[(Long, String, Option[String], String, Long)](
      (2L, "a2-new", None, "d", 4L), (4L, "a4", None, "d", 5L)
    ).toDF("id", "v", "part", "op", "seq"), Seq("id"), "part")
    assert(s.read.parquet(dir).select("id", "v", "part")
      .as[(Long, String, Option[String])].collect().toSet ==
      Set((1L, "a1", Some("p0"))))
    assert(!hiveDefault.exists(),
      "emptied null-partition directory must be dropped, not left stale")
  }

  test("CDC apply: rejects a key moving between the null partition and a real one") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString + "/t"
    Seq((1L, "a1", Some("p0")), (2L, "a2", None)).toDF("id", "v", "part")
      .write.partitionBy("part").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      // key 1 lives in p0 but arrives with a null partition; batch also
      // touches p0 so the move is visible — must be rejected
      Cdc.applyChanges(s, dir, Seq(
        (1L, "a1-moved", None, "u", 1L), (9L, "n", Some("p0"), "u", 2L)
      ).toDF("id", "v", "part", "op", "seq"), Seq("id"), "part")
    }
    assert(e.getMessage.contains("immutable"))
  }

  test("CDC apply: rejects a batch where a key changes its partition value") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString + "/t"
    Seq((1L, "a1", "p0")).toDF("id", "v", "part")
      .write.partitionBy("part").parquet(dir)
    val moved = Seq((1L, "a1-moved", "p1", "u", 1L))
      .toDF("id", "v", "part", "op", "seq")
    val e = intercept[IllegalArgumentException] {
      // key 1 exists in p0; this batch also touches p0 so the move is visible
      Cdc.applyChanges(s, dir,
        moved.union(Seq((9L, "n", "p0", "u", 2L))
          .toDF("id", "v", "part", "op", "seq")),
        Seq("id"), "part")
    }
    assert(e.getMessage.contains("immutable"))
  }
}
