package graft

import org.apache.spark.sql.functions._
import graft.sources.{Savepoints, Snapshots}

/** Multi-table savepoints: one name pins the version SET that was
  * live together; later churn on the tables never leaks into a
  * savepoint read; names are immutable until dropped. */
class SavepointsSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_sp").toString

  test("a savepoint re-reads the exact version set that was live together") {
    val s = spark; import s.implicits._
    val (t1, t2, sp) = (tmpDir(), tmpDir(), tmpDir())
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t1,
      statsCol = Some("k"))
    Snapshots.commit(Seq((1L, 10.0)).toDF("k", "x"), t2, statsCol = Some("k"))
    val pinned = Savepoints.create(spark, sp, "run1",
      Map("docs" -> t1, "scores" -> t2))
    assert(pinned == Map("docs" -> 0L, "scores" -> 0L))

    // churn BOTH tables after the pin: append, delete, append
    Snapshots.commit(Seq((3L, "c")).toDF("k", "v"), t1, statsCol = Some("k"))
    Snapshots.deleteWhere(spark, t1, col("k") === 1L)
    Snapshots.commit(Seq((2L, 20.0)).toDF("k", "x"), t2, statsCol = Some("k"))

    // the savepoint still answers with the pinned state
    assert(Savepoints.read(spark, sp, "run1", "docs")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(Savepoints.read(spark, sp, "run1", "scores").count() == 1L)
    // the live tables moved on
    assert(Snapshots.read(spark, t1)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))

    // SQL surface: create + read + describe — a pin made from pure
    // SQL reads back the same as the Scala API's
    val sqlPin = spark.sql(
      s"""SELECT * FROM graft_savepoint_create(
         |  '$sp', 'run1sql', 'docs', '$t1', 'scores', '$t2')""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sqlPin.map(_._1) == Seq("docs", "scores"))
    assert(spark.sql(s"SELECT k FROM graft_savepoint('$sp', 'run1', 'docs')")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val desc = spark.sql(
      s"SELECT * FROM graft_savepoint_describe('$sp', 'run1')")
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(desc == Seq(("docs", 0L), ("scores", 0L)))

    // a second savepoint pins the NEW state; both coexist
    Savepoints.create(spark, sp, "run2", Map("docs" -> t1, "scores" -> t2))
    assert(Savepoints.list(spark, sp) == Seq("run1", "run1sql", "run2"))
    assert(Savepoints.read(spark, sp, "run2", "docs")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("savepoint-aware expire: a pinned version survives retention; unpinned history still expires") {
    val s = spark; import s.implicits._
    val (t1, sp) = (tmpDir(), tmpDir())
    // v0 (pinned), v1 (unpinned, will die), v2..v3 (the keepLast=2 tail)
    Snapshots.commit(Seq((1L, "v0")).toDF("k", "v"), t1, statsCol = Some("k"))
    Savepoints.create(spark, sp, "run1", Map("docs" -> t1))
    Snapshots.commit(Seq((2L, "v1")).toDF("k", "v"), t1, statsCol = Some("k"))
    Snapshots.commit(Seq((3L, "v2")).toDF("k", "v"), t1, statsCol = Some("k"))
    Snapshots.commit(Seq((4L, "v3")).toDF("k", "v"), t1, statsCol = Some("k"))

    Snapshots.expire(spark, t1, keepLast = 2, savepointDirs = Seq(sp))
    // the pinned v0 still reads in full through the savepoint…
    assert(Savepoints.read(spark, sp, "run1", "docs")
      .select("v").collect().map(_.getString(0)).toSeq == Seq("v0"))
    // …the unpinned v1 manifest is gone…
    intercept[Exception](Snapshots.read(spark, t1, Some(1L)).collect())
    // …and the live tail is intact
    assert(Snapshots.read(spark, t1).count() == 4L)

    // once the savepoint is dropped, the same retention reaps v0 too
    Savepoints.drop(spark, sp, "run1")
    Snapshots.expire(spark, t1, keepLast = 2, savepointDirs = Seq(sp))
    intercept[Exception](Snapshots.read(spark, t1, Some(0L)).collect())
  }

  test("expire is savepoint-aware by DEFAULT: the pin survives a caller that never passes savepointDirs") {
    val s = spark; import s.implicits._
    val (t1, sp) = (tmpDir(), tmpDir())
    Snapshots.commit(Seq((1L, "v0")).toDF("k", "v"), t1, statsCol = Some("k"))
    // create() registers sp inside t1 — the table itself remembers who
    // pins it, so the forgotten-call-site failure mode is gone
    Savepoints.create(spark, sp, "run1", Map("docs" -> t1))
    assert(Snapshots.registeredSavepointDirs(spark, t1).nonEmpty)
    (1 to 3).foreach(i => Snapshots.commit(
      Seq((i.toLong + 1, s"v$i")).toDF("k", "v"), t1, statsCol = Some("k")))
    // the old operator habit: no savepointDirs argument at all
    Snapshots.expire(spark, t1, keepLast = 2)
    assert(Savepoints.read(spark, sp, "run1", "docs")
      .select("v").collect().map(_.getString(0)).toSeq == Seq("v0"))
    intercept[Exception](Snapshots.read(spark, t1, Some(1L)).collect())
    // dropped pin → the same default-aware expire reaps v0
    Savepoints.drop(spark, sp, "run1")
    Snapshots.expire(spark, t1, keepLast = 2)
    intercept[Exception](Snapshots.read(spark, t1, Some(0L)).collect())
  }

  test("SQL list/drop complete the savepoint TVF surface; duplicate aliases refuse") {
    val s = spark; import s.implicits._
    val (t1, sp) = (tmpDir(), tmpDir())
    Snapshots.commit(Seq((1L, "a")).toDF("k", "v"), t1, statsCol = Some("k"))
    spark.sql(s"SELECT * FROM graft_savepoint_create('$sp', 'b_run', 'docs', '$t1')").collect()
    spark.sql(s"SELECT * FROM graft_savepoint_create('$sp', 'a_run', 'docs', '$t1')").collect()
    assert(spark.sql(s"SELECT name FROM graft_savepoint_list('$sp')")
      .collect().map(_.getString(0)).toSeq == Seq("a_run", "b_run"))
    val dropped = spark.sql(
      s"SELECT * FROM graft_savepoint_drop('$sp', 'a_run')").collect()
    assert(dropped.map(r => (r.getString(0), r.getBoolean(1))).toSeq ==
      Seq(("a_run", true)))
    assert(spark.sql(s"SELECT * FROM graft_savepoint_drop('$sp', 'a_run')")
      .collect().map(_.getBoolean(1)).toSeq == Seq(false))
    assert(spark.sql(s"SELECT name FROM graft_savepoint_list('$sp')")
      .collect().map(_.getString(0)).toSeq == Seq("b_run"))
    // one alias, two table dirs: .toMap used to keep only the LAST and
    // report success — now it refuses up front
    val e = intercept[Exception](spark.sql(
      s"""SELECT * FROM graft_savepoint_create(
         |  '$sp', 'dup', 'docs', '$t1', 'docs', '$t1')""".stripMargin).collect())
    assert(e.getMessage.contains("duplicate savepoint alias"))
  }

  test("savepoints are immutable names; unknown reads fail loudly") {
    val s = spark; import s.implicits._
    val (t1, sp) = (tmpDir(), tmpDir())
    Snapshots.commit(Seq((1L, "a")).toDF("k", "v"), t1, statsCol = Some("k"))
    Savepoints.create(spark, sp, "run1", Map("docs" -> t1))
    // re-pinning an existing name must refuse — a silently replaced
    // pin would rewrite history under whoever recorded the name
    val e = intercept[IllegalStateException](
      Savepoints.create(spark, sp, "run1", Map("docs" -> t1)))
    assert(e.getMessage.contains("immutable"))
    // unknown savepoint / unknown alias
    intercept[IllegalArgumentException](
      Savepoints.read(spark, sp, "nope", "docs"))
    val e2 = intercept[IllegalArgumentException](
      Savepoints.read(spark, sp, "run1", "nope"))
    assert(e2.getMessage.contains("docs")) // names what it HAS
    // a table with no snapshots cannot be pinned
    intercept[IllegalArgumentException](
      Savepoints.create(spark, sp, "run3", Map("x" -> (tmpDir() + "/void"))))
    // drop frees the name; the pinned table is untouched
    assert(Savepoints.drop(spark, sp, "run1"))
    assert(!Savepoints.drop(spark, sp, "run1"))
    assert(Savepoints.list(spark, sp).isEmpty)
    assert(Snapshots.read(spark, t1).count() == 1L)
  }
}
