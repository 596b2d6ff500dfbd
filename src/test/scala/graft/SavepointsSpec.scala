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

    // SQL surface: read + describe
    assert(spark.sql(s"SELECT k FROM graft_savepoint('$sp', 'run1', 'docs')")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val desc = spark.sql(
      s"SELECT * FROM graft_savepoint_describe('$sp', 'run1')")
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(desc == Seq(("docs", 0L), ("scores", 0L)))

    // a second savepoint pins the NEW state; both coexist
    Savepoints.create(spark, sp, "run2", Map("docs" -> t1, "scores" -> t2))
    assert(Savepoints.list(spark, sp) == Seq("run1", "run2"))
    assert(Savepoints.read(spark, sp, "run2", "docs")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
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
