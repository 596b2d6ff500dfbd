package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{IncrementalViews, Snapshots}

/** Incrementally-maintained join views: after every mix of
  * append / keyed-merge / predicate-delete on either input, one
  * `refreshJoin` tick makes the stored view equal a from-scratch join
  * of the current snapshots — including duplicate (multiset) rows —
  * while untouched view files are carried by reference, and an
  * interrupted tick replays exactly once. */
class IncrementalViewsSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_ivm").toString

  /** Expected = plain Spark join of the two current snapshots. */
  private def recompute(leftDir: String, rightDir: String,
                        keys: Seq[String]): DataFrame =
    Snapshots.read(spark, leftDir).join(Snapshots.read(spark, rightDir), keys)

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def assertViewCurrent(leftDir: String, rightDir: String,
                                viewDir: String, keys: Seq[String]): Unit =
    assert(canon(IncrementalViews.readExpanded(spark, viewDir)
        .select(recompute(leftDir, rightDir, keys).columns.map(col): _*)) ==
      canon(recompute(leftDir, rightDir, keys)))

  test("full lifecycle: build, append both sides, update, delete — view == join after every tick") {
    val s = spark; import s.implicits._
    val (l, r, v) = (tmpDir(), tmpDir(), tmpDir())
    // duplicates on both sides: k=2 twice on the left, k=3 twice on
    // the right — the multiset join must carry multiplicities 2 and 2
    Snapshots.commit(Seq((1L, "a1"), (2L, "a2"), (2L, "a2"), (3L, "a3"))
      .toDF("k", "a"), l, statsCol = Some("k"))
    Snapshots.commit(Seq((1L, 10.0), (3L, 30.0), (3L, 31.0), (4L, 40.0))
      .toDF("k", "b"), r, statsCol = Some("k"))

    val v0 = IncrementalViews.refreshJoin(spark, l, r, v, Seq("k"))
    assert(v0.isDefined)
    assertViewCurrent(l, r, v, Seq("k"))
    // the SQL surface expands multiplicities the same way
    assert(spark.sql(s"SELECT * FROM graft_join_view('$v')").count() ==
      recompute(l, r, Seq("k")).count())
    // Z-set shape: k=3 joins 1 left row x 2 right rows -> 2 distinct
    // tuples? no — (3,a3,30.0) and (3,a3,31.0), each __n = 1;
    // k=2 matches nothing (no right row) and k=4 nothing (no left)
    val stored = Snapshots.read(spark, v)
    assert(stored.filter(col("k") === 3).agg(sum("__n")).head().getLong(0) == 2L)
    assert(stored.filter(col("k").isin(2, 4)).count() == 0L)

    // no-op refresh: nothing changed, no new version, view intact
    assert(IncrementalViews.refreshJoin(spark, l, r, v, Seq("k")).isEmpty)

    // tick 2: append to BOTH sides between refreshes (one tick covers
    // both deltas), including a row that makes k=2 start joining
    Snapshots.commit(Seq((5L, "a5")).toDF("k", "a"), l, statsCol = Some("k"))
    Snapshots.commit(Seq((2L, 20.0), (5L, 50.0)).toDF("k", "b"), r,
      statsCol = Some("k"))
    assert(IncrementalViews.refreshJoin(spark, l, r, v, Seq("k")).isDefined)
    assertViewCurrent(l, r, v, Seq("k"))
    // the duplicated left k=2 now joins: one distinct tuple, __n = 2
    assert(Snapshots.read(spark, v).filter(col("k") === 2)
      .select("__n").head().getLong(0) == 2L)

    // tick 3: keyed merge on the right (update k=1, delete k=3)
    Snapshots.mergeCommit(spark, r,
      Seq((1L, 11.0, "u", 1L), (3L, 0.0, "d", 1L)).toDF("k", "b", "op", "seq"),
      keyCols = Seq("k"))
    assert(IncrementalViews.refreshJoin(spark, l, r, v, Seq("k")).isDefined)
    assertViewCurrent(l, r, v, Seq("k"))
    assert(Snapshots.read(spark, v).filter(col("k") === 3).count() == 0L)

    // tick 4: predicate delete on the left wipes k < 2
    Snapshots.deleteWhere(spark, l, col("k") < 2)
    assert(IncrementalViews.refreshJoin(spark, l, r, v, Seq("k")).isDefined)
    assertViewCurrent(l, r, v, Seq("k"))
  }

  test("O(churn): a one-key tick carries untouched view files by reference") {
    val s = spark; import s.implicits._
    val (l, r, v) = (tmpDir(), tmpDir(), tmpDir())
    // AQE's small-shuffle coalescing would fold this tiny view into
    // ONE range partition (at real scale it targets ~64 MB files —
    // exactly what we want there); hold it off so the clustered merge
    // writes several tiling files the next tick can prune against
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      val left = spark.range(0, 400).select(col("id").as("k"),
        concat(lit("L"), col("id")).as("a")).repartition(8, col("k"))
      val right = spark.range(0, 400).select(col("id").as("k"),
        (col("id") * 2.0).as("b")).repartition(8, col("k"))
      Snapshots.commit(left, l, statsCol = Some("k"))
      Snapshots.commit(right, r, statsCol = Some("k"))
      IncrementalViews.refreshJoin(spark, l, r, v, Seq("k"))
      val before = Snapshots.manifest(spark, v)
        .select("path").collect().map(_.getString(0)).toSet
      assert(before.size >= 3, s"expected a multi-file view, got ${before.size}")

      Snapshots.commit(Seq((7L, 777.7)).toDF("k", "b"), r, statsCol = Some("k"))
      IncrementalViews.refreshJoin(spark, l, r, v, Seq("k"))
      assertViewCurrent(l, r, v, Seq("k"))
      val after = Snapshots.manifest(spark, v)
        .select("path").collect().map(_.getString(0)).toSet
      // most of the view survived by reference; only the file(s) whose
      // k-range covers 7 were rewritten
      val carried = (before & after).size
      assert(carried > 0 && before.size - carried <= 2,
        s"expected <=2 rewritten files, carried $carried of ${before.size}")
    } finally spark.conf.set(coalesceKey, prev)
  }

  test("interrupted tick replays exactly once off the pinned intent") {
    val s = spark; import s.implicits._
    val (l, r, v) = (tmpDir(), tmpDir(), tmpDir())
    Snapshots.commit(Seq((1L, "x")).toDF("k", "a"), l, statsCol = Some("k"))
    Snapshots.commit(Seq((1L, 1.0)).toDF("k", "b"), r, statsCol = Some("k"))
    IncrementalViews.refreshJoin(spark, l, r, v, Seq("k"))

    Snapshots.commit(Seq((2L, "y")).toDF("k", "a"), l, statsCol = Some("k"))
    Snapshots.commit(Seq((2L, 2.0)).toDF("k", "b"), r, statsCol = Some("k"))
    IncrementalViews.refreshJoin(spark, l, r, v, Seq("k"))
    val committedVersion = Snapshots.latestVersion(spark, v).get

    // simulate a crash AFTER the merge committed but BEFORE the
    // processed marker landed: delete the tick's processed marker —
    // and advance the LEFT input afterwards, so a naive replay that
    // re-read "current latest" instead of the pinned intent would
    // compute a different (wrong-fencing) batch
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(v), spark.sparkContext.hadoopConfiguration)
    val state = new org.apache.hadoop.fs.Path(s"$v/_view_state")
    val processed = f.listStatus(state).map(_.getPath)
      .filter(_.getName.startsWith("processed-T000001"))
    assert(processed.length == 1)
    // restore the intent a finished tick GC'd, as a crash would leave it
    val intentName = processed.head.getName.replaceFirst("processed", "intent")
    f.create(new org.apache.hadoop.fs.Path(state, intentName), true).close()
    processed.foreach(p => f.delete(p, false))
    // a post-crash append that JOINS (both sides get k=9), so the
    // tick after the replay has real work to commit
    Snapshots.commit(Seq((9L, "z")).toDF("k", "a"), l, statsCol = Some("k"))
    Snapshots.commit(Seq((9L, 9.0)).toDF("k", "b"), r, statsCol = Some("k"))

    // replay: fenced by the view manifest's batch watermark — no new
    // version, view still correct as of the PINNED tick
    assert(IncrementalViews.refreshJoin(spark, l, r, v, Seq("k")).isEmpty)
    assert(Snapshots.latestVersion(spark, v).contains(committedVersion))
    // the NEXT tick picks up the post-crash append normally
    assert(IncrementalViews.refreshJoin(spark, l, r, v, Seq("k")).isDefined)
    assertViewCurrent(l, r, v, Seq("k"))
  }

  /** Agg-view expected state: from-scratch grouped aggregation of the
    * current source snapshot, in the view's column layout. */
  private def recomputeAgg(srcDir: String): DataFrame =
    Snapshots.read(spark, srcDir).groupBy("g")
      .agg(sum(col("x").cast("decimal(30,6)")).cast("decimal(30,6)").as("sum_x"),
        count(lit(1)).as("__cnt"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"))

  private def assertAggCurrent(srcDir: String, viewDir: String): Unit =
    assert(canon(Snapshots.read(spark, viewDir)
        .select("g", "sum_x", "__cnt", "min_x", "max_x")) ==
      canon(recomputeAgg(srcDir)))

  test("agg view: sums/counts fold from the feed alone; min/max recompute per affected group") {
    val s = spark; import s.implicits._
    val (src, v) = (tmpDir(), tmpDir())
    Snapshots.commit(Seq(("a", 1.5), ("a", 2.25), ("b", 10.0), (null, 7.0))
      .toDF("g", "x"), src, statsCol = Some("g"))
    val done = IncrementalViews.refreshAgg(spark, src, v,
      Seq("g"), Seq("x"), minMaxCols = Seq("x"))
    assert(done == Seq(0L))
    assertAggCurrent(src, v)

    // three source versions land before one refresh call: an append,
    // a keyed delete (shrinks group a and erases group b), and an
    // update that moves a row BETWEEN groups — one call folds all
    Snapshots.commit(Seq(("a", 0.25), ("c", 3.0)).toDF("g", "x"), src,
      statsCol = Some("g"))
    Snapshots.deleteWhere(spark, src, col("x") === 10.0 || col("x") === 2.25)
    Snapshots.updateWhere(spark, src, col("x") === 3.0,
      Map("g" -> lit("a")))
    assert(IncrementalViews.refreshAgg(spark, src, v,
      Seq("g"), Seq("x"), minMaxCols = Seq("x")) == Seq(1L, 2L, 3L))
    assertAggCurrent(src, v)
    // group b's count hit zero: it must have LEFT the view
    assert(Snapshots.read(spark, v).filter(col("g") === "b").count() == 0L)
    // the NULL group aggregates like SQL GROUP BY
    assert(Snapshots.read(spark, v).filter(col("g").isNull).count() == 1L)

    // nothing new: no versions folded, view untouched
    val vv = Snapshots.latestVersion(spark, v)
    assert(IncrementalViews.refreshAgg(spark, src, v,
      Seq("g"), Seq("x"), minMaxCols = Seq("x")).isEmpty)
    assert(Snapshots.latestVersion(spark, v) == vv)
  }

  test("agg view: interrupted fold replays exactly once (marker gone, merge fenced)") {
    val s = spark; import s.implicits._
    val (src, v) = (tmpDir(), tmpDir())
    Snapshots.commit(Seq(("a", 1.0)).toDF("g", "x"), src, statsCol = Some("g"))
    Snapshots.commit(Seq(("a", 2.0)).toDF("g", "x"), src, statsCol = Some("g"))
    IncrementalViews.refreshAgg(spark, src, v, Seq("g"), Seq("x"))
    val committed = Snapshots.latestVersion(spark, v).get
    // crash window: the v1 fold committed but its marker did not
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(v), spark.sparkContext.hadoopConfiguration)
    val state = new org.apache.hadoop.fs.Path(s"$v/_agg_state")
    f.listStatus(state).map(_.getPath)
      .filter(_.getName == "processed-v000000000001")
      .foreach(p => f.delete(p, false))
    // marker regime: consumeChanges GC'd older markers, so restore v0's
    f.create(new org.apache.hadoop.fs.Path(state,
      "processed-v000000000000"), true).close()
    assert(IncrementalViews.refreshAgg(spark, src, v, Seq("g"), Seq("x"))
      == Seq(1L)) // replayed...
    assert(Snapshots.latestVersion(spark, v).contains(committed)) // ...fenced
    assert(canon(Snapshots.read(spark, v).select("g", "sum_x", "__cnt")) ==
      canon(Snapshots.read(spark, src).groupBy("g")
        .agg(sum(col("x").cast("decimal(30,6)")).cast("decimal(30,6)").as("sum_x"),
          count(lit(1)).as("__cnt"))))
  }

  test("a tick that deletes every joining row of a key leaves a correct, smaller view") {
    val s = spark; import s.implicits._
    val (l, r, v) = (tmpDir(), tmpDir(), tmpDir())
    Snapshots.commit(Seq((1L, "x"), (2L, "y")).toDF("k", "a"), l,
      statsCol = Some("k"))
    Snapshots.commit(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "b"), r,
      statsCol = Some("k"))
    IncrementalViews.refreshJoin(spark, l, r, v, Seq("k"))
    // wipe the whole right side: the recompute for both keys is empty,
    // every view row is a Z-set delete — the all-rows-deleted merge
    // (zero-row commit) must still publish a clean manifest
    Snapshots.deleteWhere(spark, r, lit(true))
    assert(IncrementalViews.refreshJoin(spark, l, r, v, Seq("k")).isDefined)
    assert(Snapshots.read(spark, v).count() == 0L)
  }
}
