package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomUtil
import graft.operators.Relational

/** Bloom-prefiltered semi join: result identity with the exact join
  * (no false negatives), measured pre-filter selectivity near the
  * requested fpp, codegen'd probe, sizing math, SQL surface. */
class BloomSpec extends SparkSpec {

  private lazy val ev = Tables.events(spark, sf("sf0.001"))

  test("bloomSemiJoin == plain left_semi join (no false negatives, any fpp)") {
    val small = ev.filter(col("user_id") % 7 === 0)
      .select(col("user_id").as("uid")).distinct()
    val got = Relational.bloomSemiJoin(ev, "user_id", small, "uid", fpp = 0.2)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = ev.join(small, ev("user_id") === small("uid"), "left_semi")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("pre-filter drops most non-members at the requested fpp") {
    val s = spark
    import s.implicits._
    // disjoint key spaces: members 0..999, probes 1M..1M+9999
    val members = (0L until 1000L).toDF("k")
    val probes = (1000000L until 1010000L).toDF("k")
    val (numBits, numHashes) = BloomUtil.sizing(1000, 0.01)
    val filter = members.select(
        graft.functions.ColumnBridge.column(
          graft.functions.BloomBuildAgg(
            graft.functions.ColumnBridge.expression(xxhash64(col("k"))),
            numBits, numHashes).toAggregateExpression()).as("f"))
      .head().getSeq[Long](0)
    val surviving = probes.filter(
      graft.functions.ColumnBridge.column(graft.functions.BloomMightContain(
        graft.functions.ColumnBridge.expression(typedLit(filter)),
        graft.functions.ColumnBridge.expression(xxhash64(col("k")))))).count()
    // 10k disjoint probes at fpp=0.01 → ~100 expected survivors;
    // generous 5x bound keeps the test deterministic-but-meaningful
    assert(surviving <= 500, s"$surviving of 10000 non-members passed (fpp target 1%)")
    // members themselves always pass
    val memberPass = members.filter(
      graft.functions.ColumnBridge.column(graft.functions.BloomMightContain(
        graft.functions.ColumnBridge.expression(typedLit(filter)),
        graft.functions.ColumnBridge.expression(xxhash64(col("k")))))).count()
    assert(memberPass == 1000)
  }

  test("sizing: power-of-two bits, k in range, budget guard") {
    val (m1, k1) = BloomUtil.sizing(1000, 0.01)
    assert(Integer.bitCount(m1) == 1 && m1 >= 64)
    assert(k1 >= 1 && k1 <= 16)
    // ~9.6 bits/item optimal at 1% -> next power of two
    assert(m1 >= 9585 && m1 <= 16384, s"m1 = $m1")
    intercept[IllegalArgumentException](BloomUtil.sizing(Long.MaxValue / 2, 1e-9))
    intercept[IllegalArgumentException](BloomUtil.sizing(0, 0.01))
  }

  test("the probe runs inside whole-stage codegen on the big side") {
    // AQE's adaptive wrapper hides codegen stage markers until
    // execution — plan the query non-adaptively to see them directly
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val small = ev.limit(50).select(col("user_id").as("uid")).distinct()
      val joined = Relational.bloomSemiJoin(ev, "user_id", small, "uid")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("graft_bloom_might_contain"),
        s"no bloom probe in plan:\n$plan")
      val filterLine =
        plan.linesIterator.find(_.contains("graft_bloom_might_contain")).get
      assert(filterLine.replaceAll("^[\\s:+-]*", "").startsWith("*"),
        s"bloom probe filter not codegen'd:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("property: zero false negatives over seeded-random key sets") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260813L)
    (1 to 3).foreach { trial =>
      val n = 100 + rnd.nextInt(2000)
      val keys = Seq.fill(n)(rnd.nextLong())
      val (numBits, numHashes) = BloomUtil.sizing(n, 0.01)
      val filter = keys.toDF("k").select(
          graft.functions.ColumnBridge.column(
            graft.functions.BloomBuildAgg(
              graft.functions.ColumnBridge.expression(xxhash64(col("k"))),
              numBits, numHashes).toAggregateExpression()).as("f"))
        .head().getSeq[Long](0)
      val pass = keys.toDF("k").filter(
        graft.functions.ColumnBridge.column(graft.functions.BloomMightContain(
          graft.functions.ColumnBridge.expression(typedLit(filter)),
          graft.functions.ColumnBridge.expression(xxhash64(col("k")))))).count()
      assert(pass == n, s"trial $trial: $pass of $n member rows passed")
    }
  }

  test("SQL surface: graft_bloom_agg + graft_bloom_contains") {
    ev.createOrReplaceTempView("ev_bloom")
    val r = spark.sql(
      """WITH f AS (
        |  SELECT graft_bloom_agg(xxhash64(user_id), 16384, 7) AS bf
        |  FROM ev_bloom WHERE user_id % 2 = 0)
        |SELECT count(*) AS pass
        |FROM ev_bloom, f
        |WHERE graft_bloom_contains(f.bf, xxhash64(ev_bloom.user_id))
        |  AND ev_bloom.user_id % 2 = 0""".stripMargin).head().getLong(0)
    val want = ev.filter(col("user_id") % 2 === 0).count()
    assert(r == want) // every member passes through the SQL path too
  }

  test("SQL TVF graft_bloom_semi auto-sizes and equals the exact semi join") {
    ev.createOrReplaceTempView("ev_bloom_big")
    ev.filter(col("user_id") % 7 === 0)
      .select(col("user_id").as("uid")).distinct()
      .createOrReplaceTempView("ev_bloom_small")
    // no sizing arguments anywhere: the TVF counts the small side
    val got = spark.sql(
      """SELECT event_id
        |FROM graft_bloom_semi('ev_bloom_big', 'user_id',
        |                      'ev_bloom_small', 'uid')""".stripMargin)
      .collect().map(_.getLong(0)).sorted.toSeq
    val want = spark.sql(
      """SELECT event_id FROM ev_bloom_big
        |WHERE user_id IN (SELECT uid FROM ev_bloom_small)""".stripMargin)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && got.nonEmpty)
    // explicit fpp still accepted, including a fractional literal
    // (exercises the Decimal-tolerant litDouble path)
    val loose = spark.sql(
      """SELECT count(*) AS n
        |FROM graft_bloom_semi('ev_bloom_big', 'user_id',
        |                      'ev_bloom_small', 'uid', 0.2)""".stripMargin)
      .head().getLong(0)
    assert(loose == want.length.toLong)
    // a nonsense fpp is rejected with a clear message
    val err = intercept[Exception](spark.sql(
      """SELECT * FROM graft_bloom_semi('ev_bloom_big', 'user_id',
        |                               'ev_bloom_small', 'uid', 7.5)""".stripMargin))
    assert(err.getMessage.contains("fpp"))
  }
}
