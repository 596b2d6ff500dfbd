package graft

import org.apache.spark.sql.functions._
import graft.functions.Exact

class ExactSpec extends SparkSpec {

  test("roundAt implements floor(x*10^s + 0.5)/10^s including half-boundaries") {
    val s = spark
    import s.implicits._
    val vals = Seq(2.005, 2.015, -2.005, 1.0 / 3.0, 0.125)
    val out = vals.toDF("x")
      .select(Exact.roundAt(col("x"), 2).as("r")).collect().map(_.getDouble(0))
    val expected = vals.map(x => math.floor(x * 100 + 0.5) / 100)
    assert(out.toSeq == expected)
  }

  test("sumExact is partition-order independent") {
    val s = spark
    import s.implicits._
    val xs = (1 to 10000).map(i => (i % 997) * 0.01)
    val one = xs.toDF("x").coalesce(1)
      .agg(Exact.sumExact(col("x"))).head.getDouble(0)
    val many = xs.toDF("x").repartition(32)
      .agg(Exact.sumExact(col("x"))).head.getDouble(0)
    assert(one == many) // bit-identical, not approx
  }

  test("corrExact/covarSampExact agree with closed-form on small data") {
    val s = spark
    import s.implicits._
    val pts = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 5.0), (4.0, 9.0))
    val df = pts.toDF("x", "y")
    val r = df.agg(
      Exact.corrExact(col("x"), col("y")).as("c"),
      Exact.covarSampExact(col("x"), col("y")).as("v")).head
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum; val syy = pts.map(p => p._2 * p._2).sum
    val corr = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(r.getDouble(0) - corr) < 1e-12)
    assert(math.abs(r.getDouble(1) - (sxy - sx * sy / n) / (n - 1)) < 1e-12)
  }

  test("corrMatrix: full k×k matrix in ONE aggregation pass, matches built-in corr") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val m = graft.operators.Relational.corrMatrix(li, cols)
    val cells = m.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(cells.size == cols.length * cols.length)
    // diagonal is 1 (up to the sqrt(v*v) rounding), matrix symmetric
    cols.foreach(c => assert(math.abs(cells((c, c)) - 1.0) < 1e-12))
    for (a <- cols; b <- cols) assert(cells((a, b)) == cells((b, a)))
    // off-diagonal values agree with Spark's built-in co-moment corr
    for (a <- cols; b <- cols if a != b) {
      val ref = li.agg(corr(col(a), col(b))).head.getDouble(0)
      assert(math.abs(cells((a, b)) - ref) < 1e-9, s"($a,$b)")
    }
    // plan shape: exactly one aggregation over the scan (a partial +
    // final HashAggregate pair with one single-partition exchange
    // between) — the matrix projection adds no second pass over data
    // AQE's toString carries Final + Initial sections — count only the final
    val p = m.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("HashAggregate".r.findAllIn(p).length == 2,
      s"expected partial+final agg pair:\n$p")
    assert("Exchange".r.findAllIn(p).length <= 1, s"extra shuffle:\n$p")
  }

  test("corrMatrixPairwise: pandas .corr() semantics on late-starting series") {
    val s = spark; import s.implicits._
    def j(d: Double) = Option(d)
    // series b starts late (NULL for the first 3 rows), series c is
    // complete — pairwise (a,c) uses ALL rows, (a,b) only rows 4..10
    val rows = (1 to 10).map { i =>
      (j(i.toDouble),
        if (i <= 3) Option.empty[Double] else j(i * 2.0 + (i % 3)),
        j(((i * 7) % 13).toDouble))
    }
    val df = rows.toDF("a", "b", "c")
    val cells = graft.operators.Relational
      .corrMatrixPairwise(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    def pearson(pts: Seq[(Double, Double)]): Double = {
      val n = pts.size.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    // hand-computed pairwise-complete cells, the pandas definition
    val ab = rows.collect { case (Some(x), Some(y), _) => (x, y) }
    val ac = rows.collect { case (Some(x), _, Some(z)) => (x, z) }
    assert(ab.size == 7 && ac.size == 10) // the pairs see different rows
    assert(math.abs(cells(("a", "b")) - pearson(ab)) < 1e-12)
    assert(math.abs(cells(("a", "c")) - pearson(ac)) < 1e-12)
    assert(cells(("b", "a")) == cells(("a", "b"))) // symmetric
    // listwise over the same frame differs on the (a,c) cell — the
    // leading-edge divergence the pairwise variant exists to close
    val listwise = graft.operators.Relational
      .corrMatrix(df.filter("a IS NOT NULL AND b IS NOT NULL AND c IS NOT NULL"),
        Seq("a", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(listwise(("a", "c")) != cells(("a", "c")))
    // on a NULL-free frame pairwise == listwise cell-for-cell
    val full = df.filter("b IS NOT NULL")
    val pw = graft.operators.Relational
      .corrMatrixPairwise(full, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val lw = graft.operators.Relational
      .corrMatrix(full, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(pw == lw)
    // per-area notebook twin runs end-to-end on real events
    val pbya = graft.operators.FeatureMatrix.corrByAreaPairwise(
      Tables.events(spark, sf("sf0.001"))).collect()
    assert(pbya.length == 2 * 16) // 2 areas x 4x4 cells
  }
}
