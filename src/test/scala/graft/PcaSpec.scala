package graft

import graft.operators.Similarity

class PcaSpec extends SparkSpec {

  test("jacobiEigen recovers exact eigenpairs of a symmetric matrix") {
    // deterministic symmetric test matrix with distinct eigenvalues
    val d = 12
    val a = Array.tabulate(d, d) { (i, j) =>
      if (i == j) 2.0 + i else 1.0 / (1.0 + i + j)
    }
    val (vals, vecs) = Similarity.jacobiEigen(a)
    // descending eigenvalues
    vals.sliding(2).foreach(w => assert(w(0) >= w(1)))
    for (e <- 0 until d) {
      val v = vecs(e)
      // normalized
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-10)
      // A·v == λ·v
      for (r <- 0 until d) {
        val av = (0 until d).map(c => a(r)(c) * v(c)).sum
        assert(math.abs(av - vals(e) * v(r)) < 1e-8,
          s"eigenpair $e violates A*v = lambda*v at row $r")
      }
      // orthogonal to every other axis
      for (f <- e + 1 until d) {
        val dot = (0 until d).map(r => v(r) * vecs(f)(r)).sum
        assert(math.abs(dot) < 1e-10)
      }
      // sign convention: largest-|component| entry is positive
      val mx = v.indices.maxBy(r => (math.abs(v(r)), -r))
      assert(v(mx) > 0)
    }
  }

  test("pca projections decorrelate: sample covariance of components = diag(desc eigenvalues)") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val k = 6
    val out = Similarity.pca(e, "vec_id", "embedding", dim = 64, k = k)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val n = out.size
    assert(n > 100)
    val comps = out.values.toArray
    val means = (0 until k).map(a => comps.map(_(a)).sum / n)
    // component means ~ 0 (projections are mean-centered)
    means.foreach(m => assert(math.abs(m) < 1e-6, s"component mean $m not ~0"))
    val cov = Array.tabulate(k, k) { (a, b) =>
      comps.map(v => (v(a) - means(a)) * (v(b) - means(b))).sum / (n - 1)
    }
    // diagonal: positive, descending = eigenvalue order
    for (a <- 0 until k - 1) {
      assert(cov(a)(a) > 0)
      assert(cov(a)(a) >= cov(a + 1)(a + 1) - 1e-9,
        s"projected variance not descending at $a")
    }
    // off-diagonal ~ 0 relative to the variances: components decorrelated
    for (a <- 0 until k; b <- 0 until k if a != b) {
      val rel = math.abs(cov(a)(b)) / math.sqrt(cov(a)(a) * cov(b)(b))
      assert(rel < 1e-5, s"components $a,$b correlated: $rel")
    }
  }

  test("nearestCentroid: planted geometry classifies correctly, ties to smallest label") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 7),  // label 7 cluster on the x axis
      (2L, Array(0.9f, 0.1f), 7),
      (3L, Array(0.0f, 1.0f), 2),  // label 2 cluster on the y axis
      (4L, Array(0.1f, 0.9f), 2),
      (5L, Array(0.8f, 0.2f), 7)   // clearly x-ish
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.nearestCentroid(df, "vec_id", "embedding", "label", dim = 2)
      .select("vec_id", "pred_label").as[(Long, Long)].collect().toMap
    assert(out(1L) == 7L && out(2L) == 7L && out(5L) == 7L)
    assert(out(3L) == 2L && out(4L) == 2L)
    // identical centroids force an exact cosine tie → smallest label wins
    val tied = Seq(
      (1L, Array(1.0f, 0.0f), 5),
      (2L, Array(1.0f, 0.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val tiedOut = Similarity.nearestCentroid(tied, "vec_id", "embedding", "label", dim = 2)
      .select("pred_label").as[Long].collect()
    assert(tiedOut.forall(_ == 3L))
  }

  test("pca is bit-deterministic across partitionings") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.pca(df, "vec_id", "embedding", dim = 64, k = 4)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val a = run(e)
    val b = run(e.repartition(7))
    assert(a == b, "exact gram + deterministic eigen must give identical bits")
  }
}
