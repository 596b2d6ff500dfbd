package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Similarity}
import graft.sources.{IncrementalViews, Snapshots}

/** Reciprocal-rank fusion and the hybrid text+vector page it powers. */
class HybridSearchSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_hybrid").toString

  private def r9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
  private def rrfOf(ranks: Seq[Long], rrfK: Int = 60): Double =
    ranks.map(r => BigDecimal(r9(1.0 / (rrfK + r))).setScale(9,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble

  test("rrfFuse: exact decimal fold, both-legs beats single-leg, TakeOrdered shape") {
    val s = spark; import s.implicits._
    // leg A ranks 1..3 = docs 10,20,30; leg B ranks 1..2 = docs 30,40:
    // doc 30 (rank 3 + rank 1) must beat doc 10 (a single rank-1 leg)
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((30L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val fused = Relational.rrfFuse(Seq(a, b), "doc_id", k = 3)
    val rows = fused.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(30L, 10L, 20L),
      s"both-legs mid rank must outrank single-leg rank 1: ${rows.toSeq}")
    assert(rows(0)._2 == rrfOf(Seq(3L, 1L)) && rows(0)._3 == 2L)
    assert(rows(1)._2 == rrfOf(Seq(1L)) && rows(1)._3 == 1L)
    // the fused heap plans TakeOrdered, not a global Sort+Limit
    assert(fused.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"), "fusion must stay a heap")
  }

  test("hybridSearch: fused page == hand-fusing the two index serves") {
    val s = spark; import s.implicits._
    val (src, views, ivf) = (tmp(), tmp(), tmp())
    def vec(a: Float, b: Float) = Array.tabulate(8)(i =>
      if (i == 0) a else if (i == 1) b else 0f)
    // text: docs 1,2 match "spark"; vectors: 1,2 ride e0, 3 rides e1.
    // A query (e0-ish vec + "spark") finds 1,2 on both legs and 3 on
    // the vector leg only.
    Snapshots.commit(Seq(
      (1L, "spark streams arrive quickly and spark holds"),
      (2L, "spark joins tables"),
      (3L, "pandas frames lag")).toDF("doc_id", "text"), src,
      statsCol = Some("doc_id"))
    IncrementalViews.refreshTextIndex(spark, src, views, "doc_id", "text")
    val emb = Seq((1L, vec(1f, 0.01f)), (2L, vec(0.99f, 0.02f)),
      (3L, vec(0.01f, 1f))).toDF("vec_id", "embedding")
    Similarity.ivfWriteIndex(emb, "vec_id", "embedding",
      Similarity.sampleCentroids(emb, "vec_id", "embedding", 2), ivf)
    val qv = vec(1f, 0f)
    val page = IncrementalViews.hybridSearch(spark, views, ivf,
        Seq("spark"), qv, k = 3, kEach = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5), r.getDouble(6)))
    // hand-fuse the two serves the page composes
    val text = IncrementalViews.readBm25(spark, views, Seq("spark"),
        topK = Some(3)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).zipWithIndex
      .map { case ((id, sc), i) => id -> (i + 1L, sc) }.toMap
    val vecs = Similarity.ivfTopKIndexed(spark,
        Seq((-1L, qv.toSeq)).toDF("q", "v"), "q", "v", k = 3,
        path = ivf, nProbe = 2).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    val expect = (text.keySet ++ vecs.keySet).toSeq.map { id =>
      val ranks = text.get(id).map(_._1).toSeq ++ vecs.get(id).map(_._1)
      (id, rrfOf(ranks), ranks.size.toLong,
        text.get(id).map(_._1).getOrElse(0L),
        text.get(id).map(_._2).getOrElse(0.0),
        vecs.get(id).map(_._1).getOrElse(0L),
        vecs.get(id).map(_._2).getOrElse(0.0))
    }.sortBy(t => (-t._2, t._1)).take(3)
    assert(page.toSeq == expect,
      s"page ${page.toSeq} must equal hand fusion $expect")
    // doc 3 is a vector-only hit: zero sentinels, n_legs tells it
    val d3 = page.find(_._1 == 3L).get
    assert(d3._3 == 1L && d3._4 == 0L && d3._5 == 0.0 && d3._6 > 0L)
    // a leg shorter than the page fails loudly
    val e = intercept[IllegalArgumentException] {
      IncrementalViews.hybridSearch(spark, views, ivf, Seq("spark"),
        qv, k = 5, kEach = 3)
    }
    assert(e.getMessage.contains("starve"), e.getMessage)
    // SQL surface parity
    val viaSql = spark.sql(
      s"SELECT * FROM graft_hybrid_search('$views', '$ivf', 'spark', " +
        s"'${qv.mkString(",")}', 3, 3, 2)").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5), r.getDouble(6)))
    assert(viaSql.toSeq == page.toSeq)
  }

  test("hybridSearch PQ leg: codes-only vector serve fuses identically on lossless planted data") {
    val s = spark; import s.implicits._
    val (src, views, ivf, pq) = (tmp(), tmp(), tmp(), tmp())
    def vec(a: Float, b: Float) = Array.tabulate(8)(i =>
      if (i == 0) a else if (i == 1) b else 0f)
    Snapshots.commit(Seq(
      (1L, "spark streams arrive quickly and spark holds"),
      (2L, "spark joins tables"),
      (3L, "pandas frames lag")).toDF("doc_id", "text"), src,
      statsCol = Some("doc_id"))
    IncrementalViews.refreshTextIndex(spark, src, views, "doc_id", "text")
    val emb = Seq((1L, vec(1f, 0.01f)), (2L, vec(0.99f, 0.02f)),
      (3L, vec(0.01f, 1f))).toDF("vec_id", "embedding")
    Similarity.ivfWriteIndex(emb, "vec_id", "embedding",
      Similarity.sampleCentroids(emb, "vec_id", "embedding", 2), ivf)
    // kCodes = corpus size ⇒ the deterministic init encodes every
    // vector LOSSLESSLY (each subvector is its own code), so at
    // nProbe = nCells the ADC ranking equals the exact ranking and
    // the two fused pages must agree rank-for-rank
    Similarity.pqWriteIndex(emb, "vec_id", "embedding", pq,
      dim = 8, nCells = 3, m = 2, kCodes = 3)
    val qv = vec(1f, 0f)
    val common = Seq("doc_id", "rrf", "n_legs", "bm25_rank", "bm25",
      "cos_rank")
    val viaIvf = IncrementalViews.hybridSearch(spark, views, ivf,
      Seq("spark"), qv, k = 3, kEach = 3, nProbe = 3)
    val viaPq = IncrementalViews.hybridSearch(spark, views, ivf,
      Seq("spark"), qv, k = 3, kEach = 3, nProbe = 3,
      pqIndex = Some(pq))
    // the score column changes meaning (and name) with the leg
    assert(viaPq.columns.last == "adist" && viaIvf.columns.last == "cosine")
    assert(viaPq.select(common.map(col): _*).collect().map(_.toSeq).toSeq ==
      viaIvf.select(common.map(col): _*).collect().map(_.toSeq).toSeq,
      "PQ-leg fusion must equal the IVF-leg fusion on lossless data")
    // the PQ leg's index scan carries codes ONLY — never a float vector
    val scans = viaPq.queryExecution.executedPlan.toString
      .split("\\+\\-").filter(_.contains(pq))
    assert(scans.nonEmpty, "plan must scan the PQ index")
    assert(scans.forall(l => l.contains("codes") && !l.contains("vec")),
      s"PQ leg must read codes only:\n${scans.mkString("\n")}")
    // SQL surface: the 10th optional arg selects the PQ leg ('' skips
    // the spell index)
    val viaSql = spark.sql(
      s"SELECT * FROM graft_hybrid_search('$views', '$ivf', 'spark', " +
        s"'${qv.mkString(",")}', 3, 3, 3, 'doc_id', '', '$pq')")
    assert(viaSql.columns.last == "adist")
    assert(viaSql.collect().map(_.toSeq).toSeq ==
      viaPq.collect().map(_.toSeq).toSeq)
  }

  test("hybridSearch PQ leg: a text-only doc carries NULL adist — 0.0 would claim a perfect vector match") {
    val s = spark; import s.implicits._
    val (src, views, ivf, pq) = (tmp(), tmp(), tmp(), tmp())
    def vec(a: Float, b: Float) = Array.tabulate(8)(i =>
      if (i == 0) a else if (i == 1) b else 0f)
    Snapshots.commit(Seq(
      (1L, "spark streams arrive quickly and spark holds"),
      (2L, "spark joins tables"),
      (3L, "pandas frames lag"),
      (4L, "spark spark spark runs spark")).toDF("doc_id", "text"), src,
      statsCol = Some("doc_id"))
    IncrementalViews.refreshTextIndex(spark, src, views, "doc_id", "text")
    // doc 4 is the FARTHEST vector: with kEach = 3 it never surfaces
    // on the vector leg, only on text — the fused page's fill case
    val emb = Seq((1L, vec(1f, 0.01f)), (2L, vec(0.99f, 0.02f)),
      (3L, vec(0.01f, 1f)), (4L, vec(0f, 1.2f)))
      .toDF("vec_id", "embedding")
    Similarity.ivfWriteIndex(emb, "vec_id", "embedding",
      Similarity.sampleCentroids(emb, "vec_id", "embedding", 2), ivf)
    Similarity.pqWriteIndex(emb, "vec_id", "embedding", pq,
      dim = 8, nCells = 3, m = 2, kCodes = 4)
    val qv = vec(1f, 0f)
    val viaPq = IncrementalViews.hybridSearch(spark, views, ivf,
      Seq("spark"), qv, k = 3, kEach = 3, nProbe = 3,
      pqIndex = Some(pq)).collect()
    val d4 = viaPq.find(_.getLong(0) == 4L)
      .getOrElse(fail("text-rank-1 doc 4 must make the fused page"))
    assert(d4.getLong(viaPq.head.fieldIndex("cos_rank")) == 0L)
    assert(d4.isNullAt(viaPq.head.fieldIndex("adist")),
      "a doc the vector leg never surfaced must carry NULL adist, " +
        "not a perfect-match 0.0")
    // the cosine leg keeps its NEUTRAL 0.0 fill (similarity, not
    // distance — zero is 'orthogonal', a fine no-signal reading)
    val viaIvf = IncrementalViews.hybridSearch(spark, views, ivf,
      Seq("spark"), qv, k = 3, kEach = 3, nProbe = 3).collect()
    val d4c = viaIvf.find(_.getLong(0) == 4L)
      .getOrElse(fail("doc 4 must make the cosine-leg page too"))
    assert(d4c.getDouble(viaIvf.head.fieldIndex("cosine")) == 0.0)
  }

  test("hybridSearch did-you-mean: misspelled text leg corrects instead of starving the fusion") {
    val s = spark; import s.implicits._
    val (src, views, ivf, wfreq, idx) = (tmp(), tmp(), tmp(), tmp(), tmp())
    def vec(a: Float, b: Float) = Array.tabulate(8)(i =>
      if (i == 0) a else if (i == 1) b else 0f)
    Snapshots.commit(Seq(
      (1L, "spark streams arrive quickly and spark holds"),
      (2L, "spark joins tables"),
      (3L, "pandas frames lag")).toDF("doc_id", "text"), src,
      statsCol = Some("doc_id"))
    IncrementalViews.refreshTextIndex(spark, src, views, "doc_id", "text")
    IncrementalViews.refreshWordFreq(spark, src, wfreq, "text")
    IncrementalViews.refreshSpellIndex(spark, wfreq, idx, maxEdits = 1)
    val emb = Seq((1L, vec(1f, 0.01f)), (2L, vec(0.99f, 0.02f)),
      (3L, vec(0.01f, 1f))).toDF("vec_id", "embedding")
    Similarity.ivfWriteIndex(emb, "vec_id", "embedding",
      Similarity.sampleCentroids(emb, "vec_id", "embedding", 2), ivf)
    val qv = vec(1f, 0f)
    // without the spell index the misspelling starves the text leg:
    // the page degrades to vector-only (n_legs = 1 everywhere)
    val starved = IncrementalViews.hybridSearch(spark, views, ivf,
      Seq("sparkk"), qv, k = 3, kEach = 3, nProbe = 2).collect()
    assert(starved.forall(_.getLong(2) == 1L),
      "a zero-posting term must leave only the vector leg")
    // with it, the fused page equals the corrected-query page + audit
    val corrected = IncrementalViews.hybridSearch(spark, views, ivf,
      Seq("spark"), qv, k = 3, kEach = 3, nProbe = 2).collect()
    val spelled = IncrementalViews.hybridSearch(spark, views, ivf,
      Seq("sparkk"), qv, k = 3, kEach = 3, nProbe = 2,
      spellIndex = Some(idx)).collect()
    assert(spelled.map(_.toSeq.dropRight(1)).toSeq ==
      corrected.map(_.toSeq).toSeq,
      "corrected hybrid page must equal the right-spelling page")
    assert(spelled.forall(_.getString(7) == "sparkk->spark"))
    // a correctly-spelled query with the index attached: empty audit
    val clean = IncrementalViews.hybridSearch(spark, views, ivf,
      Seq("spark"), qv, k = 3, kEach = 3, nProbe = 2,
      spellIndex = Some(idx)).collect()
    assert(clean.forall(_.getString(7) == ""))
    // SQL surface grows the optional arg
    val viaSql = spark.sql(
      s"SELECT * FROM graft_hybrid_search('$views', '$ivf', 'sparkk', " +
        s"'${qv.mkString(",")}', 3, 3, 2, 'doc_id', '$idx')").collect()
    assert(viaSql.map(_.toSeq).toSeq == spelled.map(_.toSeq).toSeq)
  }
}
