package graft

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.Corpus
import scala.util.Random

/** Seeded-random algebraic invariants — properties that must hold for
  * ANY input, checked over generated corpora (deterministic seeds, so
  * failures reproduce). */
class PropertySpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  private val rnd = new Random(20260812L)
  private val vocab = Vector("the", "cat", "sat", "mat", "and", "dog", "ran",
    "Bob@Example.COM", "+1 555-123-4567", "10.0.0.1", "Zebra", "QUARK", "  ",
    // tab/newline-bearing tokens: whitespace collapse must run BEFORE
    // PII redaction or "123\t45678" dodges the phone pattern on pass 1
    "123\t45678", "a\tb", "line\nbreak", "2024-01-01")

  private def randomDoc(n: Int): String =
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("normalize is idempotent on random PII-laden text") {
    val docs = (1L to 60L).map(i => (i, randomDoc(1 + rnd.nextInt(30)))).toDF("doc_id", "text")
    val once = docs.select(col("doc_id"), Text.normalize(col("text")).as("n1"))
    val twice = once.select(col("doc_id"), Text.normalize(col("n1")).as("n2"), col("n1"))
    val bad = twice.filter(col("n1") =!= col("n2")).collect()
    assert(bad.isEmpty, s"normalize not idempotent on: ${bad.take(3).mkString(";")}")
  }

  test("canonical fingerprint is invariant under token-order shuffle") {
    val base = (1L to 50L).map { i =>
      val toks = Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(7))) // word tokens only
      (i, toks.mkString(" "), rnd.shuffle(toks).mkString(" "))
    }.toDF("doc_id", "text", "shuffled")
    val fp = base.select(col("doc_id"),
      Text.fingerprintCanonical(col("text")).as("a"),
      Text.fingerprintCanonical(col("shuffled")).as("b"))
    assert(fp.filter(col("a") =!= col("b")).isEmpty,
      "canonical fingerprint must ignore token order")
  }

  test("chunking reconstructs the original token stream for random params") {
    for (_ <- 1 to 3) {
      val chunkTokens = 2 + rnd.nextInt(12)
      val overlap = rnd.nextInt(chunkTokens)
      val stride = chunkTokens - overlap
      val docs = (1L to 25L).map(i => (i, randomDoc(1 + rnd.nextInt(40)).replaceAll("\\s+", " ").trim))
        .toDF("doc_id", "text")
      val chunks = Corpus.chunk(docs, "doc_id", "text", chunkTokens, overlap)
        .select("doc_id", "chunk_idx", "chunk_text")
        .as[(Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
      docs.select("doc_id", "text").as[(Long, String)].collect().foreach { case (id, text) =>
        val toks = text.split(" ").toSeq
        // reconstruct: first chunk whole, later chunks drop the overlap
        // (a chunk shorter than the overlap contributes nothing — it
        // is fully contained in its predecessor's tail)
        val rebuilt = chunks(id).zipWithIndex.flatMap { case (c, i) =>
          val ct = c.split(" ").toSeq
          if (i == 0) ct else ct.drop(overlap)
        }.toSeq
        assert(rebuilt == toks,
          s"doc $id (chunk=$chunkTokens overlap=$overlap): $rebuilt != $toks")
      }
    }
  }

  test("bucketed forward fill == plain fill for ANY bucket width and null density") {
    import graft.operators.Relational
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(df.columns.sorted.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    (1 to 6).foreach { trial =>
      val nKeys = 1 + rnd.nextInt(3)
      val nRows = 50 + rnd.nextInt(150)
      val nullP = 0.3 + rnd.nextDouble() * 0.65 // up to ~95% nulls
      val width = 1 + rnd.nextInt(40) // bucket width incl. width=1
      val rows = for (k <- 1 to nKeys; t <- 1 to nRows) yield (
        k.toLong, t.toLong,
        if (rnd.nextDouble() < nullP) null
        else java.lang.Double.valueOf(rnd.nextInt(1000)))
      val df = rows.toDF("k", "ord", "x")
      val plain = Relational.forwardFill(df, Seq("k"), "ord", Seq("x"))
      val bucketed = Relational.forwardFillBucketed(df, Seq("k"), "ord",
        Seq("x"), bucket = floor(col("ord") / width))
      assert(canon(bucketed) == canon(plain),
        s"trial $trial: keys=$nKeys rows=$nRows nullP=$nullP width=$width")
    }
  }

  test("corr-matrix cells are permutation-invariant in the column list") {
    import graft.operators.Relational
    val data = (1L to 80L).map(i => (i, (i % 4).toString,
      rnd.nextDouble() * 100, rnd.nextDouble() * 10, rnd.nextDouble() - 0.5))
      .toDF("id", "g", "a", "b", "c")
    def cells(cols: Seq[String]): Map[(String, String, String), Double] =
      Relational.corrMatrixBy(data, Seq("g"), cols).collect()
        .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
          r.getDouble(3))).toMap
    val abc = cells(Seq("a", "b", "c"))
    val cba = cells(Seq("c", "b", "a"))
    assert(abc.keySet == cba.keySet)
    // the same (group, x, y) cell must not depend on list order: the
    // exact sums are identical terms, so this is equality, not ≈
    abc.foreach { case (k, v) =>
      assert(cba(k) == v || (v.isNaN && cba(k).isNaN), s"cell $k: $v != ${cba(k)}")
    }
  }

  test("proximitySearchAll == brute-force tuple scan on random corpora") {
    import graft.sources.{IncrementalViews, Snapshots}
    val alpha = Vector("aa", "bb", "cc", "dd", "ee")
    for (round <- 1 to 3) {
      val terms = rnd.shuffle(alpha).take(2 + rnd.nextInt(2)) // 2 or 3 terms
      val window = 1 + rnd.nextInt(5)
      val docs = (1L to 30L).map(i =>
        (i, Seq.fill(1 + rnd.nextInt(12))(alpha(rnd.nextInt(alpha.size)))
          .mkString(" ")))
      val (src, views) = (
        java.nio.file.Files.createTempDirectory("graft_proxprop").toString,
        java.nio.file.Files.createTempDirectory("graft_proxpropv").toString)
      Snapshots.commit(docs.toDF("doc_id", "text"), src,
        statsCol = Some("doc_id"))
      IncrementalViews.refreshPositionalIndex(s, src, views,
        "doc_id", "text")
      val served = IncrementalViews.proximitySearchAll(s, views, terms,
          window, maxTuplesPerDoc = -1)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      // independent reference: enumerate every position tuple per doc
      val brute = docs.flatMap { case (id, text) =>
        val pos = text.split(" ").zipWithIndex
          .groupBy(_._1).view.mapValues(_.map(_._2.toLong)).toMap
        val lists = terms.map(t => pos.getOrElse(t, Array.empty[Long]))
        if (lists.exists(_.isEmpty)) None
        else {
          val spans = lists.foldLeft(Seq(Seq.empty[Long]))((acc, l) =>
            acc.flatMap(t => l.map(p => t :+ p)))
            .map(t => t.max - t.min).filter(_ <= window)
          if (spans.isEmpty) None else Some(id -> (spans.size.toLong, spans.min))
        }
      }.toMap
      assert(served == brute,
        s"round $round terms=$terms window=$window: $served != $brute")
    }
  }

  test("OLS coefficients are invariant under row order and partitioning") {
    import graft.operators.Regression
    val rows = (1 to 120).map { i =>
      (i.toLong, (i % 5).toString,
        (rnd.nextInt(10000) / 100.0), (rnd.nextInt(1300) / 100.0),
        (rnd.nextInt(50000) / 100.0))
    }
    def betas(df: org.apache.spark.sql.DataFrame) =
      Regression.olsFitBy(df, Seq("g"), "y", Seq("x1", "x2"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
        .toMap
    val base = betas(rows.toDF("id", "g", "x1", "x2", "y"))
    val shuffled = betas(rnd.shuffle(rows).toDF("id", "g", "x1", "x2", "y")
      .repartition(13))
    // exact decimal moments + one shared Cramer tree: equality, not ≈
    assert(base == shuffled)
    assert(base.size == 15) // 5 groups x (intercept + 2 slopes)
  }
}
