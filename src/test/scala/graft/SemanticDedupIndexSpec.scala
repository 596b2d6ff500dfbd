package graft

import graft.operators.Similarity
import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** The maintained SemDeDup index: batches folded through
  * [[Similarity.semanticDedupApply]] must equal from-scratch
  * [[Similarity.semanticDedup]] over the final live corpus under the
  * same frozen centroids — including a deletion that un-vetoes a
  * survivor and an update that moves a doc between cells. */
class SemanticDedupIndexSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_semdedup_spec").toString

  /** one-hot direction `d` with a small distinguishing wobble `w` in
    * the next axis — in-direction cosine ≈ 1, cross-direction ≈ 0 */
  private def v(d: Int, w: Float = 0f, dim: Int = 8) =
    Array.tabulate(dim)(i =>
      if (i == d) 1f else if (i == (d + 1) % dim) w else 0f)

  private def emb(rows: Seq[(Long, Array[Float])]) =
    spark.createDataFrame(rows).toDF("vec_id", "embedding")

  private def verdicts(path: String): Map[Long, (Option[Long], Long, Boolean)] =
    Similarity.semanticDedupRead(spark, path, "vec_id").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))),
          r.getLong(2), r.getBoolean(3)))
      .toMap

  test("folded batches == from-scratch semanticDedup under the frozen centroids") {
    val path = tmpDir()
    // ids 1..4 are one-hot e1..e4 and the 4 smallest ids, so the
    // frozen sample centroids equal from-scratch's over ANY corpus
    // that keeps them; 11/12 ride e1, 21 rides e2, 31 rides e3
    val b1 = Seq(1L -> v(0), 2L -> v(1), 3L -> v(2), 4L -> v(3),
      11L -> v(0, 0.02f), 21L -> v(1, 0.03f))
    val b2 = Seq(12L -> v(0, 0.04f), 31L -> v(2, 0.02f))
    Similarity.semanticDedupInit(spark, path, emb(b1), "vec_id",
      "embedding", nCells = 4, threshold = 0.95)
    Similarity.semanticDedupApply(spark, path,
      emb(b2).withColumn("op", lit("u")), "vec_id", "embedding")
    val got = Similarity.semanticDedupRead(spark, path, "vec_id")
    val scratch = Similarity.semanticDedup(emb(b1 ++ b2), "vec_id",
      "embedding", nCells = 4, threshold = 0.95)
    assert(got.collect().toSet.map((r: org.apache.spark.sql.Row) => r.toSeq)
      == scratch.collect().toSet.map((r: org.apache.spark.sql.Row) => r.toSeq))
    val m = verdicts(path)
    assert(m(11L) == (Some(1L), 1L, false)) // vetoed by 1
    assert(m(12L) == (Some(1L), 2L, false)) // vetoed by 1 and 11
    assert(m(31L) == (Some(3L), 1L, false)) // vetoed by 3
  }

  test("a deletion un-vetoes the surviving smaller-id neighbor in the same tick") {
    val path = tmpDir()
    val all = Seq(1L -> v(0), 2L -> v(1), 11L -> v(0, 0.02f),
      12L -> v(0, 0.04f))
    Similarity.semanticDedupInit(spark, path, emb(all), "vec_id",
      "embedding", nCells = 2, threshold = 0.95)
    assert(verdicts(path)(11L) == (Some(1L), 1L, false))
    // the delete row carries the stored embedding (CDC delete image)
    Similarity.semanticDedupApply(spark, path,
      emb(Seq(1L -> v(0))).withColumn("op", lit("d")),
      "vec_id", "embedding")
    val m = verdicts(path)
    assert(!m.contains(1L))
    assert(m(11L) == (Some(1L), 0L, true)) // UN-VETOED: 1 is gone
    assert(m(12L) == (Some(1L), 1L, false)) // still vetoed, by 11 now
    assert(m(2L) == (Some(2L), 0L, true)) // untouched cell unchanged
  }

  test("a cell-moving update ('d' old image + 'u' new image) recomputes both cells") {
    val path = tmpDir()
    val all = Seq(1L -> v(0), 2L -> v(1), 3L -> v(2),
      21L -> v(1, 0.02f), 31L -> v(2, 0.03f))
    Similarity.semanticDedupInit(spark, path, emb(all), "vec_id",
      "embedding", nCells = 3, threshold = 0.95)
    assert(verdicts(path)(21L) == (Some(2L), 1L, false))
    // 21 moves from e2's cell to e3's: one batch, old image deleted,
    // new image upserted
    val move = emb(Seq(21L -> v(1, 0.02f))).withColumn("op", lit("d"))
      .unionByName(emb(Seq(21L -> v(2, 0.01f))).withColumn("op", lit("u")))
    Similarity.semanticDedupApply(spark, path, move, "vec_id", "embedding")
    val m = verdicts(path)
    assert(m(21L) == (Some(3L), 1L, false)) // now vetoed by 3
    assert(m(2L) == (Some(2L), 0L, true))   // old cell: alone, kept
    assert(m(31L) == (Some(3L), 2L, false)) // 21 < 31: a NEW veto rides in
  }

  test("null-embedding docs: auditable null cell, never veto, deletable") {
    val path = tmpDir()
    Similarity.semanticDedupInit(spark, path,
      emb(Seq(1L -> v(0), 11L -> v(0, 0.02f))), "vec_id", "embedding",
      nCells = 1, threshold = 0.95)
    val nullRow = spark.createDataFrame(
      Seq((41L, null.asInstanceOf[Array[Float]]))).toDF("vec_id", "embedding")
    Similarity.semanticDedupApply(spark, path,
      nullRow.withColumn("op", lit("u")), "vec_id", "embedding")
    val m = verdicts(path)
    assert(m(41L) == (None, 0L, true))
    assert(m(11L) == (Some(1L), 1L, false)) // null doc vetoed nobody
    Similarity.semanticDedupApply(spark, path,
      nullRow.withColumn("op", lit("d")), "vec_id", "embedding")
    assert(!verdicts(path).contains(41L))
  }

  test("guards: duplicate 'u' id, threshold re-pin, hot cell, missing init") {
    val path = tmpDir()
    Similarity.semanticDedupInit(spark, path,
      emb(Seq(1L -> v(0), 2L -> v(1))), "vec_id", "embedding",
      nCells = 2, threshold = 0.9)
    val dup = emb(Seq(7L -> v(0, 0.01f), 7L -> v(0, 0.02f)))
      .withColumn("op", lit("u"))
    val e1 = intercept[IllegalArgumentException] {
      Similarity.semanticDedupApply(spark, path, dup, "vec_id", "embedding")
    }
    assert(e1.getMessage.contains("id 7") &&
      e1.getMessage.contains("one final image"), e1.getMessage)
    // a re-init with a different tau would silently change veto
    // semantics mid-index — pinned parameter fails loudly
    val e2 = intercept[IllegalArgumentException] {
      Similarity.semanticDedupInit(spark, path,
        emb(Seq(1L -> v(0))), "vec_id", "embedding",
        nCells = 1, threshold = 0.5)
    }
    assert(e2.getMessage.contains("semdedup_threshold"), e2.getMessage)
    // a batch that grows one cell past the cap trips the measuring
    // pass BEFORE the quadratic join, naming the cell
    val flood = emb((100L to 160L).map(i => i -> v(0, 0.001f * i)))
      .withColumn("op", lit("u"))
    val e3 = intercept[IllegalArgumentException] {
      Similarity.semanticDedupApply(spark, path, flood, "vec_id",
        "embedding", maxCellSize = 50L)
    }
    assert(e3.getMessage.contains("maxCellSize=50"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      Similarity.semanticDedupApply(spark, tmpDir(),
        emb(Seq(1L -> v(0))).withColumn("op", lit("u")),
        "vec_id", "embedding")
    }
    assert(e4.getMessage.contains("semanticDedupInit"), e4.getMessage)
  }

  test("a tick touching one cell never opens other cells' files (corrupt-the-unread proof)") {
    val path = tmpDir()
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      // 8 one-hot cells (centroids = ids 1..8), 3 extra members each
      val rows = (0 until 8).flatMap { d =>
        Seq((d + 1).toLong -> v(d)) ++
          (0 until 3).map(j => (100L + d * 10 + j) -> v(d, 0.01f * (j + 1)))
      }
      Similarity.semanticDedupInit(spark, path, emb(rows), "vec_id",
        "embedding", nCells = 8, threshold = 0.95)
      // corrupt the data bytes of every assignment file whose __cell
      // stats range cannot hold cell 1: if the tick opened any of
      // them it would crash
      val far = Snapshots.manifest(spark, s"$path/assign")
        .select("path", "smin___cell", "smax___cell").collect().toSeq
        .filter(r => !r.isNullAt(1) &&
          (r.getLong(1) > 1L || r.getLong(2) < 1L))
        .map(_.getString(0))
      assert(far.size >= 3, s"need cell-tiled files, got ${far.size}")
      far.foreach { f =>
        val raf = new java.io.RandomAccessFile(f.stripPrefix("file:"), "rw")
        try {
          val n = math.min(200L, math.max(0L, raf.length() - 1000L)).toInt
          if (n > 0) { raf.seek(4); raf.write(Array.fill[Byte](n)(0x5A)) }
        } finally raf.close()
      }
      Similarity.semanticDedupApply(spark, path,
        emb(Seq(200L -> v(0, 0.005f))).withColumn("op", lit("u")),
        "vec_id", "embedding")
      // spot-check through the pruned read path (a full read would
      // fail on the corrupted files — proof they were never rewritten)
      val cell1 = Snapshots.readPrunedRanges(spark, s"$path/assign", "",
          Seq((1L: Any, 1L: Any)))
        .filter(col("__cell") === 1L).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(cell1(200L) == 4L) // vetoed by 1, 100, 101, 102
      assert(cell1(1L) == 0L)
    } finally spark.conf.set(coalesceKey, prev)
  }
}
