package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Snapshots

/** Incremental near-dup clustering over a durable snapshot-backed
  * assignment table: per-batch labels must equal a from-scratch CC
  * over every edge ever seen (min-label composition stability), only
  * affected components may be touched, and the CoW upsert must carry
  * untouched files by reference. */
class IncrementalClustersSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_inc_cc").toString

  private def fromScratch(allIds: Seq[Long], allEdges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    // reference model: plain union-find over everything seen so far
    val parent = scala.collection.mutable.Map(allIds.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    allEdges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    allIds.map(i => (i, find(i))).sorted
  }

  private def table(dir: String): Seq[(Long, Long)] =
    Snapshots.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("batched assignments equal from-scratch union-find after every batch") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    // batch 0: two clusters {1,2,3} and {10,11}; 20 isolated
    val b0Ids = Seq(1L, 2L, 3L, 10L, 11L, 20L)
    val b0Edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    Dedup.incrementalClusters(spark, dir,
      b0Ids.toDF("doc_id"), b0Edges.toDF("id_a", "id_b"), "doc_id")
    assert(table(dir) == fromScratch(b0Ids, b0Edges))

    // batch 1: no edges at all — all self-clusters, old untouched
    val b1Ids = Seq(30L, 31L)
    Dedup.incrementalClusters(spark, dir,
      b1Ids.toDF("doc_id"), Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "doc_id")
    assert(table(dir) == fromScratch(b0Ids ++ b1Ids, b0Edges))

    // batch 2: new doc 40 joins cluster {10,11}; doc 41 bridges the
    // {1,2,3} and {10,11} clusters TRANSITIVELY (41-3 and 41-10) —
    // every member of both must relabel to the global min 1
    val b2Ids = Seq(40L, 41L)
    val b2Edges = Seq((40L, 10L), (41L, 3L), (41L, 10L))
    Dedup.incrementalClusters(spark, dir,
      b2Ids.toDF("doc_id"), b2Edges.toDF("id_a", "id_b"), "doc_id")
    val allIds = b0Ids ++ b1Ids ++ b2Ids
    val allEdges = b0Edges ++ b2Edges
    assert(table(dir) == fromScratch(allIds, allEdges))
    assert(table(dir).filter(_._2 == 1L).map(_._1).toSet ==
      Set(1L, 2L, 3L, 10L, 11L, 40L, 41L))

    // batch 3: an edge between two EXISTING docs only (late-arriving
    // evidence), no new docs
    Dedup.incrementalClusters(spark, dir,
      Seq.empty[Long].toDF("doc_id"), Seq((20L, 30L)).toDF("id_a", "id_b"), "doc_id")
    assert(table(dir) == fromScratch(allIds, allEdges :+ (20L, 30L)))

    // cluster history is time travel: the pre-merge labels of batch 1
    // are still readable at their version
    val v1 = 1L
    val asOfB1 = Snapshots.read(spark, dir, Some(v1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(asOfB1 == fromScratch(b0Ids ++ b1Ids, b0Edges))
  }

  test("only affected files rewrite; unaffected clusters carry by reference") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    // seed: 200 isolated docs, committed range-clustered by id so low
    // and high ids live in different files
    val ids = (1L to 200L)
    Dedup.incrementalClusters(spark, dir,
      ids.toDF("doc_id").repartitionByRange(8, col("doc_id")),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "doc_id")
    val before = Snapshots.manifest(spark, dir)
      .select("path").collect().map(_.getString(0)).toSet
    assert(before.size >= 4)
    // one edge among LOW ids: high-id files must survive untouched
    Dedup.incrementalClusters(spark, dir,
      Seq.empty[Long].toDF("doc_id"), Seq((1L, 2L)).toDF("id_a", "id_b"), "doc_id")
    val after = Snapshots.manifest(spark, dir)
      .select("path").collect().map(_.getString(0)).toSet
    assert((before & after).nonEmpty,
      "a 2-doc relabel rewrote every assignment file")
    assert(table(dir).take(3) == Seq((1L, 1L), (2L, 1L), (3L, 3L)))
  }

  test("composes with the LSH pipeline: text batches cluster like nearDupClusters") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    def doc(seed: String): String =
      (1 to 15).map(i => s"the $seed$i report and").mkString(" ")
    val b0 = Seq((1L, doc("a")), (2L, doc("a") + " extra"), (3L, doc("b")))
      .toDF("doc_id", "text")
    val e0 = Dedup.minHashLshEdges(b0, "doc_id", "text", threshold = 0.8)
    Dedup.incrementalClusters(spark, dir, b0.select("doc_id"), e0, "doc_id")
    val b1 = Seq((4L, doc("a") + " postscript"), (5L, doc("c")))
      .toDF("doc_id", "text")
    // batch edges = in-batch pairs + cross pairs vs the accumulated corpus
    val e1in = Dedup.minHashLshEdges(b1, "doc_id", "text", threshold = 0.8)
    val e1x = Dedup.minHashLshAgainst(b1, b0, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b")
    Dedup.incrementalClusters(spark, dir, b1.select("doc_id"),
      e1in.unionByName(e1x), "doc_id")
    // from-scratch over the union corpus gives the same clusters
    val scratch = Dedup.nearDupClusters(b0.unionByName(b1), "doc_id", "text",
      threshold = 0.8)
      .select("doc_id", "cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(table(dir) == scratch, s"incremental ${table(dir)} != scratch $scratch")
    // the near-dup family {1,2,4} shares cluster 1
    assert(table(dir).filter(_._2 == 1L).map(_._1).toSet == Set(1L, 2L, 4L))
  }

  test("shared-lineage edgesWithCorpus clusters exactly like the separate edges+against pair") {
    val s = spark
    import s.implicits._
    def doc(seed: String): String =
      (1 to 15).map(i => s"the $seed$i report and").mkString(" ")
    // EXACT duplicates on both sides on purpose: the combined builder
    // collapses both sides to reps, which is only CC-safe because
    // star edges (batch) and fold-0 clustering (corpus) rewire the
    // members — this case fails if that argument breaks
    val b0 = Seq((1L, doc("a")), (2L, doc("a")), (3L, doc("b")),
      (6L, doc("d"))).toDF("doc_id", "text")
    val b1 = Seq((4L, doc("a") + " postscript"), (5L, doc("c")),
      (7L, doc("c")), (8L, doc("b") + " appendix")).toDF("doc_id", "text")
    def run(combined: Boolean): Seq[(Long, Long)] = {
      val dir = tmpDir()
      Dedup.incrementalClusters(spark, dir, b0.select("doc_id"),
        Dedup.minHashLshEdges(b0, "doc_id", "text", threshold = 0.8), "doc_id")
      val e1 =
        if (combined)
          Dedup.minHashLshEdgesWithCorpus(b1, b0, "doc_id", "text",
            threshold = 0.8)
        else
          Dedup.minHashLshEdges(b1, "doc_id", "text", threshold = 0.8)
            .unionByName(
              Dedup.minHashLshAgainst(b1, b0, "doc_id", "text", threshold = 0.8)
                .select("id_a", "id_b"))
      Dedup.incrementalClusters(spark, dir, b1.select("doc_id"), e1, "doc_id")
      graft.sources.Snapshots.read(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    val (comb, sep) = (run(combined = true), run(combined = false))
    assert(comb == sep, s"combined $comb != separate $sep")
    // duplicate family {1,2,4} merged; {5,7} (exact dups within b1) merged
    assert(comb.filter(_._2 == 1L).map(_._1).toSet == Set(1L, 2L, 4L))
    assert(comb.filter(_._2 == 5L).map(_._1).toSet == Set(5L, 7L))
  }
}
