package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup}
import graft.functions.Text

/** The whole corpus-preparation chain composed end-to-end, the way a
  * training-data pipeline would actually run it:
  *
  *   normalize → near-dup cluster (keep reps) → decontaminate vs a
  *   benchmark set → deterministic split → pack the train split
  *
  * Asserts the cross-operator invariants no single-operator spec can:
  * reps are unique per cluster, no contaminated or benchmark doc
  * survives, the split partitions the clean set exactly, and packing
  * covers the train split exactly. */
class CorpusPipelineSpec extends SparkSpec {

  test("normalize → dedup → decontaminate → split → pack composes correctly") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val normalized = docs.select(col("doc_id"), Text.normalize(col("text")).as("text"))

    val clusters = Dedup.nearDupClusters(normalized, "doc_id", "text",
      numHashes = 128, bands = 16, threshold = 0.95)
    val reps = clusters.filter(col("is_rep")).select("doc_id")
    // one representative per cluster, every doc labeled
    assert(clusters.count() === normalized.count())
    assert(reps.count() ===
      clusters.select("cluster_id").distinct().count())

    val kept = normalized.join(reps, "doc_id")
    val bench = col("doc_id") % 97 === 0
    val cont = Corpus.contamination(kept, "doc_id", "text", bench, n = 3)
    val clean = cont.filter(!col("contaminated")).select("doc_id").join(kept, "doc_id")
    assert(clean.count() > 0)
    assert(clean.filter(bench).count() === 0, "benchmark docs never reach training")

    val split = Corpus.hashSplit(clean, "doc_id")
    assert(split.count() === clean.count(), "split is total")
    val train = split.filter(col("split") === "train").select("doc_id", "text")
    assert(train.count() > 0)

    val packed = Corpus.packSequences(train, "doc_id", "text", budget = 512, shards = 4)
    assert(packed.count() === train.count(), "packing covers train exactly")
    // every packed doc is a clean, kept, train doc
    assert(packed.select("doc_id").except(train.select("doc_id")).isEmpty)
  }
}
