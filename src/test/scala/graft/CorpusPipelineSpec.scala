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

  test("quality-scoring chain: logprob + span-dup profile + quantile bins rank the same docs") {
    import graft.operators.Relational
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf("sf0.001"))
    // per-doc scores from three independent signals
    val lp = Corpus.unigramLogProb(docs, "doc_id", "text")
    val sd = Corpus.spanDedup(docs, "doc_id", "text", k = 10)
    val scored = lp.join(sd, "doc_id")
    assert(scored.count() === docs.count(), "every doc scored by both signals")
    // discretize the perplexity proxy into deciles for mixing weights
    val binned = Relational.quantileBin(scored, "nll", nBins = 10)
    val byBin = binned.groupBy("bin").count().as[(Long, Long)].collect().toMap
    assert(byBin.keys.max < 10 && byBin.keys.min >= 0)
    // equi-depth: no decile more than 2× the ideal share (ties allowed)
    val ideal = docs.count() / 10.0
    byBin.values.foreach(c => assert(c <= ideal * 2, s"decile of $c vs ideal $ideal"))
    // weighted sampling by the dup-ratio signal keeps clean docs more
    val w = lit(1.0) - col("dup_ratio") * 0.9
    val kept = Corpus.weightedSample(binned.select(col("doc_id"), col("dup_ratio")), "doc_id", w)
    assert(kept.count() > 0 && kept.count() <= docs.count())
  }
}
