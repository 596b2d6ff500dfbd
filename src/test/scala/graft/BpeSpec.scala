package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

/** BPE trainer/encoder: the textbook merge sequence, deterministic
  * tie-breaks, early stop, encode-decode roundtrip, and frequency
  * scaling invariance. */
class BpeSpec extends SparkSpec {
  private val s = TestSession.spark
  import s.implicits._

  private def corpus(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("bpeTrain learns the textbook merge sequence with lexicographic tie-breaks") {
    val df = corpus((1L, "low low low lower lowest"))
    val merges = Corpus.bpeTrain(df, "text", numMerges = 4)
    // round 1: (l,o) and (o,w) tie at 5 — "l" < "o" wins; then the
    // merged symbols chain up the word
    assert(merges == Seq((0, "l", "o"), (1, "lo", "w"), (2, "low", "e"),
      (3, "lowe", "r")))
  }

  test("bpeTrain stops early when no adjacent pairs remain") {
    val df = corpus((1L, "a b c a b"))
    val merges = Corpus.bpeTrain(df, "text", numMerges = 10)
    assert(merges.isEmpty) // all words are single symbols
  }

  test("bpeEncode applies merges in rank order; pieces reconstruct every word") {
    val train = corpus((1L, "low low low lower lowest"))
    val merges = Corpus.bpeTrain(train, "text", numMerges = 4)
    val enc = Corpus.bpeEncode(corpus((1L, "low lower lowest slow")),
        "doc_id", "text", merges)
      .select(col("word"), col("pieces"))
      .as[(String, Seq[String])].collect().toMap
    assert(enc("low") == Seq("low"))
    assert(enc("lower") == Seq("lower"))
    assert(enc("lowest") == Seq("lowe", "s", "t"))
    assert(enc("slow") == Seq("s", "low")) // merges apply inside unseen words
    // roundtrip on real documents with a broader merge set
    val docs = Tables.documents(spark, sf("sf0.001")).limit(50)
    val m2 = Corpus.bpeTrain(docs, "text", numMerges = 10)
    assert(m2.size == 10)
    val bad = Corpus.bpeEncode(docs, "doc_id", "text", m2)
      .withColumn("rebuilt", concat_ws("", col("pieces")))
      .filter(col("rebuilt") =!= col("word"))
    assert(bad.isEmpty, "pieces must concatenate back to the word")
  }

  test("merge list is invariant under uniform frequency scaling") {
    val once = corpus((1L, "banana bandana ban"))
    val thrice = corpus((1L, "banana bandana ban"),
      (2L, "banana bandana ban"), (3L, "banana bandana ban"))
    assert(Corpus.bpeTrain(once, "text", 5) ==
      Corpus.bpeTrain(thrice, "text", 5))
  }
}
