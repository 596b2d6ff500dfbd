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

  test("bpeEncodeBroadcast == bpeEncode exactly (trained merges, real docs)") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(80)
    val merges = Corpus.bpeTrain(docs, "text", numMerges = 25)
    assert(merges.nonEmpty)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id").cast("long"), col("word_pos"), col("word"),
        col("pieces"))
      .as[(Long, Int, String, Seq[String])].collect().toSeq
      .sortBy(r => (r._1, r._2))
      .map { case (id, p, w, pieces) => (id, p, w, pieces.toList) }
    val hof = canon(Corpus.bpeEncode(docs, "doc_id", "text", merges))
    val bcast = canon(Corpus.bpeEncodeBroadcast(docs, "doc_id", "text", merges))
    assert(hof == bcast) // row-for-row, piece-for-piece parity
    // including the merge-creates-earlier-pair edge: rank order is
    // sequential in both, never revisited
    val tricky = Seq((0, "a", "b"), (1, "c", "a"), (2, "ab", "c"))
    val t = corpus((1L, "cab abc cabc aabb"))
    assert(canon(Corpus.bpeEncode(t, "doc_id", "text", tricky)) ==
      canon(Corpus.bpeEncodeBroadcast(t, "doc_id", "text", tricky)))
  }

  test("bpeEncodeBroadcast handles a 50k-merge vocabulary the fold plan cannot build") {
    // synthesize a production-sized merge table: a few live merges in
    // front, tens of thousands of inert ranks behind them — the plan
    // cost of the HOF encoder is 50k nested folds; the broadcast
    // encoder's cost is hash lookups on the pairs actually present
    val live = Seq((0, "l", "o"), (1, "lo", "w"), (2, "e", "r"),
      (3, "low", "er"))
    val inert = (4 until 50000).map(r => (r, s"z$r", s"q$r"))
    val merges = live ++ inert
    val out = Corpus.bpeEncodeBroadcast(
        corpus((1L, "low lower lowest slow")), "doc_id", "text", merges)
      .select(col("word"), col("pieces"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("low") == Seq("low"))
    assert(out("lower") == Seq("lower"))   // low + er -> lower at rank 3
    assert(out("lowest") == Seq("low", "e", "s", "t"))
    assert(out("slow") == Seq("s", "low"))
    // roundtrip still holds under the full 50k table
    val docs = Tables.documents(spark, sf("sf0.001")).limit(30)
    val bad = Corpus.bpeEncodeBroadcast(docs, "doc_id", "text", merges)
      .withColumn("rebuilt", concat_ws("", col("pieces")))
      .filter(col("rebuilt") =!= col("word"))
    assert(bad.isEmpty)
  }

  test("merge list is invariant under uniform frequency scaling") {
    val once = corpus((1L, "banana bandana ban"))
    val thrice = corpus((1L, "banana bandana ban"),
      (2L, "banana bandana ban"), (3L, "banana bandana ban"))
    assert(Corpus.bpeTrain(once, "text", 5) ==
      Corpus.bpeTrain(thrice, "text", 5))
  }
}
