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
}
