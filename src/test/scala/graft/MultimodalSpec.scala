package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("packed blobs flow through batched extraction with correct features") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = Multimodal.extractFeatures(spark, Multimodal.pack(docs), batchSize = 32)
    val row = out.filter(_.doc_id == 0L).head()
    val text = docs.filter("doc_id = 0").head().getAs[String]("text")
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    assert(row.sha256_hex == expected)
    assert(row.byte_len == text.getBytes("UTF-8").length)
    assert(row.width == row.byte_len % 64 + 1 && row.format == "raw")
    assert(out.count() == docs.count())
  }

  test("batch size does not change results (plumbing is pure)") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(100)
    val a = Multimodal.extractFeatures(spark, Multimodal.pack(docs), batchSize = 1)
      .collect().toSet
    val b = Multimodal.extractFeatures(spark, Multimodal.pack(docs), batchSize = 1000)
      .collect().toSet
    assert(a == b)
  }
}
