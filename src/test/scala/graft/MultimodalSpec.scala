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

  test("resize: blob-in/blob-out shape, payload bounded by target area") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(50)
    val out = Multimodal.resize(spark, Multimodal.pack(docs), w = 64, h = 64)
    assert(out.columns.toSeq == Seq("doc_id", "blob", "width", "height", "format"))
    val rows = out.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("blob").length <= 64 * 64 / 64)
      assert(r.getAs[Long]("width") == 64L && r.getAs[Long]("height") == 64L)
    }
  }

  test("frame sampling explodes one blob into every-nth fixed-size frames, deterministically") {
    val s = spark
    import s.implicits._
    val one = Seq((7L, ("x" * 100).getBytes("UTF-8"), "raw"))
      .toDF("doc_id", "blob", "format")
    val frames = Multimodal.frameSample(s, one, frameBytes = 32, everyNth = 2)
      .orderBy("frame_idx").collect()
    // 100 bytes → frames 0..3 (32,32,32,4); every 2nd → idx 0 and 2
    assert(frames.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L, 2L))
    assert(frames.map(_.getAs[Long]("frame_len")).toSeq == Seq(32L, 32L))
    val again = Multimodal.frameSample(s, one, frameBytes = 32, everyNth = 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    }) sameElements again.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x
    }))
  }
}
