package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf("sf0.001"))

  test("int8 codes are in [-127,127] and dequantize within half a step per dimension") {
    val dim = 64
    val (mins, maxs) = Similarity.int8Range(emb, "embedding", dim)
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding", dim)
    val joined = q.join(emb, "vec_id")
      .select(col("vec_id"), col("codes"),
        Similarity.dequantizeInt8(col("codes"), mins, maxs).as("deq"),
        col("embedding"))
      .collect()
    assert(joined.length == emb.count())
    joined.foreach { r =>
      val codes = r.getSeq[Int](1)
      val deq = r.getSeq[Double](2)
      val orig = r.getSeq[Float](3)
      codes.foreach(c => assert(c >= -127 && c <= 127))
      for (d <- 0 until dim) {
        val step = (maxs(d) - mins(d)) / 254
        // floor(q + 0.5) rounds to the nearest level: error <= step/2
        assert(math.abs(deq(d) - orig(d).toDouble) <= step / 2 + 1e-12,
          s"dim $d off by ${math.abs(deq(d) - orig(d))} > ${step / 2}")
      }
    }
  }

  test("quantization is deterministic across partitionings") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.quantizeInt8(df, "vec_id", "embedding", 64)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(run(emb) == run(emb.repartition(5)))
  }

  test("ANN over dequantized codes keeps high recall vs exact cosine top-k") {
    val dim = 64; val k = 10
    val (mins, maxs) = Similarity.int8Range(emb, "embedding", dim)
    val deq = Similarity.quantizeInt8(emb, "vec_id", "embedding", dim)
      .select(col("vec_id"),
        Similarity.dequantizeInt8(col("codes"), mins, maxs).as("embedding"))
    def topk(df: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(df, df.filter(col("vec_id") < 20),
          "vec_id", "embedding", k)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk(emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding")))
    val approx = topk(deq)
    val recalls = exact.keys.toSeq.sorted.map { q =>
      exact(q).intersect(approx(q)).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@$k over ${recalls.size} queries: $mean%.3f")
    assert(mean >= 0.85, f"int8 recall collapsed: $mean%.3f")
  }
}
