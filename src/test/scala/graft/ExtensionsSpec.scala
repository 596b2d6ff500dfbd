package graft

class ExtensionsSpec extends SparkSpec {

  test("graft_* SQL functions are registered via SparkSessionExtensions") {
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_simhash(array(0L)) AS sh,
        |       size(graft_minhash(array(7L, 9L), 16)) AS mk,
        |       graft_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS ic,
        |       graft_round(2.675D, 2) AS gr
        |""".stripMargin).head
    assert(r.getAs[Double]("c") == 1.0)
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Long]("sh") == 0L) // all bit-counts negative → no bits set
    assert(r.getAs[Int]("mk") == 16)
    assert(r.getAs[Int]("ic") == 2)
    // floor-formula half-up on the IEEE double nearest 2.675
    assert(r.getAs[Double]("gr") == math.floor(2.675 * 100 + 0.5) / 100)
  }

  test("session bounds RocksDB off-heap memory (shared capped cache)") {
    // without this, per-partition RocksDB instances each allocate
    // unbounded off-heap and the executor container is OOM-killed at
    // cluster scale — the cap is part of the engine's memory contract
    assert(spark.conf.get(
      "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage") == "true")
    assert(spark.conf.get(
      "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB").toInt > 0)
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"))
  }

  test("graft_normalize in SQL equals Text.normalize and redacts PII") {
    val r = spark.sql(
      "SELECT graft_normalize('Mail Bob@Site.ORG  from 10.0.0.1 now') AS n").head
    assert(r.getAs[String]("n") == "mail <email> from <ip> now")
  }

  test("SQL graft_cosine agrees with the Column API on real embeddings") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf("sf0.001")).limit(20)
    e.createOrReplaceTempView("emb_ext_spec")
    val viaSql = spark.sql(
      """SELECT a.vec_id ia, b.vec_id ib, graft_cosine(a.embedding, b.embedding) c
        |FROM emb_ext_spec a JOIN emb_ext_spec b ON a.vec_id < b.vec_id""".stripMargin)
    val viaApi = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .join(e.select(col("vec_id").as("ib"), col("embedding").as("vb")),
        col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        graft.functions.Vectors.cosine(col("va"), col("vb")).as("c"))
    assert(viaSql.collect().toSet == viaApi.collect().toSet)
  }
}
