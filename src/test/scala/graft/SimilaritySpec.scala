package graft

import graft.operators.Similarity

case class Vec(vec_id: Long, embedding: Array[Float])

class SimilaritySpec extends SparkSpec {

  /** Tight synthetic clusters: 10 centroids × 20 members with small
    * deterministic jitter — in-cluster cosine ≈ 1. */
  private def clustered = {
    val s = spark
    import s.implicits._
    val rnd = new java.util.Random(7)
    val centroids = Array.fill(10)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = for {
      c <- 0 until 10; m <- 0 until 20
    } yield Vec(c * 100L + m, centroids(c).map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    rows.toDF
  }

  test("codegen cosine is bit-identical to the HOF formulation") {
    import org.apache.spark.sql.functions._
    import graft.functions.Vectors
    val e = Tables.embeddings(spark, sf("sf0.001")).limit(60)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val diff = a.join(b, col("ia") < col("ib"))
      .withColumn("c1", Vectors.cosine(col("va"), col("vb")))
      .withColumn("c2", Vectors.cosineHof(col("va"), col("vb")))
      .filter(col("c1") =!= col("c2")) // exact comparison, not approx
      .count()
    assert(diff == 0)
  }

  test("brute-force top-k: nearest neighbors of a cluster member are in-cluster") {
    val data = clustered
    val queries = data.filter("vec_id % 100 = 0") // one per cluster
    val out = Similarity.bruteForceTopK(data, queries, "vec_id", "embedding", 5)
    assert(out.count() == 50) // 10 queries × 5
    val wrong = out.filter("query_id div 100 != neighbor_id div 100").count()
    assert(wrong == 0) // tight clusters: all top-5 are cluster-mates
    assert(out.filter("cosine < 0.9").count() == 0)
  }

  test("LSH top-k achieves high recall vs brute force on clustered data") {
    val data = clustered
    val queries = data.filter("vec_id % 100 = 0")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(data, queries, "vec_id", "embedding", 5))
    val approx = pairs(Similarity.lshTopK(data, queries, "vec_id", "embedding", 5,
      bitsPerTable = 8, tables = 8))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.9, s"recall $recall")
  }

  test("lshRecallCheck emits the contract verdict row the oracle pins") {
    val data = clustered
    val queries = data.filter("vec_id % 100 = 0")
    val row = Similarity.lshRecallCheck(data, queries, "vec_id", "embedding",
      k = 5, bitsPerTable = 8, tables = 8, floor = 0.9).collect()
    assert(row.length == 1)
    assert(row(0).getLong(0) == 10L) // n_queries
    assert(row(0).getLong(1) == 5L) // k
    assert(row(0).getDouble(2) == 0.9)
    assert(row(0).getBoolean(3), "recall fell below the spec floor")
    // an impossible floor flips the verdict — the check actually bites
    val strict = Similarity.lshRecallCheck(data, queries, "vec_id",
      "embedding", k = 5, bitsPerTable = 16, tables = 1, floor = 1.01)
      .collect()(0)
    assert(!strict.getBoolean(3))
  }

  test("product quantization: hand-math codes and ADC distance; recall on clustered data") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // hand case: dim 4, m 2 (subspaces of 2), kCodes 2 — books come
    // from the two smallest-id rows, so codes and distances are
    // checkable by hand
    val tiny = Seq(
      Vec(0L, Array(0f, 0f, 10f, 10f)),
      Vec(1L, Array(4f, 4f, 0f, 0f)),
      Vec(2L, Array(1f, 1f, 9f, 9f)), // sub0 → code 0, sub1 → code 0
      Vec(3L, Array(3f, 3f, 1f, 1f))  // sub0 → code 1, sub1 → code 1
    ).toDF
    val books = Similarity.pqTrain(tiny, "vec_id", "embedding",
      dim = 4, m = 2, kCodes = 2)
    assert(books(0)(0).toSeq == Seq(0.0, 0.0) &&
      books(0)(1).toSeq == Seq(4.0, 4.0))
    assert(books(1)(0).toSeq == Seq(10.0, 10.0) &&
      books(1)(1).toSeq == Seq(0.0, 0.0))
    val enc = Similarity.pqEncode(tiny, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc(2L) == Seq(0, 0) && enc(3L) == Seq(1, 1))
    // ADC for query 2 vs neighbor 3: sub0 dist to book(0)(1)=(4,4):
    // (1-4)²+(1-4)² = 18; sub1 dist to book(1)(1)=(0,0): 81+81 = 162
    val adc = Similarity.pqTopK(
      Similarity.pqEncode(tiny, "vec_id", "embedding", books),
      tiny.filter(col("vec_id") === 2L), "vec_id", "embedding", books, 3)
    val d3 = adc.filter(col("neighbor_id") === 3L).head().getDouble(3)
    assert(d3 == 180.0)
    // vs neighbor 0 (codes (0,0)): identical to query 2's own cell →
    // sub dists (1+1) + (1+1) = 4 — ranked first
    assert(adc.orderBy(col("rnk")).head().getLong(1) == 0L)

    // clustered data. The sample-init books here are DEGENERATE by
    // construction (the 16 smallest ids are all cluster-0 members) —
    // the case k-means refinement exists for. Within a tight cluster
    // every mate shares codes, so pair-level recall vs brute force is
    // not PQ's contract; what ADC must deliver is the cluster
    // structure: refined books put the top-5 of every query IN its
    // cluster, like the brute-force baseline.
    val data = clustered
    val queries = data.filter("vec_id % 100 = 0")
    val b0 = Similarity.pqTrain(data, "vec_id", "embedding",
      dim = 64, m = 8, kCodes = 16)
    val b1 = Similarity.pqTrain(data, "vec_id", "embedding",
      dim = 64, m = 8, kCodes = 16, iters = 1)
    val bRef = Similarity.pqTrain(data, "vec_id", "embedding",
      dim = 64, m = 8, kCodes = 16, iters = 3)
    // distortion = mean squared error of each vector to its own codes
    // — the k-means objective, monotone non-increasing in iters, and
    // the degenerate init must improve by a WIDE margin
    val (e0, e1, e3) = (
      Similarity.pqDistortion(data, "vec_id", "embedding", b0),
      Similarity.pqDistortion(data, "vec_id", "embedding", b1),
      Similarity.pqDistortion(data, "vec_id", "embedding", bRef))
    assert(e1 <= e0 && e3 <= e1,
      s"k-means refinement must not raise encode distortion: $e0 -> $e1 -> $e3")
    assert(e3 < e0 * 0.5,
      s"refinement must rescue the degenerate sample init: $e0 -> $e3")
    val adcTop = Similarity.pqTopK(
      Similarity.pqEncode(data, "vec_id", "embedding", bRef),
      queries, "vec_id", "embedding", bRef, 5)
    assert(adcTop.count() == 50)
    val off = adcTop
      .filter("query_id div 100 != neighbor_id div 100").count()
    assert(off <= 2, s"refined-PQ ADC put $off of 50 neighbors out-of-cluster")
  }

  test("IVF-PQ: full probe equals flat PQ exactly; partial probe keeps the cluster structure") {
    val s = spark
    import org.apache.spark.sql.functions._
    val data = clustered
    val queries = data.filter("vec_id % 100 = 7") // non-centroid members
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    // with every cell probed the candidate set is the whole corpus →
    // IVF-PQ must equal the flat ADC scan row for row
    val books = Similarity.pqTrain(data, "vec_id", "embedding",
      dim = 64, m = 8, kCodes = 16)
    val flat = Similarity.pqTopK(
      Similarity.pqEncode(data, "vec_id", "embedding", books),
      queries, "vec_id", "embedding", books, 5)
    val full = Similarity.ivfPqTopK(data, queries, "vec_id", "embedding",
      dim = 64, k = 5, nCells = 16, nProbe = 16, m = 8, kCodes = 16)
    assert(canon(full) == canon(flat))
    // partial probe: the plan is a broadcast HASH join on the cell
    // key — no nested loop — and still k rows per query
    val part = Similarity.ivfPqTopK(data, queries, "vec_id", "embedding",
      dim = 64, k = 5, nCells = 16, nProbe = 4, m = 8, kCodes = 16)
    val plan = part.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(part.count() == 50)
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(data, queries, "vec_id", "embedding",
        dim = 64, k = 5, nCells = 16, nProbe = 17)
    }
  }

  test("IVF top-k with full probe is exactly brute force; partial probe has high recall") {
    val data = clustered
    val queries = data.filter("vec_id % 100 = 0")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    // nProbe == nCells probes every cell -> candidate set is the whole
    // corpus, so the result must equal the exact baseline row-for-row.
    val exact = rows(Similarity.bruteForceTopK(data, queries, "vec_id", "embedding", 5))
    val full = rows(Similarity.ivfTopK(data, queries, "vec_id", "embedding", 5,
      nCells = 8, nProbe = 8))
    assert(full == exact)
    // partial probe: clustered data keeps neighbors in nearby cells
    def pairs(rs: Seq[Seq[Any]]) = rs.map(r => (r(0), r(1))).toSet
    val partial = rows(Similarity.ivfTopK(data, queries, "vec_id", "embedding", 5,
      nCells = 8, nProbe = 3))
    val recall = (pairs(exact) intersect pairs(partial)).size.toDouble / exact.size
    assert(recall > 0.8, s"recall $recall")
  }

  test("k-means refinement: centroids move to cluster means, recall >= sampled init") {
    val data = clustered
    val queries = data.filter("vec_id % 100 = 0")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(data, queries, "vec_id", "embedding", 5))
    def recall(df: org.apache.spark.sql.DataFrame) =
      (exact intersect pairs(df)).size.toDouble / exact.size
    // 10 true clusters, 10 cells, single probe: sampled init may put
    // two centroids in one cluster; Lloyd iterations must not hurt and
    // should reach near-perfect recall on this separable data
    val rSample = recall(Similarity.ivfTopK(data, queries, "vec_id", "embedding", 5,
      nCells = 10, nProbe = 1))
    val rKmeans = recall(Similarity.ivfTopKRefined(data, queries, "vec_id", "embedding", 5,
      nCells = 10, nProbe = 1, iters = 5))
    assert(rKmeans >= rSample, s"kmeans $rKmeans < sampled $rSample")
    assert(rKmeans > 0.9, s"kmeans recall $rKmeans")
    // the refined centroids are near the true cluster means: every
    // cell holds members of exactly one planted cluster
    val cents = Similarity.kmeansCentroids(data, "vec_id", "embedding", 10, 5)
    assert(cents.length == 10)
  }

  test("stored IVF index: partition-pruned probe reads equal the in-memory plan") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val queries = e.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
    val cents = Similarity.sampleCentroids(e, "vec_id", "embedding", 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.ivfWriteIndex(e, "vec_id", "embedding", cents, dir)
    val indexed = Similarity.ivfTopKIndexed(spark, queries, "vec_id", "embedding",
      k = 5, path = dir, nProbe = 4)
    val inMem = Similarity.ivfTopKWith(e, queries, "vec_id", "embedding",
      k = 5, centroids = cents, nProbe = 4)
    assert(indexed.collect().map(_.toSeq).toSet === inMem.collect().map(_.toSeq).toSet)
    val p = indexed.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [cell"),
      s"probe must prune cell directories:\n$p")
  }

  test("stored IVF-PQ index: pruned code-only serve == in-memory; append/tombstone lifecycle") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf("sf0.001")).select("vec_id", "embedding")
    val queries = e.filter(col("vec_id") < 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_pqidx").toString
    Similarity.pqWriteIndex(e, "vec_id", "embedding", dir,
      dim = 64, nCells = 16, m = 8, kCodes = 16)
    val indexed = Similarity.pqTopKIndexed(spark, queries,
      "vec_id", "embedding", k = 5, path = dir, nProbe = 4)
    // same sample-init centroids+books → the stored serve must equal
    // the in-memory composition row for row
    val inMem = Similarity.ivfPqTopK(e, queries, "vec_id", "embedding",
      dim = 64, k = 5, nCells = 16, nProbe = 4, m = 8, kCodes = 16)
    assert(indexed.collect().map(_.toSeq).toSet ===
      inMem.collect().map(_.toSeq).toSet)
    // the probe is partition pruning over the CODES directories
    val p = indexed.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [cell"),
      s"probe must prune cell directories:\n$p")
    // ...and the CODES scan's schema carries the ints, never a float
    // vector (the broadcast query side reads embeddings by design)
    val codeScans = p.split("\\+\\-").filter(_.contains("/codes"))
    assert(codeScans.nonEmpty &&
      codeScans.forall(l => l.contains("codes:array<int>") &&
        !l.contains("embedding")), p)
    // append: a new vector encodes against the STORED books and is
    // servable; tombstone: it disappears without a rewrite
    val s2 = spark; import s2.implicits._
    val probe = indexed.filter(col("query_id") === 0L)
      .orderBy(col("rnk")).head()
    // an exact copy of query 0's vector encodes to query 0's own
    // argmin codes, so its ADC distance is the provable minimum for
    // query 0 — and the smallest id wins any code tie outright
    val novel = Seq(Vec(-7L,
      e.filter(col("vec_id") === 0L).head().getSeq[Float](1).toArray)).toDF
    Similarity.pqAppend(spark, novel, "vec_id", "embedding", dir)
    val after = Similarity.pqTopKIndexed(spark, queries,
      "vec_id", "embedding", k = 5, path = dir, nProbe = 4)
    assert(after.filter(col("query_id") === 0L && col("rnk") === 1L)
      .head().getLong(1) == -7L)
    Similarity.ivfTombstone(spark, dir, Seq(-7L).toDF("vec_id"), "vec_id")
    val served = Similarity.pqTopKIndexed(spark, queries,
      "vec_id", "embedding", k = 5, path = dir, nProbe = 4)
    assert(served.filter(col("neighbor_id") === -7L).count() == 0L)
    assert(served.collect().map(_.toSeq).toSet ===
      inMem.collect().map(_.toSeq).toSet)
  }

  test("stored IVF index maintained from a table's change feed: " +
    "appends assign to frozen centroids, erasures tombstone") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf("sf0.001")).select("vec_id", "embedding")
    val half0 = e.filter(col("vec_id") % 2 === 0)
    val half1 = e.filter(col("vec_id") % 2 === 1)
    val queries = e.filter(col("vec_id") < 8)
    val cents = Similarity.sampleCentroids(half0, "vec_id", "embedding", 16)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_feed").toString
    val tbl = s"$root/tbl"; val idx = s"$root/idx"; val ckpt = s"$root/ckpt"

    graft.sources.Snapshots.commit(half0, tbl, statsCol = Some("vec_id")) // v0
    def start() = graft.sources.Snapshots.changesStream(spark, tbl)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.persist()
        try {
          val ins = df.filter(col("__change") === "insert")
            .select("vec_id", "embedding")
          val del = df.filter(col("__change") === "delete").select("vec_id")
          if (ins.head(1).nonEmpty) {
            if (!new java.io.File(s"$idx/centroids").exists)
              Similarity.ivfWriteIndex(ins, "vec_id", "embedding", cents, idx)
            else Similarity.ivfAppend(spark, ins, "vec_id", "embedding", idx)
          }
          if (del.head(1).nonEmpty)
            Similarity.ivfTombstone(spark, idx, del, "vec_id")
        } finally { df.unpersist(); () }
      }.start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // churn: the other half arrives, then three vectors are erased
    graft.sources.Snapshots.commit(half1, tbl)                          // v1
    graft.sources.Snapshots.deleteWhere(spark, tbl,
      col("vec_id").isin(10L, 12L, 14L))                                // v2
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val indexed = Similarity.ivfTopKIndexed(spark, queries,
      "vec_id", "embedding", k = 5, path = idx, nProbe = 4)
    val live = graft.sources.Snapshots.read(spark, tbl)
    val inMem = Similarity.ivfTopKWith(live, queries, "vec_id", "embedding",
      k = 5, centroids = cents, nProbe = 4)
    assert(indexed.collect().map(_.toSeq).toSet ===
      inMem.collect().map(_.toSeq).toSet,
      "feed-maintained index must equal the in-memory plan over the live table")
    assert(indexed.filter(col("neighbor_id").isin(10L, 12L, 14L)).count() == 0,
      "erased vectors must stop being returned")

    // compaction: merge the append's files, apply the tombstones
    // physically, flip the generation — queries unchanged
    def cellFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(
        Similarity.ivfCellsPath(idx, Similarity.ivfGen(spark, idx))))
        .count(_.getName.endsWith(".parquet"))
    }
    val filesBefore = cellFiles()
    val oldGenCells = Similarity.ivfCellsPath(idx, 0)
    Similarity.ivfCompact(spark, idx)
    assert(Similarity.ivfGen(spark, idx) == 1)
    val afterCompact = Similarity.ivfTopKIndexed(spark, queries,
      "vec_id", "embedding", k = 5, path = idx, nProbe = 4)
    assert(afterCompact.collect().map(_.toSeq).toSet ===
      inMem.collect().map(_.toSeq).toSet,
      "compaction must not change query results")
    assert(cellFiles() < filesBefore,
      s"cell files should merge: $filesBefore -> ${cellFiles()}")
    // erased ids stay gone (this reader's plan still anti-joins the
    // applied tombstones — it must DRAIN before vacuum reclaims them)
    assert(afterCompact.filter(col("neighbor_id").isin(10L, 12L, 14L))
      .count() == 0, "tombstoned vectors must be physically gone")
    // grace window: the retired generation outlives the flip for
    // readers that resolved the old meta; vacuum reclaims it
    assert(new java.io.File(oldGenCells).exists,
      "the old generation must outlive the flip until vacuum")
    assert(Similarity.ivfVacuum(spark, idx) > 0)
    assert(!new java.io.File(oldGenCells).exists,
      "vacuum must reclaim the retired generation")
    assert(!new java.io.File(s"$idx/tombstones").exists,
      "applied tombstones must be dropped by vacuum")
    // a FRESH query after vacuum: erased ids stay gone with the
    // tombstone set physically cleared
    val afterVacuum = Similarity.ivfTopKIndexed(spark, queries,
      "vec_id", "embedding", k = 5, path = idx, nProbe = 4)
    assert(afterVacuum.collect().map(_.toSeq).toSet ===
      inMem.collect().map(_.toSeq).toSet,
      "post-vacuum queries must be unchanged")
    // appends keep working after the flip
    Similarity.ivfAppend(spark,
      spark.createDataFrame(Seq((9000001L, Array.fill(64)(0.1f))))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx)
    assert(spark.read.parquet(Similarity.ivfCellsPath(idx, 1))
      .filter(col("neighbor_id") === 9000001L).count() == 1)
  }

  test("semanticDedup: only the smallest id of a tau-similar in-cell group survives") {
    // ids 1,2,3 ride direction A (near-identical), 4 rides B, 5 rides
    // B (similar to 4). Sampled centroids are ids 1 and 2 — both
    // direction A — so the cells split {1,3} / {2,4,5}: 3 is vetoed by
    // 1, 5 by 4, and 2 SURVIVES because its in-cell smaller-id
    // neighbors (none) can't veto — the cluster-bound approximation,
    // visible by construction.
    def v(a: Float, b: Float) = Array.tabulate(8)(i =>
      if (i == 0) a else if (i == 1) b else 0f)
    val emb = spark.createDataFrame(Seq(
      (1L, v(1f, 0f)), (2L, v(0.99f, 0.01f)), (3L, v(1.01f, -0.01f)),
      (4L, v(0f, 1f)), (5L, v(0.01f, 0.98f))
    )).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
        nCells = 2, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) == (0L, true))
    assert(out(2L) == (0L, true))
    assert(out(4L) == (0L, true))
    assert(out(3L) == (1L, false)) // vetoed by 1 only (2 sits in the other cell)
    assert(out(5L) == (1L, false)) // vetoed by 4 only (2 is below tau)
    // k-means refinement regroups {1,2,3} together, so 2 is then
    // ALSO deduplicated — better clustering tightens the prune
    val refined = Similarity.semanticDedup(emb, "vec_id", "embedding",
        nCells = 2, threshold = 0.95, iters = 2)
      .filter("kept").collect().map(_.getLong(0)).toSet
    assert(refined == Set(1L, 4L))
    // NULL embedding: NULL cell, kept, never vetoes anyone — the
    // documented auditable contract
    val withNull = emb.union(spark.createDataFrame(
      Seq((9L, null.asInstanceOf[Array[Float]]))).toDF("vec_id", "embedding"))
    val r9 = Similarity.semanticDedup(withNull, "vec_id", "embedding",
        nCells = 2, threshold = 0.95)
      .filter("vec_id = 9").collect().head
    assert(r9.isNullAt(1) && r9.getLong(2) == 0L && r9.getBoolean(3))
  }

  test("semanticDedup giant-cell guard: a planted hot cell fails fast, naming it") {
    // 60 identical vectors: cosine ties to both centroids resolve to
    // the smaller cell id, so ALL land in one cell — with maxCellSize
    // below that, the in-cell pair join would go quadratic on the hot
    // cell; the guard must trip BEFORE the join runs, with the
    // measured count in the message
    val emb = spark.createDataFrame((1 to 60).map { i =>
      (i.toLong, Array.tabulate(8)(d => if (d == 0) 1f else 0f))
    }).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticDedup(emb, "vec_id", "embedding",
        nCells = 2, threshold = 0.99, maxCellSize = 50L)
    }
    assert(e.getMessage.contains("maxCellSize=50"), e.getMessage)
    assert(e.getMessage.contains("60 docs"), e.getMessage)
    // a deliberately raised cap runs the same input to completion
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
      nCells = 2, threshold = 0.999999, maxCellSize = 60L)
    assert(out.count() == 60)
  }

  test("semanticContamination: paraphrase-close corpus docs pair with their benchmark twin") {
    def v(a: Float, b: Float) = Array.tabulate(8)(i =>
      if (i == 0) a else if (i == 1) b else 0f)
    // benchmark: two orthogonal "questions"; corpus: 101 rides A
    // (a paraphrase leak), 102 rides B, 103 is diagonal (clears no
    // threshold at tau=0.95), 104 has a NULL embedding
    val bench = spark.createDataFrame(Seq(
      (1L, v(1f, 0f)), (2L, v(0f, 1f)))).toDF("vec_id", "embedding")
    val corpus = spark.createDataFrame(Seq(
      (101L, v(0.99f, 0.01f)), (102L, v(0.02f, 1.01f)),
      (103L, v(1f, 1f)), (104L, null.asInstanceOf[Array[Float]])
    )).toDF("vec_id", "embedding")
    val out = Similarity.semanticContamination(corpus, bench,
        "vec_id", "embedding", nCells = 2, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(out.keySet == Set((101L, 1L), (102L, 2L)), out.toString)
    assert(out((101L, 1L)) > 0.99 && out((102L, 2L)) > 0.99)
    // hot-cell guard: everything in one cell with a tiny cap trips
    val fat = spark.createDataFrame((1 to 30).map(i =>
      (i.toLong + 200L, v(1f, 0f)))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticContamination(fat, bench.limit(1),
        "vec_id", "embedding", nCells = 1, threshold = 0.5,
        maxCellPairs = 10L)
    }
    assert(e.getMessage.contains("maxCellPairs=10"), e.getMessage)
  }

  test("centroid drift: probe flags a planted cluster, recall decays, recluster restores it") {
    import graft.sources.{IncrementalViews, Snapshots}
    import org.apache.spark.sql.functions._
    val dim = 8
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_drift").toString
    val src = java.nio.file.Files.createTempDirectory("graft_ivf_src").toString
    val mom = java.nio.file.Files.createTempDirectory("graft_ivf_mom").toString
    val rnd = new java.util.Random(11)
    def jit(base: Array[Float], amt: Float) =
      base.map(x => x + amt * rnd.nextGaussian().toFloat)
    def oneHot(d: Int) = Array.tabulate(dim)(i => if (i == d) 1f else 0f)
    // corpus A: 4 tight orthogonal clusters; ids 1..4 are the pure
    // directions (k-means init anchors), members ride 100+
    val a = Seq.tabulate(4)(d => (d + 1).toLong -> oneHot(d)) ++
      (for (d <- 0 until 4; j <- 0 until 10)
        yield (100L + d * 20 + j) -> jit(oneHot(d), 0.02f))
    val aDf = spark.createDataFrame(a).toDF("vec_id", "embedding")
    Similarity.ivfWriteIndex(aDf, "vec_id", "embedding",
      Similarity.kmeansCentroids(aDf, "vec_id", "embedding", 4, 2), idx)
    Snapshots.commit(aDf, src, statsCol = Some("vec_id"))
    IncrementalViews.refreshEmbeddingMoments(spark, src, mom, "embedding", dim)
    Similarity.ivfRecordBaseline(spark, idx, mom)
    val calm = Similarity.ivfDrift(spark, idx, mom).collect().head
    assert(!calm.getBoolean(4), s"fresh baseline must not read as drift: $calm")

    // planted drift: a NEW tight cluster on the e0/e1 diagonal —
    // appended members tie ~0.707 to both old centroids, so jitter
    // scatters near-identical vectors across TWO cells; id 5 makes it
    // the fifth k-means anchor at recluster time
    val g = Array.tabulate(dim)(i =>
      if (i <= 1) (1.0 / math.sqrt(2)).toFloat else 0f)
    val b = (5L -> g) +: Seq.tabulate(19)(j => (6L + j) -> jit(g, 0.03f))
    val bDf = spark.createDataFrame(b).toDF("vec_id", "embedding")
    Similarity.ivfAppend(spark, bDf, "vec_id", "embedding", idx)
    Snapshots.commit(bDf, src, statsCol = Some("vec_id"))
    IncrementalViews.refreshEmbeddingMoments(spark, src, mom, "embedding", dim)
    val hot = Similarity.ivfDrift(spark, idx, mom).collect().head
    assert(hot.getBoolean(4),
      s"a fifth of the corpus in a new direction must read as drift: $hot")
    // split across cells is the decay mechanism — prove it happened
    val gen0 = Similarity.ivfGen(spark, idx)
    val bCells = spark.read.parquet(Similarity.ivfCellsPath(idx, gen0))
      .filter(col("neighbor_id") >= 5L && col("neighbor_id") <= 24L)
      .select("cell").distinct().count()
    assert(bCells >= 2, s"planted cluster should straddle cells, got $bCells")

    def recall(): Double = {
      val live = Snapshots.read(spark, src)
      val truth = Similarity.bruteForceTopK(live, bDf, "vec_id",
          "embedding", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Similarity.ivfTopKIndexed(spark, bDf, "vec_id",
          "embedding", k = 3, path = idx, nProbe = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val before = recall()
    assert(before < 0.9, s"straddled cluster should cost recall, got $before")

    // recluster: new k-means generation over the live table,
    // publish-then-point; readers of the old gen keep BOTH their
    // centroids and cells until vacuum
    Similarity.ivfRecluster(spark, Snapshots.read(spark, src), "vec_id",
      "embedding", idx, nCells = 5, iters = 3)
    assert(Similarity.ivfGen(spark, idx) == gen0 + 1)
    val after = recall()
    assert(after == 1.0, s"recluster must restore nProbe=1 recall, got $after")
    // the old pair is still readable at the OLD generation (grace
    // window for in-flight readers), then vacuum reclaims it
    assert(Similarity.ivfReadCentroidsAt(spark, idx, gen0).length == 4)
    assert(new java.io.File(Similarity.ivfCellsPath(idx, gen0)).exists)
    assert(Similarity.ivfVacuum(spark, idx) > 0)
    assert(!new java.io.File(Similarity.ivfCellsPath(idx, gen0)).exists)
    // re-baseline after the remedy: the probe goes calm again
    Similarity.ivfRecordBaseline(spark, idx, mom)
    assert(!Similarity.ivfDrift(spark, idx, mom).collect().head.getBoolean(4))
  }

  test("maintainIvf heals a planted drift unattended: auto-recluster + one baseline update") {
    import graft.sources.Snapshots
    import org.apache.spark.sql.functions._
    val dim = 8
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_auto").toString
    val (src, idx, mom, ck) =
      (s"$root/src", s"$root/idx", s"$root/mom", s"$root/ck")
    val rnd = new java.util.Random(13)
    def jit(base: Array[Float], amt: Float) =
      base.map(x => x + amt * rnd.nextGaussian().toFloat)
    def oneHot(d: Int) = Array.tabulate(dim)(i => if (i == d) 1f else 0f)
    val a = Seq.tabulate(4)(d => (d + 1).toLong -> oneHot(d)) ++
      (for (d <- 0 until 4; j <- 0 until 10)
        yield (100L + d * 20 + j) -> jit(oneHot(d), 0.02f))
    val aDf = spark.createDataFrame(a).toDF("vec_id", "embedding")
    def tick(): Unit = Similarity.maintainIvf(spark, src, idx, mom, ck,
      "vec_id", "embedding", nCells = 5, dim = dim).awaitTermination()
    def baseline(): String = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$idx/_graft_ivf_baseline.json")), "UTF-8")
    // tick 1: first batch BUILDS the index and records the baseline
    Snapshots.commit(aDf, src, statsCol = Some("vec_id"))
    tick()
    assert(Similarity.ivfGen(spark, idx) == 0)
    val b0 = baseline()
    // tick 2: the planted diagonal cluster arrives — the probe must
    // flag it and the maintainer recluster + re-baseline UNATTENDED
    val g = Array.tabulate(dim)(i =>
      if (i <= 1) (1.0 / math.sqrt(2)).toFloat else 0f)
    val b = (5L -> g) +: Seq.tabulate(19)(j => (6L + j) -> jit(g, 0.03f))
    val bDf = spark.createDataFrame(b).toDF("vec_id", "embedding")
    Snapshots.commit(bDf, src, statsCol = Some("vec_id"))
    tick()
    assert(Similarity.ivfGen(spark, idx) == 1,
      "drift must trigger an automatic recluster")
    val b1 = baseline()
    assert(b1 != b0, "the recluster must re-record the drift baseline")
    val live = Snapshots.read(spark, src)
    val truth = Similarity.bruteForceTopK(live, bDf, "vec_id",
        "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ivfTopKIndexed(spark, bDf, "vec_id",
        "embedding", k = 3, path = idx, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth,
      "the automatic recluster must restore nProbe=1 recall")
    // tick 3: a calm in-distribution batch — NO recluster, baseline
    // untouched (exactly one update per recluster)
    val c = Seq.tabulate(4)(j => (300L + j) -> jit(oneHot(j % 4), 0.02f))
    Snapshots.commit(spark.createDataFrame(c).toDF("vec_id", "embedding"),
      src, statsCol = Some("vec_id"))
    tick()
    assert(Similarity.ivfGen(spark, idx) == 1,
      "a calm batch must not recluster")
    assert(baseline() == b1, "a calm batch must not touch the baseline")
    // tick 4 with the vacuum cadence on: the recluster's retired
    // generation is reclaimed by the maintainer itself
    assert(new java.io.File(Similarity.ivfCellsPath(idx, 0)).exists)
    Snapshots.commit(spark.createDataFrame(
        Seq(400L -> jit(oneHot(0), 0.02f))).toDF("vec_id", "embedding"),
      src, statsCol = Some("vec_id"))
    Similarity.maintainIvf(spark, src, idx, mom, ck, "vec_id", "embedding",
      nCells = 5, dim = dim, vacuumEvery = 1).awaitTermination()
    assert(!new java.io.File(Similarity.ivfCellsPath(idx, 0)).exists,
      "the vacuum cadence must reclaim the retired generation")
  }

  test("retired tombstones never re-hide a vector the recluster re-introduced") {
    import org.apache.spark.sql.functions._
    val s = spark; import s.implicits._
    val dim = 4
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_tomb").toString
    def v(d: Int) = Array.tabulate(dim)(i => if (i == d) 1f else 0.01f * i)
    val corpus = Seq(
      (100L, v(0)), (101L, v(0)), (102L, v(1)), (103L, v(1)))
      .toDF("vec_id", "embedding")
    Similarity.ivfWriteIndex(corpus, "vec_id", "embedding",
      Similarity.sampleCentroids(corpus, "vec_id", "embedding", 2), idx)
    val q = Seq((-1L, v(0).toSeq)).toDF("q", "v")
    def hits(): Set[Long] = Similarity.ivfTopKIndexed(spark, q, "q", "v",
      k = 4, path = idx, nProbe = 2).collect().map(_.getLong(1)).toSet
    assert(hits().contains(100L))
    // logical delete hides 100 from queries
    Similarity.ivfTombstone(spark, idx, Seq(100L).toDF("vec_id"), "vec_id")
    assert(!hits().contains(100L))
    // recluster from a corpus that RE-INTRODUCES 100: the old
    // tombstone is applied-and-retired with the old generation, so
    // the re-introduced vector must be visible BEFORE vacuum
    Similarity.ivfRecluster(spark, corpus, "vec_id", "embedding", idx,
      nCells = 2)
    assert(hits().contains(100L),
      "a retired tombstone must not hide the re-introduced vector")
    // a later compact must not re-apply the retired tombstone either
    Similarity.ivfCompact(spark, idx)
    assert(hits().contains(100L),
      "compact re-applied a tombstone the recluster already retired")
    // fresh tombstones (post-recluster) still apply...
    Similarity.ivfTombstone(spark, idx, Seq(102L).toDF("vec_id"), "vec_id")
    assert(!hits().contains(102L) && hits().contains(100L))
    // ...and vacuum reclaims the retired files with semantics intact
    assert(Similarity.ivfVacuum(spark, idx) > 0)
    assert(!hits().contains(102L) && hits().contains(100L))
  }

  test("PQ index enforces its stored (dim, m, kCodes) contract loudly") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf("sf0.001")).select("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_pqmeta").toString
    Similarity.pqWriteIndex(e, "vec_id", "embedding", dir,
      dim = 64, nCells = 4, m = 8, kCodes = 8)
    // a query whose vectors are the wrong length must FAIL BY NAME,
    // not null-pad through zip_with into a garbage top-k
    val short = e.filter(col("vec_id") < 2)
      .select(col("vec_id"), slice(col("embedding"), 1, 32).as("embedding"))
    val ex = intercept[Exception] {
      Similarity.pqTopKIndexed(spark, short, "vec_id", "embedding",
        k = 3, path = dir, nProbe = 2).collect()
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(rootMsg(ex).contains("does not match index dim 64"), rootMsg(ex))
    // same guard on the append path
    val ex2 = intercept[Exception] {
      Similarity.pqAppend(spark,
        short.withColumn("vec_id", col("vec_id") + 1000L),
        "vec_id", "embedding", dir)
    }
    assert(rootMsg(ex2).contains("does not match index dim 64"), rootMsg(ex2))
    // no meta file → the read path refuses instead of guessing
    val empty = java.nio.file.Files.createTempDirectory("graft_pqnometa").toString
    val ex3 = intercept[IllegalArgumentException] {
      Similarity.pqTopKIndexed(spark, e.filter(col("vec_id") < 2),
        "vec_id", "embedding", k = 3, path = empty, nProbe = 2)
    }
    assert(ex3.getMessage.contains("_graft_pq_meta.json"))
  }

  test("pqWriteIndex rebuild clears stale IVF artifacts at the same path") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf("sf0.001")).select("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_pqover").toString
    // a plain IVF index lives here first (cells/, centroids/, meta,
    // tombstones, then a compaction generation)
    val cents = Similarity.sampleCentroids(e, "vec_id", "embedding", 4)
    Similarity.ivfWriteIndex(e, "vec_id", "embedding", cents, dir)
    val s2 = spark; import s2.implicits._
    Similarity.ivfTombstone(spark, dir, Seq(3L).toDF("vec_id"), "vec_id")
    Similarity.ivfCompact(spark, dir)
    assert(new java.io.File(s"$dir/_graft_ivf_meta.json").exists)
    // rebuilding as PQ must leave ONLY PQ artifacts — no mixed dir
    Similarity.pqWriteIndex(e, "vec_id", "embedding", dir,
      dim = 64, nCells = 4, m = 8, kCodes = 8)
    val names = new java.io.File(dir).listFiles.map(_.getName).toSet
    assert(!names.exists(_.startsWith("cells")), names.toString)
    assert(!names.contains("_graft_ivf_meta.json"), names.toString)
    assert(!names.contains("_graft_ivf_baseline.json"), names.toString)
    assert(names.contains("codes") && names.contains("books") &&
      names.contains("centroids") && names.contains("_graft_pq_meta.json"),
      names.toString)
    // and the rebuilt index serves
    assert(Similarity.pqTopKIndexed(spark, e.filter(col("vec_id") < 2),
      "vec_id", "embedding", k = 3, path = dir, nProbe = 2).count() > 0)
  }

  test("maintainIvf skips tombstones when the first observed batch is delete-only") {
    import graft.sources.Snapshots
    import org.apache.spark.sql.functions._
    val dim = 8
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_delonly").toString
    val (src, mom, ck) = (s"$root/src", s"$root/mom", s"$root/ck")
    val data = Seq.tabulate(20)(i =>
      (i.toLong, Array.tabulate(dim)(j => if (j == i % 4) 1f else 0f)))
    Snapshots.commit(spark.createDataFrame(data).toDF("vec_id", "embedding"),
      src, statsCol = Some("vec_id"))
    // advance the subscription past v0 against a throwaway index path,
    // then delete rows and re-point the SAME checkpoint at a FRESH
    // index location: its first observed batch is delete-only and no
    // index exists there yet — the maintainer must no-op, not crash
    Similarity.maintainIvf(spark, src, s"$root/idx0", mom, ck,
      "vec_id", "embedding", nCells = 4, dim = dim).awaitTermination()
    Snapshots.deleteWhere(spark, src, col("vec_id") < 5)
    Similarity.maintainIvf(spark, src, s"$root/idx1", mom, ck,
      "vec_id", "embedding", nCells = 4, dim = dim).awaitTermination()
    assert(!new java.io.File(s"$root/idx1/centroids").exists,
      "a delete-only first batch must not conjure an index")
    assert(!new java.io.File(s"$root/idx1/tombstones").exists,
      "a delete-only first batch must not tombstone a non-existent index")
    // the next insert batch builds idx1 normally
    Snapshots.commit(spark.createDataFrame(Seq((100L,
      Array.tabulate(dim)(j => if (j == 0) 1f else 0f))))
      .toDF("vec_id", "embedding"), src, statsCol = Some("vec_id"))
    Similarity.maintainIvf(spark, src, s"$root/idx1", mom, ck,
      "vec_id", "embedding", nCells = 1, dim = dim).awaitTermination()
    assert(new java.io.File(s"$root/idx1/centroids").exists)
  }

  test("ivfPqTopKReranked: exact rerank rescues ADC recall; the contract verdict holds") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf("sf0.001")).select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    val raw = pairs(Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
      dim = 64, k = 5, nProbe = 8))
    val rr = Similarity.ivfPqTopKReranked(e, q, "vec_id", "embedding",
      dim = 64, k = 5)
    val rrRecall = (truth intersect pairs(rr)).size.toDouble / truth.size
    val rawRecall = (truth intersect raw).size.toDouble / truth.size
    // the serve's whole point: shortlist+exact-rerank beats raw ADC
    // and clears the published 0.8 floor with headroom (measured 0.9+)
    assert(rrRecall >= 0.8, s"reranked recall $rrRecall < 0.8 floor")
    assert(rrRecall >= rawRecall,
      s"rerank made recall WORSE: $rrRecall < raw $rawRecall")
    // a reranked hit carries the EXACT cosine, identical to brute force
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    rr.collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bf.get(key).foreach(c => assert(c == r.getDouble(3),
        s"reranked cosine for $key diverged from brute force"))
    }
    val verdict = Similarity.ivfPqRecallCheck(e, q, "vec_id", "embedding",
      dim = 64, k = 5).head()
    assert(verdict.getLong(0) == 8L && verdict.getBoolean(3),
      s"verdict row disagrees (measured recall $rrRecall): $verdict")
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKReranked(e, q, "vec_id", "embedding",
        dim = 64, k = 10, shortlist = 5)
    }
    // the STORED serve reranks to the identical page: same sample-init
    // centroids+books → stored shortlist == in-memory shortlist →
    // identical exact-rerank rows
    val dir = java.nio.file.Files.createTempDirectory("graft_pqrr").toString
    Similarity.pqWriteIndex(e, "vec_id", "embedding", dir,
      dim = 64, nCells = 16, m = 8, kCodes = 16)
    val stored = Similarity.pqTopKIndexedReranked(spark, q, e,
      "vec_id", "embedding", k = 5, path = dir)
    assert(stored.collect().map(_.toSeq).toSet ==
      rr.collect().map(_.toSeq).toSet,
      "stored reranked serve must equal the in-memory rerank")
  }

  test("mmrRerank: greedy diversification matches a hand computation") {
    import org.apache.spark.sql.functions._
    val s2 = spark; import s2.implicits._
    // query A: two relevant near-duplicates (both [1,0]) and one less
    // relevant orthogonal doc — MMR must interleave the orthogonal one
    val cands = Seq(
      (1L, 10L, 0.9, Array(1f, 0f)),
      (1L, 11L, 0.85, Array(1f, 0f)),
      (1L, 12L, 0.5, Array(0f, 1f)),
      // query B: only one candidate — fewer than k picks is fine
      (2L, 20L, 0.7, Array(1f, 1f))
    ).toDF("query_id", "neighbor_id", "rel", "vec")
    val out = Similarity.mmrRerank(cands, "query_id", "neighbor_id",
        "rel", "vec", k = 3, lambda = 0.5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._3) -> ((r._2, r._4))).toMap
    // r1: argmax 0.5*rel → 10 @ 0.45
    // r2: 11 scores 0.425−0.5·cos([1,0],[1,0])=−0.075; 12 scores
    //     0.25−0.5·0=0.25 → 12 wins: diversity beats raw relevance
    // r3: 11 @ −0.075 (max-sim to {10,12} is 1)
    assert(out((1L, 1L)) == ((10L, 0.45)))
    assert(out((1L, 2L)) == ((12L, 0.25)))
    assert(out((1L, 3L)) == ((11L, -0.075)))
    assert(out((2L, 1L)) == ((20L, 0.35)))
    assert(!out.contains((2L, 2L)), "one candidate yields one pick")
    // duplicate suppression is λ-tunable: pure relevance ignores sims
    val pure = Similarity.mmrRerank(cands, "query_id", "neighbor_id",
        "rel", "vec", k = 2, lambda = 1.0)
      .as[(Long, Long, Long, Double)].collect()
      .filter(_._1 == 1L).sortBy(_._3).map(_._2)
    assert(pure.toSeq == Seq(10L, 11L))
    // the page bound fails loudly, naming the limit
    val ex = intercept[Exception] {
      Similarity.mmrRerank(cands, "query_id", "neighbor_id",
        "rel", "vec", k = 2, maxCandidates = 2).collect()
    }
    def msgs2(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(msgs2(ex).contains("maxCandidates=2"), msgs2(ex))
    // an array<double> page (randomProject's output shape) ranks
    // identically through the float cast — not silently garbage via a
    // raw 4-byte reinterpretation of 8-byte elements
    val dbl = cands.withColumn("vec", col("vec").cast("array<double>"))
    val viaDouble = Similarity.mmrRerank(dbl, "query_id", "neighbor_id",
        "rel", "vec", k = 3, lambda = 0.5)
      .collect().map(_.toSeq).toSet
    val viaFloat = Similarity.mmrRerank(cands, "query_id", "neighbor_id",
        "rel", "vec", k = 3, lambda = 0.5)
      .collect().map(_.toSeq).toSet
    assert(viaDouble == viaFloat,
      "a double-typed vector page must rank exactly like its float twin")
    // a page whose vectors disagree on dimension fails BY NAME
    val bad = Seq(
      (1L, 10L, 0.9, Array(1f, 0f)),
      (1L, 11L, 0.8, Array(1f, 0f, 1f))
    ).toDF("query_id", "neighbor_id", "rel", "vec")
    val ex2 = intercept[Exception] {
      Similarity.mmrRerank(bad, "query_id", "neighbor_id",
        "rel", "vec", k = 2).collect()
    }
    assert(msgs2(ex2).contains("disagree on dimension"), msgs2(ex2))
  }

  test("randomProject: deterministic Rademacher JL map preserves geometry loosely") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf("sf0.001")).select("vec_id", "embedding")
    // the matrix is ±1/√outDim, fully determined by the seed
    val m = Similarity.rpMatrix(64, 16, seed = 7L)
    assert(m.length == 16 && m.forall(_.length == 64))
    assert(m.flatten.forall(x => math.abs(math.abs(x) - 0.25) < 1e-15))
    assert(Similarity.rpMatrix(64, 16, 7L).flatten.toSeq == m.flatten.toSeq)
    assert(Similarity.rpMatrix(64, 16, 8L).flatten.toSeq != m.flatten.toSeq)
    val p1 = Similarity.randomProject(e, "vec_id", "embedding", 64, 16, 7L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val p2 = Similarity.randomProject(e, "vec_id", "embedding", 64, 16, 7L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 == p2, "same seed must reproduce the projection exactly")
    assert(p1.values.forall(_.length == 16))
    // JL property, loose: squared norms survive within a broad band
    // on average (E‖Rv‖² = ‖v‖²; k=16 gives wide but bounded spread)
    val orig = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val ratios = p1.keys.toSeq.sorted.take(50).map { id =>
      val n0 = orig(id).map(x => x.toDouble * x).sum
      val n1 = p1(id).map(x => x * x).sum
      n1 / n0
    }
    val meanRatio = ratios.sum / ratios.size
    assert(meanRatio > 0.6 && meanRatio < 1.6,
      s"JL mean norm ratio off: $meanRatio")
    assert(ratios.forall(r => r > 0.05 && r < 6.0),
      s"JL pointwise ratio exploded: ${ratios.min} .. ${ratios.max}")
    // wrong input dim fails by name, never silently null-pads
    val short = e.select(col("vec_id"),
      slice(col("embedding"), 1, 32).as("embedding"))
    val ex = intercept[Exception] {
      Similarity.randomProject(short, "vec_id", "embedding", 64, 16, 7L)
        .collect()
    }
    def msgs(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(msgs(ex).contains("does not match index dim 64"), msgs(ex))
    intercept[IllegalArgumentException] {
      Similarity.rpMatrix(16, 64)
    }
  }

  test("maintainPq: feed-subscribed IVF-PQ index retrains itself on planted drift") {
    import graft.sources.Snapshots
    import org.apache.spark.sql.functions._
    val dim = 8
    val root = java.nio.file.Files.createTempDirectory("graft_pq_auto").toString
    val (src, idx, ck) = (s"$root/src", s"$root/idx", s"$root/ck")
    val rnd = new java.util.Random(5)
    def near(base: Array[Float]) =
      base.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    def clus(d: Int) = Array.tabulate(dim)(i => if (i < 4 == (d == 0)) 1f else 0f)
    def tick(): Unit = Similarity.maintainPq(spark, src, idx, ck,
      "vec_id", "embedding", dim = dim, nCells = 2, m = 2, kCodes = 4,
      iters = 2, retrainTol = 0.5).awaitTermination()
    def books() = Similarity.pqReadBooks(spark, idx).flatten.flatten.toSeq
    // tick 1: first batch builds index + baseline
    val a = Seq.tabulate(24)(i => (i.toLong, near(clus(i % 2))))
    Snapshots.commit(spark.createDataFrame(a).toDF("vec_id", "embedding"),
      src, statsCol = Some("vec_id"))
    tick()
    assert(new java.io.File(s"$idx/_graft_pq_meta.json").exists)
    assert(new java.io.File(s"$idx/_graft_pq_baseline.json").exists)
    val b0 = books()
    // tick 2: calm in-distribution batch — append only, books frozen
    val b = Seq.tabulate(4)(i => (100L + i, near(clus(i % 2))))
    Snapshots.commit(spark.createDataFrame(b).toDF("vec_id", "embedding"),
      src, statsCol = Some("vec_id"))
    tick()
    assert(books() == b0, "a calm batch must not retrain the books")
    // the appended vectors serve from the frozen books
    val q100 = spark.createDataFrame(Seq((100L, a(0)._2)))
      .toDF("vec_id", "embedding")
    assert(Similarity.pqTopKIndexed(spark, q100, "vec_id", "embedding",
      k = 3, path = idx, nProbe = 2).count() == 3)
    // tick 3: planted drift — far-away scaled cluster dominates; the
    // frozen books' measured distortion blows past baseline·(1+tol)
    // and the maintainer rebuilds + re-baselines unattended
    val c = Seq.tabulate(40)(i =>
      (200L + i, near(clus(i % 2)).map(_ * 25f)))
    Snapshots.commit(spark.createDataFrame(c).toDF("vec_id", "embedding"),
      src, statsCol = Some("vec_id"))
    tick()
    assert(books() != b0, "planted drift must retrain the codebooks")
    // tick 4: deletes tombstone through the shared convention
    Snapshots.deleteWhere(spark, src, col("vec_id") === 200L)
    tick()
    val served = Similarity.pqTopKIndexed(spark,
      spark.createDataFrame(Seq((201L, c(1)._2))).toDF("vec_id", "embedding"),
      k = 3, path = idx, nProbe = 2, idCol = "vec_id", vecCol = "embedding")
    assert(served.filter(col("neighbor_id") === 200L).count() == 0,
      "tombstoned id must stop serving")
    assert(served.count() == 3)
  }

  test("pqRetrain: publish-then-point generation flip — a crash-interrupted retrain never breaks the serve") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf("sf0.001")).select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_pqgen").toString
    Similarity.pqWriteIndex(e, "vec_id", "embedding", dir,
      dim = 64, nCells = 4, m = 8, kCodes = 8)
    assert(Similarity.pqGen(spark, dir) == 0)
    def serve() = Similarity.pqTopKIndexed(spark, q, "vec_id", "embedding",
      k = 3, path = dir, nProbe = 4).collect().map(_.toSeq).toSet
    val before = serve()
    assert(before.nonEmpty)
    // CRASH-INTERRUPTED retrain: next-gen artifacts half-written (here:
    // garbage), pointer NOT flipped — the serve must return generation
    // 0's complete answer, never touch the orphans, never miss meta
    for (n <- Seq("codes-g1", "books-g1", "centroids-g1")) {
      val d = new java.io.File(s"$dir/$n")
      d.mkdirs()
      java.nio.file.Files.write(new java.io.File(d, "part-junk").toPath,
        Array[Byte](1, 2, 3))
    }
    assert(serve() == before,
      "orphan next-generation artifacts must be invisible before the flip")
    // the retry OVERWRITES the orphans and flips the pointer last
    Similarity.pqRetrain(spark, e, "vec_id", "embedding", dir,
      dim = 64, nCells = 4, m = 8, kCodes = 8, iters = 1)
    assert(Similarity.pqGen(spark, dir) == 1)
    // the retired generation stays on disk for in-flight readers
    assert(new java.io.File(s"$dir/codes").exists &&
      new java.io.File(s"$dir/books").exists &&
      new java.io.File(s"$dir/centroids").exists)
    val after = serve()
    assert(after.map(_.take(1)).size == before.map(_.take(1)).size &&
      after.size == before.size,
      "post-flip serve must be a complete answer from the new generation")
    // appends encode against and land in the CURRENT generation
    val s2 = spark; import s2.implicits._
    val novel = e.filter(col("vec_id") === 0)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    Similarity.pqAppend(spark, novel, "vec_id", "embedding", dir)
    assert(new java.io.File(s"$dir/codes-g1").listFiles.nonEmpty)
    val q0 = e.filter(col("vec_id") === 0)
    assert(Similarity.pqTopKIndexed(spark, q0, "vec_id", "embedding",
        k = 3, path = dir, nProbe = 4)
      .filter(col("neighbor_id") === 5000L).count() == 1,
      "an exact copy appended post-flip must serve as its twin's top hit")
    // vacuum reclaims the retired generation; semantics intact (the
    // expected page includes the post-flip append)
    val afterAppend = serve()
    assert(Similarity.pqVacuum(spark, dir) > 0)
    assert(!new java.io.File(s"$dir/codes").exists,
      "vacuum must reclaim the retired codes generation")
    assert(serve() == afterAppend)
  }

  test("pqRetrain: a stale corpus frame cannot resurrect an erased id; activated pending retirements are adopted, future ones kept") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf("sf0.001")).select("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_pqstale").toString
    Similarity.pqWriteIndex(e, "vec_id", "embedding", dir,
      dim = 64, nCells = 4, m = 8, kCodes = 8)
    val s2 = spark; import s2.implicits._
    // erase id 7, then retrain from the STALE full frame (it still
    // holds 7): the unconditional tombstone anti-join must keep the
    // erased id out of the rebuilt codes
    Similarity.ivfTombstone(spark, dir, Seq(7L).toDF("vec_id"), "vec_id")
    Similarity.pqRetrain(spark, e, "vec_id", "embedding", dir,
      dim = 64, nCells = 4, m = 8, kCodes = 8, iters = 1)
    val q7 = e.filter(col("vec_id") === 7L)
    def hits7() = Similarity.pqTopKIndexed(spark, q7, "vec_id", "embedding",
        k = 5, path = dir, nProbe = 4, excludeSelf = false)
      .filter(col("neighbor_id") === 7L).count()
    assert(hits7() == 0, "stale-corpus retrain resurrected an erased id")
    // the applied tombstone retired WITH the generation: a legitimate
    // re-append of the same id must serve (its own exact twin)
    Similarity.pqAppend(spark, q7, "vec_id", "embedding", dir)
    assert(hits7() == 1, "a retired tombstone re-hid a re-appended id")
    // crash window AFTER the flip, BEFORE the promote: an activated
    // pending entry (activation gen <= current) is adopted by vacuum;
    // one whose flip never landed must survive untouched
    val gen = Similarity.pqGen(spark, dir)
    val junk = new java.io.File(s"$dir/junk-gen"); junk.mkdirs()
    java.nio.file.Files.write(new java.io.File(junk, "f").toPath,
      Array[Byte](1))
    operators.IndexMaintenance.recordPendingRetired(spark, dir,
      gen.toLong, "crash-sim", Seq(junk.toString))
    val keep = new java.io.File(s"$dir/keep-gen"); keep.mkdirs()
    java.nio.file.Files.write(new java.io.File(keep, "f").toPath,
      Array[Byte](1))
    operators.IndexMaintenance.recordPendingRetired(spark, dir,
      gen + 5L, "future-sim", Seq(keep.toString))
    Similarity.pqVacuum(spark, dir)
    assert(!junk.exists,
      "vacuum must adopt an activated pending retirement (lost promote)")
    assert(keep.exists,
      "a pending retirement whose flip never landed must not be vacuumed")
  }

  test("pqTopKIndexedRerankedStored: the rerank fetch opens only pruned corpus files") {
    import org.apache.spark.sql.functions._
    import graft.sources.Snapshots
    val data = clustered // ids c*100+m, clusters 0..9 (all ids < 1000)
    val root = java.nio.file.Files.createTempDirectory("graft_pqstore").toString
    val (corpusDir, idx) = (s"$root/corpus", s"$root/idx")
    // commit 1: the indexed corpus; commit 2: DECOY rows that are in
    // the table but not in the index — no shortlist can ever name
    // them, so their id-disjoint files must never be opened by the
    // fetch (per-file id stats + blooms are the pruning levers)
    Snapshots.commit(data, corpusDir,
      statsCol = Some("vec_id"), bloomCols = Seq("vec_id"))
    Snapshots.commit(
      data.select((col("vec_id") + 100000L).as("vec_id"), col("embedding")),
      corpusDir, statsCol = Some("vec_id"), bloomCols = Seq("vec_id"))
    Similarity.pqWriteIndex(data, "vec_id", "embedding", idx,
      dim = 64, nCells = 10, m = 8, kCodes = 16)
    val q = data.filter("vec_id % 100 = 0 and vec_id < 300") // clusters 0-2
    def stored() = Similarity.pqTopKIndexedRerankedStored(spark, q,
      corpusDir, "vec_id", "embedding", k = 3, path = idx,
      shortlist = 10, nProbe = 2).collect().map(_.toSeq).toSet
    val before = stored()
    assert(before.nonEmpty)
    // corrupt every decoy file — a fetch that scanned the whole
    // vector column would die on them; the pruned fetch never opens
    // them (the IncrementalViews pruned-I/O proof pattern)
    def walk(d: java.io.File): Seq[java.io.File] =
      d.listFiles.toSeq.flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
    val dataFiles = walk(new java.io.File(corpusDir))
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getPath.contains("_manifests"))
    var corrupted = 0
    dataFiles.foreach { f =>
      val mn = spark.read.parquet(f.toString)
        .agg(min(col("vec_id"))).head().getLong(0)
      if (mn >= 100000L) {
        java.nio.file.Files.write(f.toPath, Array.fill[Byte](64)(0x7f))
        corrupted += 1
      }
    }
    assert(corrupted > 0, "the layout must yield at least one decoy file")
    assert(stored() == before,
      "corrupting out-of-shortlist corpus files must not touch the serve")
    // and the page matches the in-memory rerank over the indexed slice
    val mem = Similarity.ivfPqTopKReranked(data, q, "vec_id", "embedding",
      dim = 64, k = 3, shortlist = 10, nCells = 10, nProbe = 2, m = 8,
      kCodes = 16).collect().map(_.toSeq).toSet
    assert(before == mem)
  }

  test("ivfPqRecallCheck: an empty query set fails the contract instead of vacuously passing") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf("sf0.001")).select("vec_id", "embedding")
    val v = Similarity.ivfPqRecallCheck(e, e.filter(col("vec_id") < 0),
      "vec_id", "embedding", dim = 64, k = 5).head()
    assert(v.getLong(0) == 0L)
    assert(!v.getBoolean(3),
      "recall_ok must be false when no query produced a truth row")
  }
}
