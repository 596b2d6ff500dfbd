package graft

import graft.operators.Dedup

case class Doc(doc_id: Long, text: String)

class DedupSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      Doc(1, "the quick brown fox jumps over the lazy dog"),
      Doc(2, "the quick brown fox jumps over the lazy dog"),        // exact dup of 1
      Doc(3, "dog lazy the over jumps fox brown quick the"),        // shuffled dup of 1
      Doc(4, "an entirely different sentence about spark engines"),
      Doc(5, "the quick brown fox jumps over the lazy cat")         // near-dup of 1 (1 word)
    ).toDF
  }

  test("exact dedup groups identical text only") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length == 4)
    val dupGroup = out.find(_.getAs[Long]("dup_count") == 2).get
    assert(dupGroup.getAs[Long]("rep_id") == 1)
  }

  test("canonical dedup also groups shuffled duplicates") {
    val out = Dedup.exactCanonical(docs, "doc_id", "text").collect()
    assert(out.length == 3)
    assert(out.find(_.getAs[Long]("dup_count") == 3).get.getAs[Long]("rep_id") == 1)
  }

  test("minhash-LSH finds the high-jaccard pairs and only them") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
      numHashes = 64, bands = 16, threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // J(1,2)=J(1,3)=J(2,3)=1.0 (same token set); J(1,5)=7/9≈0.78 (sets); 4 is unrelated
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(pairs.contains((1L, 5L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash-LSH verified output equals exact jaccard pairs on real docs") {
    val d = Tables.documents(spark, sf("sf0.001"))
    val lsh = Dedup.minHashLsh(d, "doc_id", "text", 128, 16, 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccard(d, "doc_id", "text", 1, 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("cross-corpus minhash equals exact cross-side jaccard pairs on real docs") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val a = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val b = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
    val lsh = Dedup.minHashLshAgainst(a, b, "doc_id", "text",
      numHashes = 128, bands = 16, threshold = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val s = spark
    import s.implicits._
    val sets = docs.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.array_distinct(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    val exact = (for {
      (ia, ga) <- sets.toSeq if ia % 2 == 0
      (ib, gb) <- sets.toSeq if ib % 2 == 1
      inter = ga.toSet.intersect(gb.toSet).size
      j = inter.toDouble / (ga.size + gb.size - inter)
      if j >= 0.95
    } yield (ia, ib)).toSet
    assert(lsh === exact)
    assert(lsh.nonEmpty, "sf0.001 documents should contain cross-side near-dups")
  }

  test("simhash: identical token sets collide at hamming 0") {
    val out = Dedup.simHashNearDup(docs, "doc_id", "text", bands = 8, maxHamming = 6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out((1L, 2L)) == 0)
    assert(out((1L, 3L)) == 0) // shuffled → same distinct-token simhash
  }

  test("simhash banding equals the exact hamming pair scan on real docs (pigeonhole, post-collapse)") {
    import org.apache.spark.sql.functions._
    val d = Tables.documents(spark, sf("sf0.001"))
    val banded = Dedup.simHashNearDup(d, "doc_id", "text", bands = 4, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // brute force: every doc pair's fingerprint hamming distance
    val h = d.select(col("doc_id").as("id"), Dedup.simHash64("text").as("h"))
    val exact = h.select(col("id").as("id_a"), col("h").as("h_a"))
      .join(h.select(col("id").as("id_b"), col("h").as("h_b")),
        col("id_a") < col("id_b"))
      .withColumn("hamming", expr("bit_count(h_a ^ h_b)").cast("long"))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b", "hamming")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(banded == exact)
  }

  test("ngram jaccard (n=2 shingles) distinguishes order") {
    val out = Dedup.ngramJaccard(docs, "doc_id", "text", n = 2, threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)))   // identical order → shingle J = 1
    assert(!out.contains((1L, 3L)))  // shuffled → shingles differ
  }

  test("connected components: chain topology propagates the min label end-to-end") {
    val s = spark
    import s.implicits._
    // two components: a 5-node CHAIN 10-20-30-40-50 (needs multiple
    // propagation rounds) and an edge 100-200; 999 is isolated (absent)
    val pairs = Seq((10L, 20L), (20L, 30L), (30L, 40L), (40L, 50L), (100L, 200L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(10L, 20L, 30L, 40L, 50L).forall(cc(_) == 10L))
    assert(cc(100L) == 100L && cc(200L) == 100L)
    assert(!cc.contains(999L))
  }

  test("two-phase CC: partition-scattered pseudo-random graph matches a driver union-find") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random multigraph over ~300 nodes, spread
    // over 13 partitions so local compression sees only fragments of
    // most components and the global stitch phase has real work
    val edges = (0 until 400).map { i =>
      val a = (i * 7919 % 300).toLong + 1
      val b = ((i * 104729 + 31) % 300).toLong + 1
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2)
    // reference labeling: plain driver-side union-find
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long =
      if (parent.getOrElse(x, x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      parent.getOrElseUpdate(ra, ra); parent.getOrElseUpdate(rb, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expected = nodes.map(n => n -> find(n)).toMap
    val cc = Dedup.connectedComponents(
        edges.toDF("id_a", "id_b").repartition(13))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == expected)
  }

  test("adaptive CC: driver union-find == distributed loop, and the cap routes correctly") {
    val s = spark
    import s.implicits._
    val edges = (0 until 400).map { i =>
      val a = (i * 7919 % 300).toLong + 1
      val b = ((i * 104729 + 31) % 300).toLong + 1
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2)
    val df = edges.toDF("id_a", "id_b").repartition(13)
    val expected = Dedup.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver path (default cap far above 400 edges)
    val driver = Dedup.connectedComponentsAdaptive(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver == expected)
    // forced DISTRIBUTED path (cap below the edge count) — same labels
    val dist = Dedup.connectedComponentsAdaptive(df, maxDriverEdges = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == expected)
    // a durable checkpointDir always takes the distributed path (round
    // tables must exist to resume from)
    val dir = java.nio.file.Files.createTempDirectory("cc_adaptive").toString
    val durable = Dedup.connectedComponentsAdaptive(
        Seq((10L, 20L), (20L, 30L)).toDF("id_a", "id_b"),
        checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(durable == Map(10L -> 10L, 20L -> 10L, 30L -> 10L))
    assert(new java.io.File(dir).listFiles.exists(_.getName.startsWith("labels_r")))
  }

  test("durable CC: checkpointed run matches in-memory, and a crash-resume converges to identical labels") {
    val s = spark
    import s.implicits._
    // long chain → several propagation rounds, so there are real
    // intermediate round tables to crash between
    val chain = (1L to 12L).sliding(2).map(w => (w(0) * 10, w(1) * 10)).toSeq
    val pairs = (chain :+ ((500L, 600L))).toDF("id_a", "id_b")
    val expected = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmrf); f.delete(); ()
    }
    try {
      val durable = Dedup.connectedComponents(pairs, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(durable == expected)
      // round tables were persisted — the durability evidence
      val rounds = new java.io.File(dir).listFiles.map(_.getName)
        .filter(_.startsWith("labels_r")).map(_.stripPrefix("labels_r").toInt).sorted
      assert(rounds.head == 0 && rounds.length >= 2,
        s"expected >=2 persisted rounds, got ${rounds.mkString(",")}")
      // simulate a crash right after round 1: drop every later round
      // table, then resume — must reach the identical fixpoint
      rounds.filter(_ > 1).foreach(r => rmrf(new java.io.File(s"$dir/labels_r$r")))
      val resumed = Dedup.resumeConnectedComponents(s, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(resumed == expected)
    } finally rmrf(new java.io.File(dir))
  }

  test("near-dup clusters: every doc labeled, reps are cluster minima, clusters respect pairs") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = Dedup.nearDupClusters(docs, "doc_id", "text", threshold = 0.95)
    assert(out.count() == docs.count())
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // rep iff doc_id == cluster_id, and cluster_id <= doc_id always
    assert(rows.forall { case (d, c, rep) => (d == c) == rep && c <= d })
    // every near-dup pair lands in one cluster
    val cl = rows.map(r => r._1 -> r._2).toMap
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text", threshold = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => cl(a) == cl(b) })
  }

  test("embedding near-dup: LSH candidates ⊆ exact, and exact pairs recovered") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val exact = Dedup.embeddingNearDupExact(e, "vec_id", "embedding", 0.35)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(e, "vec_id", "embedding", 0.35,
      bitsPerTable = 4, tables = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))     // verification guarantees precision
    assert(exact.nonEmpty)
    // recall of the banded path on moderately-similar pairs
    assert(lsh.size.toDouble / exact.size > 0.5)
  }

  test("bounded collapse (count+exemplar, join-based members) == collect_list path") {
    import org.apache.spark.sql.functions._
    // real corpus slice with planted exact duplicates (two extra
    // copies of every %10==0 doc) so group multiplicity goes past 1
    val base = Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text").limit(200)
    val dups = base.filter(col("doc_id") % 10 === 0)
    val corpus = base
      .unionByName(dups.withColumn("doc_id", col("doc_id") + 1000000L))
      .unionByName(dups.withColumn("doc_id", col("doc_id") + 2000000L))
    val hashed = corpus.select(col("doc_id").as("__id"),
      array_sort(transform(array_distinct(split(col("text"), " ")),
        t => xxhash64(t))).as("__sh"))
    // the unbounded idiom, inlined: collect_list then explode
    val viaArray = hashed.groupBy("__sh")
      .agg(min(col("__id")).as("__gid"), collect_list(col("__id")).as("__ids"))
      .select(explode(col("__ids")).as("__mid"), col("__gid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val groups = Dedup.collapseReps(hashed)
    val viaJoin = Dedup.membersVia(hashed, groups)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaJoin == viaArray && viaJoin.nonEmpty)
    // the bounded group table carries the multiplicity the array held
    val counts = groups.select("__gid", "__cnt")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts.values.sum == viaJoin.size)
    assert(counts.values.max >= 3L) // at least the planted triple
  }

  test("star edges from the bounded path connect every member to its rep") {
    import org.apache.spark.sql.functions._
    val base = docs // ids 1..5; 1,2 exact dups, 3 shuffled dup of 1
    val edges = Dedup.minHashLshEdges(base, "doc_id", "text",
      numHashes = 64, bands = 16, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // member→rep stars for the identical-set group {1,2,3}
    assert(edges.contains((2L, 1L)) && edges.contains((3L, 1L)))
    // verified rep pair to the near-dup
    assert(edges.contains((1L, 5L)))
    assert(!edges.exists { case (a, b) => a == 4L || b == 4L })
  }
}
