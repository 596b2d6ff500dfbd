package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}

/** Deduplication operators for the LLM-data-pipeline surface
  * (SURVEY.md §2.3 #24-28): exact, MinHash-LSH, SimHash, n-gram
  * Jaccard, embedding-cosine.
  *
  * Scale design: every variant is candidate-generation-by-grouping —
  * LSH bands / hamming bands / inverted token index turn the O(n²)
  * pair space into shuffle-partitioned buckets; only bucket-local
  * pairs are materialized and then exact-verified. No cross joins on
  * the scale paths, no driver-side state.
  */
object Dedup {

  /** Exact dedup: group identical (normalized) content, keep the
    * smallest id as representative. One hash aggregation — map-side
    * partial agg means each executor ships one row per distinct text.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = lower(trim(col(textCol)))
    df.groupBy(md5(norm).as("text_hash"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1L)).as("dup_count"))
  }

  /** Canonical dedup: exact dedup on the order-insensitive token
    * fingerprint — catches shuffled word-for-word duplicates. */
  def exactCanonical(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(Text.fingerprintCanonical(col(textCol)).as("fp_canonical"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1L)).as("dup_count"))

  /** Distinct whitespace tokens as a column. */
  private def toks(textCol: String): Column =
    array_distinct(split(col(textCol), " "))

  /** Exact token-set Jaccard for a candidate pair, from the two
    * distinct-token arrays: |∩| / (|a|+|b|−|∩|). Integer-derived
    * double division — bit-identical across engines. */
  private def jaccard(a: Column, b: Column): Column = {
    val common = size(array_intersect(a, b)).cast("double")
    common / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** MinHash + LSH near-dup pairs.
    *
    * shingle→minhash→band→bucket-join: per row a `numHashes`-long
    * signature (min over tokens of `xxhash64(token, seed)` per seed),
    * sliced into `bands` bands; rows sharing any band's hash are
    * candidates; candidates are exact-verified with true Jaccard.
    *
    * Cost at scale: signatures are a linear projection; the band join
    * shuffles on (band, bandHash) so only same-bucket pairs exist;
    * with r = numHashes/bands rows per band, P[candidate] = 1−(1−J^r)^bands
    * — the standard S-curve. Verification is per-candidate, not per-pair.
    */
  def minHashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.9): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val withSig = df.select(col(idCol).as("__id"), toks(textCol).as("__toks"))
      .withColumn("__sig",
        transform(sequence(lit(0), lit(numHashes - 1)),
          j => array_min(transform(col("__toks"), t => xxhash64(t, j)))))
    val banded = withSig.select(
      col("__id"), col("__toks"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("__sig"), b * r + 1, lit(r))))))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bh")
    val a = banded.select(col("__band"), col("__bh"),
      col("__id").as("id_a"), col("__toks").as("toks_a"))
    val b = banded.select(col("__band"), col("__bh"),
      col("__id").as("id_b"), col("__toks").as("toks_b"))
    a.join(b, Seq("__band", "__bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "toks_a", "toks_b").distinct()
      .withColumn("jaccard", jaccard(col("toks_a"), col("toks_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"),
        graft.functions.Exact.roundAt(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash of the distinct token set: bit k is the sign of
    * Σ_tokens (±1 by bit k of xxhash64(token)). Pure expressions —
    * computed per row with no explode. */
  def simHash64(textCol: String): Column =
    expr(
      s"""aggregate(sequence(0, 63), 0L, (acc, k) -> acc +
         |  IF(aggregate(array_distinct(split($textCol, ' ')), 0L,
         |       (s, t) -> s + (shiftright(xxhash64(t), k) & 1) * 2 - 1) > 0,
         |     shiftleft(1L, k), 0L))""".stripMargin)

  /** SimHash near-dup pairs: band the 64-bit fingerprint into
    * `bands` equal bit-slices; rows sharing any slice are candidates
    * (pigeonhole: hamming ≤ bands−1 is always caught); verify with
    * exact `bit_count(xor)`. */
  def simHashNearDup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bands: Int = 8,
      maxHamming: Int = 6): DataFrame = {
    require(64 % bands == 0)
    val w = 64 / bands
    val mask = (1L << w) - 1
    val withH = df.select(col(idCol).as("__id"), simHash64(textCol).as("__h"))
    val bandDf = withH
      .select(col("__id"), col("__h"),
        explode(expr(
          s"transform(sequence(0, ${bands - 1}), b -> named_struct(" +
            s"'band', b, 'slice', shiftright(__h, b * $w) & ${mask}L))")).as("__b"))
      .select(col("__id"), col("__h"),
        col("__b.band").as("__band"), col("__b.slice").as("__slice"))
    val a = bandDf.select(col("__band"), col("__slice"),
      col("__id").as("id_a"), col("__h").as("h_a"))
    val b2 = bandDf.select(col("__band"), col("__slice"),
      col("__id").as("id_b"), col("__h").as("h_b"))
    a.join(b2, Seq("__band", "__slice"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .withColumn("hamming", expr("bit_count(h_a ^ h_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard over an inverted index — the verification
    * path (and the oracle-checkable one).
    *
    * Instead of an O(n²) cross join, explode distinct n-grams and
    * self-join on the n-gram: only pairs sharing ≥1 gram are ever
    * materialized, co-partitioned by gram. Jaccard from the common
    * count and per-doc gram counts. At 100 TB add a document-frequency
    * cap on grams (drop grams in >p% of docs) to bound hot keys —
    * semantics-preserving for thresholds above the noise floor.
    */
  def ngramJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 1,
      threshold: Double = 0.8): DataFrame = {
    val grams =
      if (n == 1) toks(textCol)
      else array_distinct(
        transform(sequence(lit(1), greatest(size(split(col(textCol), " ")) - (n - 1), lit(0))),
          i => concat_ws(" ", slice(split(col(textCol), " "), i, lit(n)))))
    val g = df.select(col(idCol).as("__id"), grams.as("__g"))
      .withColumn("__sz", size(col("__g")))
    val inv = g.select(col("__id"), col("__sz"), explode(col("__g")).as("__gram"))
    val a = inv.select(col("__gram"), col("__id").as("id_a"), col("__sz").as("sz_a"))
    val b = inv.select(col("__gram"), col("__id").as("id_b"), col("__sz").as("sz_b"))
    a.join(b, "__gram").filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1L)).as("__common"))
      .withColumn("jaccard",
        col("__common").cast("double") / (col("sz_a") + col("sz_b") - col("__common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"),
        graft.functions.Exact.roundAt(col("jaccard"), 4).as("jaccard"))
  }

  /** Embedding near-dup, exact pair scan (verification / small-SF
    * path; the scale path is [[embeddingNearDupLsh]]). */
  def embeddingNearDupExact(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val withNorm = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__n", sqrt(Vectors.normSq(col("__v"))))
    val a = withNorm.select(col("__id").as("id_a"), col("__v").as("v_a"), col("__n").as("n_a"))
    val b = withNorm.select(col("__id").as("id_b"), col("__v").as("v_b"), col("__n").as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine",
        Vectors.cosineFromParts(Vectors.dotD(col("v_a"), col("v_b")), col("n_a"), col("n_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"),
        graft.functions.Exact.roundAt(col("cosine"), 4).as("cosine"))
  }

  /** Embedding near-dup at scale: random-hyperplane LSH buckets
    * (see [[Similarity.lshBucket]]) generate candidates; same exact
    * cosine verification. Bucket join shuffles on the bucket key —
    * pair work is bucket-local. */
  def embeddingNearDupLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bitsPerTable: Int = 12,
      tables: Int = 4): DataFrame = {
    val withB = Similarity.withBuckets(
      df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
        .withColumn("__n", sqrt(Vectors.normSq(col("__v")))),
      "__v", bitsPerTable, tables)
    val a = withB.select(col("__t"), col("__bucket"),
      col("__id").as("id_a"), col("__v").as("v_a"), col("__n").as("n_a"))
    val b = withB.select(col("__t"), col("__bucket"),
      col("__id").as("id_b"), col("__v").as("v_b"), col("__n").as("n_b"))
    a.join(b, Seq("__t", "__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "v_a", "v_b", "n_a", "n_b").distinct()
      .withColumn("cosine",
        Vectors.cosineFromParts(Vectors.dotD(col("v_a"), col("v_b")), col("n_a"), col("n_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"),
        graft.functions.Exact.roundAt(col("cosine"), 4).as("cosine"))
  }
}
