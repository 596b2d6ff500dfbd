package graft

/** Machine-checked plan shapes for the scale claims in SURVEY §4:
  * dims broadcast, filters reach the scan, projections prune the scan
  * schema, rank filters push down as group limits, and no query falls
  * back to a cartesian/nested-loop join. Guards regressions the
  * result-correctness oracle can't see.
  */
class PlanGuardSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString

  test("TPC-H-shape joins broadcast their dimension side") {
    Seq("q_nation_revenue", "q_brand_revenue", "q_top_orders").foreach { q =>
      assert(plan(q).contains("BroadcastHashJoin"), s"$q lost its broadcast:\n${plan(q)}")
    }
  }

  test("filters are pushed into the parquet scan") {
    Seq("q_top_orders", "q_pricing_summary").foreach { q =>
      assert(plan(q).contains("PushedFilters: [IsNotNull"),
        s"$q lost scan pushdown:\n${plan(q)}")
    }
  }

  test("projection prunes the scan schema to referenced columns") {
    val p = plan("q_doc_langid")
    // documents carries (doc_id, text, …); langid needs only those two
    val scan = p.split("\n").filter(_.contains("ReadSchema")).mkString
    assert(scan.contains("doc_id") && scan.contains("text"), scan)
    assert(!scan.contains("lang,"), s"unused column read: $scan")
  }

  test("snapshot-slice query pushes BOTH range predicates to the scan") {
    // executedPlan.toString TRUNCATES long PushedFilters lists —
    // formatted explain prints them in full
    val p = SparkEntry.queries("q_snapshot_pruned")(spark, sf("sf0.001"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = p.split("\n").filter(_.contains("PushedFilters")).mkString
    // comparing unix_micros(ts) instead of the native column silently
    // drops the time range out of PushedFilters — guard both dims
    assert(pushed.contains("GreaterThanOrEqual(ts,") &&
      pushed.contains("LessThanOrEqual(ts,"),
      s"ts range no longer reaches the parquet scan: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(user_id,") &&
      pushed.contains("LessThanOrEqual(user_id,"),
      s"user_id range no longer reaches the parquet scan: $pushed")
  }

  test("rank-filter queries plan as WindowGroupLimit (partial top-k before shuffle)") {
    Seq("q_order_rank", "q_knn_ivf").foreach { q =>
      assert(plan(q).contains("WindowGroupLimit"), s"$q sorts whole partitions:\n${plan(q)}")
    }
  }

  test("corpus ops keep their scale-plan shapes") {
    // benchmark gram set rides a broadcast join, never a shuffle
    assert(plan("q_contamination").contains("BroadcastHashJoin"),
      s"contamination lost its broadcast:\n${plan("q_contamination")}")
    // per-stratum rank keeps bounded heaps, not whole-stratum sorts
    assert(plan("q_stratified_sample").contains("WindowGroupLimit"),
      s"stratified sample sorts whole strata:\n${plan("q_stratified_sample")}")
    // vocab/tf-idf aggregate map-side before shuffling token keys
    Seq("q_vocab", "q_tfidf").foreach { q =>
      assert(plan(q).contains("partial_count"), s"$q lost partial aggregation:\n${plan(q)}")
    }
    // split assignment is a pure projection — zero shuffles
    assert(!plan("q_doc_split").contains("Exchange"),
      s"hashSplit must not shuffle:\n${plan("q_doc_split")}")
    // packing shuffles once, on the shard key
    val pack = plan("q_token_pack")
    assert(pack.split("Exchange").length == 2 && pack.contains("hashpartitioning(shard"),
      s"packing should shuffle exactly once on shard:\n$pack")
    // winsorize/zscore broadcast their tiny stats aggregate back —
    // the data itself is never shuffled a second time
    Seq("q_winsorize", "q_zscore").foreach { q =>
      assert(plan(q).contains("BroadcastHashJoin"), s"$q lost its stats broadcast:\n${plan(q)}")
    }
    // the one-pass moment aggregates stay ONE partial+final pair over
    // one scan — a second Exchange would mean a second pass appeared
    Seq("q_corr_matrix", "q_corr_pairwise", "q_embedding_gram",
        "q_frequent_tokens", "q_ols_fit").foreach { q =>
      val p = plan(q)
      assert(p.split("Exchange").length <= 2, s"$q grew a second shuffle:\n$p")
      assert(p.contains("partial_"), s"$q lost map-side partial aggregation:\n$p")
    }
    // span dedup ships hashed longs, never shingle strings, and
    // collapses per-(doc,span) before the global count
    val sd = plan("q_span_dedup")
    assert(sd.contains("xxhash64") && sd.contains("partial_count"),
      s"span dedup must collapse hashed spans map-side:\n$sd")
    // quantize is a pure projection after the driver-side range pass
    assert(!plan("q_embedding_quantize").contains("Exchange"),
      s"quantize must be shuffle-free:\n${plan("q_embedding_quantize")}")
  }

  test("no query degrades to a cartesian or nested-loop join") {
    // nested-loop is only pathological with a large build side; these
    // are by-design exceptions: the two *exact* pair/scan baselines
    // (oracle verification paths — scale entries are
    // embeddingNearDupLsh and lshTopK/ivfTopK), the scalar-subquery
    // shapes whose build side is a broadcast 1-row aggregate
    // (q_customer_above_avg, q_tfidf's corpus-size N, q_bm25's
    // 1-row N/avgdl stats, q_doc_logprob's 1-row token total), and
    // q_sketch_overlap's cohort-pair join, whose BOTH sides are the
    // sketch table — one bounded O(k)-byte row per cohort, however
    // large the fact table (the whole point of the sketch pattern).
    // q_knn_lsh measures recall AGAINST the brute-force baseline, so
    // it inherits q_knn_cosine's by-design broadcast scan — the LSH
    // candidate path itself stays a hash join (lshTopK has no BNLJ).
    // q_ols_eval/q_ols_holdout cross-join the broadcast ONE-ROW betas
    // frame back onto the data — the same scalar-subquery shape as
    // q_customer_above_avg (build side is a 1-row aggregate, so the
    // nested loop is a broadcast constant splice, not a pair scan).
    // q_doc_bigram_lm and q_corpus_profile splice 1-row aggregates
    // (total-token count / corpus scalars) the same way as
    // q_doc_logprob — a broadcast constant, not a pair scan;
    // q_corpus_profile_view_incr serves the SAME card shape from the
    // maintained views (1-row vocab/dup-count aggregates spliced in);
    // q_bm25_view_incr / q_tfidf_view_incr splice the index's 1-row
    // (N, avgdl) cascade the same way q_bm25/q_tfidf splice theirs;
    // q_cooccurrence splices its 1-row pair/token totals likewise, and
    // q_cooccurrence_view_incr splices the maintained 1-row cascades.
    // q_knn_pq inherits q_knn_cosine's by-design broadcast of the
    // BOUNDED query set over the codes scan (the scan side reads m
    // ints per row — the compression is the point; the corpus is
    // never pair-joined against itself). The textrank queries are NOT
    // exempt: they consume the pair counts alone, so none of the PMI
    // path's 1-row splices enter their plans. The three DSIR queries
    // and q_perplexity_bucket splice their broadcast 1-row totals
    // exactly like q_doc_logprob's token total — a broadcast
    // constant, not a pair scan; the per-token log-prob tables
    // themselves ride HASH joins.
    // q_mmr_rerank builds its page with bruteForceTopK, so it
    // inherits q_knn_cosine's by-design broadcast of the BOUNDED
    // query set (exactly like q_knn_lsh); the MMR machinery itself
    // adds only a HASH page join and a bounded-state aggregate.
    // q_knn_ivfpq_rerank inherits q_knn_pq's broadcast of the bounded
    // query set over the codes scan (its rerank legs are hash joins),
    // and q_knn_ivfpq_recall additionally measures AGAINST the
    // brute-force baseline like q_knn_lsh.
    // q_mix_temperature splices its broadcast ONE-ROW weight total
    // (Σ of one row per domain) exactly like q_doc_logprob's token
    // total — a broadcast constant, not a pair scan; the selection
    // twin q_doc_mix_temp is NOT exempt (budgets collect as driver
    // literals, the prefix rule is hash joins + keyed windows), and
    // q_knn_pq_stored_rerank is NOT exempt either (literal shortlist
    // + readPoints scan + hash joins end to end).
    // q_vocab_kl / q_vocab_kl_incr splice their broadcast 1-row
    // (N_p, N_q, V) totals the same way (the vocab join itself is a
    // full-outer HASH join).
    val exempt = Set("q_embedding_neardup", "q_knn_cosine", "q_knn_lsh",
      "q_knn_pq",
      "q_customer_above_avg",
      "q_tfidf", "q_bm25", "q_doc_logprob", "q_sketch_overlap",
      "q_ols_eval", "q_ols_holdout", "q_doc_bigram_lm", "q_corpus_profile",
      "q_corpus_profile_view_incr", "q_bm25_view_incr", "q_tfidf_view_incr",
      "q_cooccurrence", "q_cooccurrence_view_incr",
      "q_bigram_lm_view_incr",
      "q_dsir_weights", "q_dsir_select", "q_dsir_score_incr",
      "q_mmr_rerank", "q_knn_ivfpq_rerank", "q_knn_ivfpq_recall",
      "q_perplexity_bucket", "q_perplexity_incr",
      "q_mix_temperature", "q_vocab_kl", "q_vocab_kl_incr")
    SparkEntry.queries.keys.filterNot(exempt).foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q planned a BroadcastNestedLoopJoin")
    }
  }

  test("bigramLogProb/cooccurrence pin NO count-table broadcasts (1-row totals only)") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    // disable stats-estimated broadcasts: whatever still broadcasts
    // under threshold = -1 is carrying a PINNED hint — the shape that
    // bypasses size measurement and OOMs the driver at web scale.
    // The distinct-bigram table is corpus-scale, and even the ctx/uni
    // token tables are heavy-tailed on raw web text — so EVERY count
    // join must plan as a shuffle join here (AQE may still broadcast
    // any of them at runtime from MEASURED size — that's the desired
    // behavior); the only pinned broadcasts left are the 1-row totals
    // riding the BroadcastNestedLoopJoin constant splice.
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bg = graft.operators.Corpus.bigramLogProb(
          Tables.documents(spark, sf("sf0.001")), "doc_id", "text")
        .queryExecution.sparkPlan
      assert(bg.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
        s"a count-table broadcast is pinned by hint:\n$bg")
      val shuffled = bg.collect { case j: SortMergeJoinExec => j.leftKeys.length }
      assert(shuffled.contains(2) && shuffled.contains(1),
        s"expected the bigram AND token-count joins to plan as shuffle joins:\n$bg")
      val co = graft.operators.Corpus.cooccurrence(
          Tables.documents(spark, sf("sf0.001")), "text", window = 2)
        .queryExecution.sparkPlan
      assert(co.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
        s"a unigram broadcast is pinned by hint:\n$co")
      assert(co.collect { case j: SortMergeJoinExec => j }.size >= 2,
        s"expected both unigram joins to plan as shuffle joins:\n$co")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
