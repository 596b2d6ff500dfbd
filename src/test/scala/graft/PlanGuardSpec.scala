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

  test("rank-filter queries plan as WindowGroupLimit (partial top-k before shuffle)") {
    Seq("q_order_rank", "q_knn_ivf").foreach { q =>
      assert(plan(q).contains("WindowGroupLimit"), s"$q sorts whole partitions:\n${plan(q)}")
    }
  }

  test("no query degrades to a cartesian or nested-loop join") {
    // nested-loop is only pathological with a large build side; these
    // are by-design exceptions: the two *exact* pair/scan baselines
    // (oracle verification paths — scale entries are
    // embeddingNearDupLsh and lshTopK/ivfTopK) and the scalar-subquery
    // shape whose build side is a broadcast 1-row aggregate
    val exempt = Set("q_embedding_neardup", "q_knn_cosine", "q_customer_above_avg")
    SparkEntry.queries.keys.filterNot(exempt).foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q planned a BroadcastNestedLoopJoin")
    }
  }
}
