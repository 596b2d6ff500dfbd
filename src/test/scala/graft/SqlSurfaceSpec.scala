package graft

import org.apache.spark.sql.functions._

/** Proves the SQL-only migration path: the reference's ksqlDB script
  * (ksqldb-consumer profiles/low_latency.sql) ports to a pure Spark
  * SQL string — window TVF for WINDOW TUMBLING, date_format for
  * TIMESTAMPTOSTRING, max_by for LATEST_BY_OFFSET, plus graft's
  * injected functions — and produces exactly what the DataFrame
  * builder produces. A ksqlDB user can bring their .sql file, not
  * learn a new API.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("the ksqlDB profile as one Spark SQL string == the DataFrame builder") {
    Tables.events(spark, sf("sf0.001")).createOrReplaceTempView("weather_events")
    // low_latency.sql:5-27, translated clause by clause
    val sql = spark.sql(
      """SELECT
        |  date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS window_start,
        |  date_format(window.end, 'yyyy-MM-dd HH:mm:ss') AS window_end,
        |  event_type,
        |  floor(cast(sum(cast(value AS DECIMAL(30,2))) AS DOUBLE) / count(1) * 100 + 0.5) / 100 AS avg_value,
        |  min(value) AS min_value,
        |  max(value) AS max_value,
        |  count(1) AS message_count,
        |  min(event_id) AS min_ord
        |FROM weather_events
        |GROUP BY window(ts, '1 hour'), event_type""".stripMargin)
    val dsl = operators.Windows.tumblingAgg(
      Tables.events(spark, sf("sf0.001")),
      "ts", Seq("event_type"), "value", "event_id", "1 hour")
    assert(sql.collect().map(_.toSeq).toSet == dsl.collect().map(_.toSeq).toSet)
    assert(sql.count() > 0)
  }

  test("textrank + PQ TVFs: SQL table functions == the DataFrame operators") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).sorted.toSeq

    Tables.documents(spark, sf("sf0.001")).createOrReplaceTempView("docs_tr")
    val sqlTr = spark.sql(
      "SELECT * FROM graft_textrank('docs_tr', 'text', 2, 5, 10)")
    val dfTr = operators.Corpus.textRank(
      operators.Corpus.cooccurrencePairCounts(
        Tables.documents(spark, sf("sf0.001")), "text", window = 2),
      "a", "b", "cnt", iters = 5, topK = 10)
    assert(canon(sqlTr) == canon(dfTr) && sqlTr.count() > 0)

    val e = Tables.embeddings(spark, sf("sf0.001"))
    e.createOrReplaceTempView("emb_pq")
    e.filter(col("vec_id") < 4).createOrReplaceTempView("emb_pq_q")
    val books = operators.Similarity.pqTrain(e, "vec_id", "embedding",
      dim = 64, m = 8, kCodes = 16)
    assert(canon(spark.sql(
      "SELECT * FROM graft_knn_pq('emb_pq', 'emb_pq_q', 'vec_id', 'embedding', 64, 8, 16, 3)"))
      == canon(operators.Similarity.pqTopK(
        operators.Similarity.pqEncode(e, "vec_id", "embedding", books),
        e.filter(col("vec_id") < 4), "vec_id", "embedding", books, 3)))
    assert(canon(spark.sql(
      "SELECT * FROM graft_knn_ivfpq('emb_pq', 'emb_pq_q', 'vec_id', 'embedding', 64, 3)"))
      == canon(operators.Similarity.ivfPqTopK(e,
        e.filter(col("vec_id") < 4), "vec_id", "embedding",
        dim = 64, k = 3)))
  }

  test("DSIR + JL + MMR TVFs: SQL table functions == the DataFrame operators") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).sorted.toSeq

    val d = Tables.documents(spark, sf("sf0.001"))
    d.createOrReplaceTempView("docs_dsir")
    d.filter(col("lang") === "en").createOrReplaceTempView("docs_dsir_en")
    val sqlW = spark.sql(
      "SELECT * FROM graft_dsir_weights('docs_dsir', 'docs_dsir_en', 'doc_id', 'text')")
    assert(canon(sqlW) == canon(operators.Corpus.dsirWeights(
      d, d.filter(col("lang") === "en"), "doc_id", "text")) &&
      sqlW.count() > 0)
    assert(canon(spark.sql(
      "SELECT * FROM graft_dsir_select('docs_dsir', 'docs_dsir_en', 'doc_id', 'text', 10)"))
      == canon(operators.Corpus.dsirSelect(
        d, d.filter(col("lang") === "en"), "doc_id", "text", n = 10)))

    assert(canon(spark.sql(
      "SELECT * FROM graft_perplexity_buckets('docs_dsir', 'docs_dsir_en', 'doc_id', 'text')"))
      == canon(operators.Corpus.perplexityBuckets(
        d, d.filter(col("lang") === "en"), "doc_id", "text")))

    assert(canon(spark.sql(
      "SELECT * FROM graft_zipf_fit('docs_dsir', 'text')"))
      == canon(operators.Corpus.zipfFit(d, "text")))
    assert(canon(spark.sql(
      "SELECT * FROM graft_heaps_fit('docs_dsir', 'doc_id', 'text')"))
      == canon(operators.Corpus.heapsFit(d, "doc_id", "text")))

    assert(canon(spark.sql(
      "SELECT * FROM graft_textrank_by('docs_dsir', 'lang', 'text', 2, 3, 5)"))
      == canon(operators.Corpus.textRankBy(
        operators.Corpus.cooccurrencePairCountsBy(
          d, Seq("lang"), "text", window = 2),
        Seq("lang"), "a", "b", "cnt", iters = 3, topK = 5)))

    assert(canon(spark.sql(
      "SELECT * FROM graft_vocab_divergence('docs_dsir_en', 'docs_dsir', 'text')"))
      == canon(operators.Corpus.vocabDivergenceOf(
        d.filter(col("lang") === "en"), d, "text")))
    assert(canon(spark.sql(
      "SELECT * FROM graft_vocab_divergence_by('docs_dsir', 'source', 'docs_dsir', 'text')"))
      == canon(operators.Corpus.vocabDivergenceByOf(
        d, "source", d, "text")))

    assert(canon(spark.sql(
      "SELECT * FROM graft_mix_temperature('docs_dsir', 'source', 'text', 0.5, 3000)"))
      == canon(operators.Corpus.temperatureBudgets(
        d, "source", "text", alpha = 0.5, totalBudget = 3000L)))
    assert(canon(spark.sql(
      "SELECT * FROM graft_mix_by_temperature('docs_dsir', 'source', 'doc_id', 'text', 0.5, 3000)"))
      == canon(operators.Corpus.mixByTemperature(
        d, "source", "doc_id", "text", alpha = 0.5, totalBudget = 3000L)))

    val e = Tables.embeddings(spark, sf("sf0.001"))
    e.createOrReplaceTempView("emb_jl")
    e.filter(col("vec_id") < 4).createOrReplaceTempView("emb_jl_q")
    assert(canon(spark.sql(
      "SELECT * FROM graft_random_projection('emb_jl', 'vec_id', 'embedding', 64, 16, 7)"))
      == canon(operators.Similarity.randomProject(
        e, "vec_id", "embedding", 64, 16, 7L)))

    val page = operators.Similarity.bruteForceTopK(e,
      e.filter(col("vec_id") < 4), "vec_id", "embedding", 10)
    val cands = page.join(
      e.select(col("vec_id").as("neighbor_id"), col("embedding")),
      "neighbor_id")
    val sqlMmr = spark.sql(
      "SELECT * FROM graft_mmr_rerank('emb_jl', 'emb_jl_q', 'vec_id', 'embedding', 10, 3)")
    assert(canon(sqlMmr) == canon(operators.Similarity.mmrRerank(
      cands, "query_id", "neighbor_id", "cosine", "embedding", k = 3)) &&
      sqlMmr.count() > 0)
  }

  test("event-analytics TVFs: SQL table functions == the DataFrame operators") {
    val ev = Tables.events(spark, sf("sf0.001"))
    ev.createOrReplaceTempView("ev_tvf")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).sorted.toSeq

    // sessionize
    val sqlSess = spark.sql(
      "SELECT * FROM graft_sessionize('ev_tvf', 'user_id', 'ts', 'event_id', 1800)")
    val dfSess = operators.Relational.sessionize(ev, "user_id", "ts", "event_id", 1800L)
    assert(canon(sqlSess) == canon(dfSess) && sqlSess.count() > 0)

    // numeric TVF literal leniency: 1800.0 parses as Decimal — accept
    // whole-valued fractions, reject genuine ones with the arg's name
    assert(canon(spark.sql(
      "SELECT * FROM graft_sessionize('ev_tvf', 'user_id', 'ts', 'event_id', 1800.0)"))
      == canon(dfSess))
    val frac = intercept[Exception](spark.sql(
      "SELECT * FROM graft_sessionize('ev_tvf', 'user_id', 'ts', 'event_id', 1800.5)"))
    assert(frac.getMessage.contains("whole number"), frac.getMessage)

    // session stats
    assert(canon(spark.sql(
      "SELECT * FROM graft_session_stats('ev_tvf', 'user_id', 'ts', 'event_id', 1800)"))
      == canon(operators.Relational.sessionStats(ev, "user_id", "ts", "event_id", 1800L)))

    // funnel — stages as trailing varargs
    val stages = Seq("view", "click", "purchase")
    val sqlFun = spark.sql(
      "SELECT * FROM graft_funnel('ev_tvf', 'user_id', 'ts', 'event_type', 'view', 'click', 'purchase')")
    val dfFun = operators.Relational.funnel(ev, "user_id", "ts", "event_type", stages)
    assert(canon(sqlFun) == canon(dfFun) && sqlFun.count() > 0)

    // retention
    assert(canon(spark.sql("SELECT * FROM graft_retention('ev_tvf', 'user_id', 'ts')"))
      == canon(operators.Relational.retention(ev, "user_id", "ts")))

    // top paths
    assert(canon(spark.sql(
      "SELECT * FROM graft_top_paths('ev_tvf', 'user_id', 'ts', 'event_id', 'event_type', 1800, 10)"))
      == canon(operators.Relational.topPaths(ev, "user_id", "ts", "event_id", "event_type", 1800L, 10)))

    // quality checks — predicates arrive as SQL strings
    val sqlQc = spark.sql(
      """SELECT * FROM graft_quality_checks('ev_tvf',
        |  'value_non_negative', 'value >= 0',
        |  'known_type', "event_type IN ('view','click','purchase','signup','error')")""".stripMargin)
    val dfQc = operators.Relational.qualityChecks(ev, Seq(
      "value_non_negative" -> expr("value >= 0"),
      "known_type" -> expr("event_type IN ('view','click','purchase','signup','error')")))
    assert(canon(sqlQc) == canon(dfQc) && sqlQc.count() == 2)
  }

  test("sketch TVFs: SQL distinct rollup and cohort overlap match exact counts") {
    Tables.events(spark, sf("sf0.001")).createOrReplaceTempView("ev_sk")
    // exact regime: per-type distinct users << sketch capacity
    val rolled = spark.sql(
      """SELECT event_type, CAST(user_id_distinct_theta AS BIGINT) AS d
        |FROM graft_distinct_rollup('ev_sk', 'event_type', 'user_id')""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val exact = spark.sql(
      "SELECT event_type, count(DISTINCT user_id) FROM ev_sk GROUP BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(rolled == exact)
    val ov = spark.sql(
      """SELECT * FROM graft_cohort_overlap('ev_sk', 'event_type', 'user_id')
        |WHERE cohort_a = 'click' AND cohort_b = 'view'""".stripMargin).head()
    val nu = ov.getAs[Any]("n_union").toString.toDouble.round
    val ni = ov.getAs[Any]("n_intersect").toString.toDouble.round
    val na = ov.getAs[Any]("n_a").toString.toDouble.round
    val nb = ov.getAs[Any]("n_b").toString.toDouble.round
    assert(nu == na + nb - ni) // inclusion-exclusion closes exactly
    assert(ni > 0 && nu > 0)

    // quantile TVF in its exact regime (k >= per-key rows at sf0.001)
    val q = spark.sql(
      """SELECT event_type, value_p50
        |FROM graft_quantile_rollup('ev_sk', 'event_type', 'value', 4096, 0.5)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    val qExact = Tables.events(spark, sf("sf0.001"))
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        val v = rs.map(_.getDouble(1)).sorted
        (t, v(math.ceil(0.5 * v.length).toInt - 1))
      }.toSeq.sortBy(_._1)
    assert(q == qExact)
  }

  test("view-maintenance TVFs: build, refresh, and read a materialized join + agg view from pure SQL") {
    val s = spark; import s.implicits._
    import graft.sources.Snapshots
    val root = java.nio.file.Files.createTempDirectory("graft_sqlview").toString
    val (l, r, v, av) = (s"$root/l", s"$root/r", s"$root/v", s"$root/av")
    Snapshots.commit(Seq((1L, "x"), (2L, "y")).toDF("k", "a"), l,
      statsCol = Some("k"))
    Snapshots.commit(Seq((1L, 10.0), (3L, 30.0)).toDF("k", "b"), r,
      statsCol = Some("k"))
    // one maintenance tick from SQL; the returned version is row 0
    val t1 = spark.sql(
      s"SELECT * FROM graft_view_refresh_join('$l', '$r', '$v', 'full', 'k')")
    assert(t1.columns.toSeq == Seq("view_version"))
    assert(!t1.head().isNullAt(0))
    // the view read back from SQL == the Scala API == a plain full join
    val fromSql = spark.sql(s"SELECT * FROM graft_join_view('$v')")
    val expected = Snapshots.read(spark, l)
      .join(Snapshots.read(spark, r), Seq("k"), "full_outer")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(fromSql) == canon(expected.select(fromSql.columns.map(col): _*)))
    // already current: the TVF reports null, no new version
    assert(spark.sql(
      s"SELECT * FROM graft_view_refresh_join('$l', '$r', '$v', 'full', 'k')")
      .head().isNullAt(0))

    // aggregate view: two source versions fold in one SQL call
    Snapshots.commit(Seq(("a", 1.5), ("b", 4.0)).toDF("g", "x"), s"$root/src",
      statsCol = Some("g"))
    Snapshots.commit(Seq(("a", 2.5)).toDF("g", "x"), s"$root/src",
      statsCol = Some("g"))
    val folded = spark.sql(
      s"SELECT * FROM graft_view_refresh_agg('$root/src', '$av', 'g', 'x', 'x')")
    assert(folded.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val aggRow = Snapshots.read(spark, av).filter(col("g") === "a")
      .select("sum_x", "__cnt", "min_x", "max_x").head()
    assert(aggRow.getDecimal(0).doubleValue() == 4.0 &&
      aggRow.getLong(1) == 2L &&
      aggRow.getDouble(2) == 1.5 && aggRow.getDouble(3) == 2.5)
  }

  test("cascaded + top-k view TVFs: COUNT(DISTINCT) and a leaderboard from pure SQL") {
    val s = spark; import s.implicits._
    import graft.sources.Snapshots
    val root = java.nio.file.Files.createTempDirectory("graft_sqlview2").toString
    Snapshots.commit(
      Seq(("a", 1L, 9.0), ("a", 1L, 7.0), ("a", 2L, 5.0), ("b", 3L, 3.0))
        .toDF("g", "u", "x"), s"$root/src", statsCol = Some("g"))
    // distinct cascade: one SQL call refreshes both levels
    val folded = spark.sql(
      s"""SELECT * FROM graft_view_refresh_distinct(
         |  '$root/src', '$root/pairs', '$root/dv', 'g', 'u')""".stripMargin)
    assert(folded.collect().map(_.getLong(0)).toSeq == Seq(0L))
    val counts = spark.sql(s"SELECT * FROM graft_distinct_view('$root/dv')")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(counts == Seq(("a", 2L), ("b", 1L)))
    // leaderboard: top-1 per group by x desc, u breaking ties
    spark.sql(
      s"""SELECT * FROM graft_view_refresh_topk(
         |  '$root/src', '$root/tv', 'g', 'x', 1, 'u')""".stripMargin).collect()
    val top = Snapshots.read(spark, s"$root/tv")
      .select("g", "u", "x", "__rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(top == Seq(("a", 1L, 9.0, 1L), ("b", 3L, 3.0, 1L)))
    // a delete churns the leaderboard through the same SQL tick
    Snapshots.deleteWhere(spark, s"$root/src", col("x") === 9.0)
    spark.sql(
      s"""SELECT * FROM graft_view_refresh_topk(
         |  '$root/src', '$root/tv', 'g', 'x', 1, 'u')""".stripMargin).collect()
    assert(Snapshots.read(spark, s"$root/tv")
      .filter(col("g") === "a").select("x").head().getDouble(0) == 7.0)
  }

  test("corr-matrix view TVFs: refresh + serve from pure SQL == the Scala API") {
    val s = spark; import s.implicits._
    import graft.sources.{IncrementalViews, Snapshots}
    val root = java.nio.file.Files.createTempDirectory("graft_sqlview3").toString
    Snapshots.commit(
      Seq(("a", 1.0, 2.0), ("a", 2.0, 1.0), ("a", 3.0, 4.0),
        ("b", 1.0, 1.0), ("b", 2.0, 3.0))
        .toDF("g", "x", "y"), s"$root/src", statsCol = Some("g"))
    val folded = spark.sql(
      s"SELECT * FROM graft_view_refresh_corr('$root/src', '$root/cv', 'g', 'x,y')")
    assert(folded.collect().map(_.getLong(0)).toSeq == Seq(0L))
    val sqlCells = spark.sql(
      s"SELECT * FROM graft_corr_view('$root/cv', 'g', 'x,y')")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val apiCells = IncrementalViews.readCorrMatrix(spark, s"$root/cv",
        Seq("g"), Seq("x", "y"))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(sqlCells == apiCells && sqlCells.size == 8)
    // the served value is the real correlation: group b is perfectly
    // correlated (two points); group a is 6/sqrt(84)
    val m = IncrementalViews.readCorrMatrix(spark, s"$root/cv",
        Seq("g"), Seq("x", "y"))
      .collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getDouble(3))).toMap
    assert(math.abs(m(("b", "x", "y")) - 1.0) < 1e-9)
    assert(math.abs(m(("a", "x", "y")) - 6.0 / math.sqrt(84.0)) < 1e-9)
    // the UNGROUPED (notebook-shaped) matrix: empty keys CSV maintains
    // one global matrix; batch equivalence pins the values
    spark.sql(
      s"SELECT * FROM graft_view_refresh_corr('$root/src', '$root/gv', '', 'x,y')")
      .collect()
    val globalCells = spark.sql(
      s"SELECT * FROM graft_corr_view('$root/gv', '', 'x,y')")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val batchCells = graft.operators.Relational.corrMatrixBy(
        Snapshots.read(spark, s"$root/src"), Nil, Seq("x", "y"))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(globalCells == batchCells && globalCells.size == 4)
    // housekeeping from pure SQL: the view compacts + trims in place
    val hk = spark.sql(
      s"SELECT * FROM graft_housekeep('$root/gv', 1000, 1)").collect()
    assert(hk.map(r => (r.getString(0), r.getBoolean(1))).toSeq ==
      Seq((s"$root/gv", true)))
    assert(spark.sql(s"SELECT * FROM graft_corr_view('$root/gv', '', 'x,y')")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      == globalCells)
  }

  test("weighted/unweighted corr-view flag must match the build: mismatch fails loudly") {
    val s = spark; import s.implicits._
    import graft.sources.Snapshots
    val root = java.nio.file.Files.createTempDirectory("graft_sqlvw").toString
    Snapshots.commit(
      Seq(("a", 1.0, 2.0, 1.0), ("a", 2.0, 1.0, 2.0), ("a", 3.0, 4.0, 1.0))
        .toDF("g", "x", "y", "w"), s"$root/src", statsCol = Some("g"))
    // weight-built view served unweighted → loud failure, not wrong numbers
    spark.sql(s"SELECT * FROM graft_view_refresh_corr('$root/src', '$root/wv', 'g', 'x,y', 'w', 2)").collect()
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_corr_view('$root/wv', 'g', 'x,y')").collect())
    assert(e1.getMessage.contains("WEIGHTED"))
    assert(spark.sql(
      s"SELECT * FROM graft_corr_view('$root/wv', 'g', 'x,y', true)")
      .collect().length == 4)
    // unweighted view served weighted → the symmetric loud failure
    spark.sql(s"SELECT * FROM graft_view_refresh_corr('$root/src', '$root/uv', 'g', 'x,y')").collect()
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_corr_view('$root/uv', 'g', 'x,y', true)").collect())
    assert(e2.getMessage.contains("UNWEIGHTED"))
  }

  test("text-index TVFs: refresh + BM25 serve from pure SQL == batch bm25") {
    val s = spark; import s.implicits._
    import graft.sources.Snapshots
    val root = java.nio.file.Files.createTempDirectory("graft_sqlbm25").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text").limit(120)
    Snapshots.commit(docs, s"$root/src", statsCol = Some("doc_id"))
    spark.sql(
      s"SELECT * FROM graft_view_refresh_text_index('$root/src', '$root/ix', 'doc_id', 'text')")
      .collect()
    val sqlScores = spark.sql(
      s"SELECT * FROM graft_bm25_view('$root/ix', 'spark,join')")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = graft.operators.Corpus.bm25(
        Snapshots.read(spark, s"$root/src").select("doc_id", "text"),
        "doc_id", "text", Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sqlScores == batch && sqlScores.nonEmpty)
    // TF-IDF from the same views == batch tfIdf
    val sqlTfidf = spark.sql(
      s"SELECT * FROM graft_tfidf_view('$root/ix')")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val batchTfidf = graft.operators.Corpus.tfIdf(
        Snapshots.read(spark, s"$root/src").select("doc_id", "text"),
        "doc_id", "text")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(sqlTfidf == batchTfidf && sqlTfidf.nonEmpty)
    // positional refresh + phrase search from pure SQL
    spark.sql(
      s"SELECT * FROM graft_view_refresh_text_index('$root/src', '$root/px', 'doc_id', 'text', true)")
      .collect()
    val ph = spark.sql(
      s"SELECT * FROM graft_phrase_search('$root/px', 'table,hash')")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ph.nonEmpty && ph.forall(_._2 >= 1L))
    // proximity + KWIC from the same positional root == the Scala API
    val sqlProx = spark.sql(
      s"SELECT * FROM graft_proximity_search('$root/px', 'table', 'hash', 3)")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val apiProx = graft.sources.IncrementalViews
      .proximitySearch(spark, s"$root/px", "table", "hash", 3)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(sqlProx == apiProx && sqlProx.nonEmpty)
    val sqlKwic = spark.sql(
      s"SELECT * FROM graft_kwic('$root/px', 'table', 2)")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val apiKwic = graft.sources.IncrementalViews
      .kwic(spark, s"$root/px", "table", k = 2)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(sqlKwic == apiKwic && sqlKwic.nonEmpty)
    // maintained bigram LM from pure SQL: refresh tick + scoring the
    // model corpus against itself == the batch graft operator
    spark.sql(
      s"SELECT * FROM graft_view_refresh_bigram_lm('$root/src', '$root/lm', 'text')")
      .collect()
    val sqlLm = spark.sql(
      s"SELECT * FROM graft_bigram_lm_score('$root/lm', '$root/src', 'doc_id', 'text')")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val batchLm = graft.operators.Corpus.bigramLogProb(
        Snapshots.read(spark, s"$root/src").select("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(sqlLm == batchLm && sqlLm.nonEmpty)

    // maintained co-occurrence/PMI from pure SQL: refresh tick + serve
    // == the batch graft_cooccurrence over the same corpus; the
    // 3-arg serve prunes to one head token
    spark.sql(
      s"SELECT * FROM graft_view_refresh_cooccurrence('$root/src', '$root/co', 'text', 2)")
      .collect()
    def canonRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(spark.sql(
      s"SELECT * FROM graft_housekeep_cooccurrence('$root/co', 1000000, 2)")
      .collect().map(_.getBoolean(1)).toSeq == Seq(true))
    assert(spark.sql(
      s"SELECT * FROM graft_housekeep_bigram_lm('$root/lm', 1000000, 2)")
      .collect().map(_.getBoolean(1)).toSeq == Seq(true))
    // serves unchanged after housekeeping (compared below vs batch)
    val sqlCo = canonRows(spark.sql(
      s"SELECT * FROM graft_cooccurrence_view('$root/co')"))
    val batchCo = canonRows(graft.operators.Corpus.cooccurrence(
      Snapshots.read(spark, s"$root/src").select("text"), "text", window = 2))
    assert(sqlCo == batchCo && sqlCo.nonEmpty)
    val oneTok = canonRows(spark.sql(
      s"SELECT * FROM graft_cooccurrence_view('$root/co', 1, 'spark')"))
    assert(oneTok == batchCo.filter(_.startsWith("spark|")) && oneTok.nonEmpty)

    // retrieval-shaped serve: the 6-arg form keeps only the k best
    val sqlTop = spark.sql(
      s"SELECT * FROM graft_bm25_view('$root/ix', 'spark,join', 'doc_id', 1.2d, 0.75d, 3)")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(sqlTop ==
      batch.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(3))
    // phrase-KWIC from pure SQL == the Scala API
    val sqlPk = canonRows(spark.sql(
      s"SELECT * FROM graft_kwic_phrase('$root/px', 'table,hash', 2)"))
    val apiPk = canonRows(graft.sources.IncrementalViews
      .kwicPhrase(spark, s"$root/px", Seq("table", "hash"), k = 2))
    assert(sqlPk == apiPk && sqlPk.nonEmpty)
    // the search page from pure SQL == the Scala API (positional root)
    val sqlPage = canonRows(spark.sql(
      s"SELECT * FROM graft_search('$root/px', 'table,hash', 5, 2)"))
    val apiPage = canonRows(graft.sources.IncrementalViews
      .search(spark, s"$root/px", Seq("table", "hash"), 5, 2))
    assert(sqlPage == apiPage && sqlPage.nonEmpty)
    // whole-index housekeeping from SQL: history trimmed, serve intact
    assert(spark.sql(
      s"SELECT * FROM graft_housekeep_text_index('$root/ix', 1000000, 2)")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq ==
      Seq((s"$root/ix", true)))
    val after = spark.sql(
      s"SELECT * FROM graft_bm25_view('$root/ix', 'spark,join')")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(after == batch)
  }

  test("regression + corpus TVFs: fit, maintained model, semantic dedup, and mixing from pure SQL") {
    val s = spark; import s.implicits._
    import graft.sources.{IncrementalViews, Snapshots}
    // fit TVF == the Scala API, ridge arg accepted
    val df = (1 to 40).map { i =>
      val x1 = i.toDouble; val x2 = ((i * 7) % 13).toDouble
      ("g" + (i % 2), x1, x2, 2.0 + 3.0 * x1 - 0.5 * x2)
    }.toDF("g", "x1", "x2", "y")
    df.createOrReplaceTempView("reg_tvf")
    val sqlFit = spark.sql(
      "SELECT * FROM graft_ols_fit('reg_tvf', 'y', 'x1,x2', 'g')")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val apiFit = graft.operators.Regression.olsFitBy(df, Seq("g"), "y",
        Seq("x1", "x2"))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(sqlFit == apiFit && sqlFit.size == 6)
    assert(spark.sql(
      "SELECT * FROM graft_ols_fit('reg_tvf', 'y', 'x1,x2', '', 0.5)")
      .collect().length == 3)
    // maintained-model TVF over a refreshed moment view
    val root = java.nio.file.Files.createTempDirectory("graft_sqlols").toString
    Snapshots.commit(df, s"$root/src", statsCol = Some("g"))
    spark.sql(
      s"SELECT * FROM graft_view_refresh_corr('$root/src', '$root/v', 'g', 'y,x1,x2')")
      .collect()
    val sqlModel = spark.sql(
      s"SELECT * FROM graft_ols_model('$root/v', 'g', 'y,x1,x2', 'y', 'x1,x2')")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(sqlModel == apiFit) // served model == from-scratch fit
    // semantic-dedup TVF: same shape as the operator
    Tables.embeddings(spark, sf("sf0.001")).createOrReplaceTempView("emb_sd")
    val sd = spark.sql(
      "SELECT * FROM graft_semantic_dedup('emb_sd', 'vec_id', 'embedding', 8, 0.35)")
    assert(sd.columns.toSeq == Seq("vec_id", "cell_id", "n_dups", "kept"))
    assert(sd.count() == Tables.embeddings(spark, sf("sf0.001")).count())
    // mixing TVF: recipe string parses, budgets bite
    Tables.documents(spark, sf("sf0.001")).createOrReplaceTempView("docs_mix")
    val mix = spark.sql(
      "SELECT * FROM graft_mix_by_budget('docs_mix', 'source', 'doc_id', 'text', 'src0:50,src1:80', 30)")
    assert(mix.columns.toSeq == Seq("doc_id", "source", "n_tokens", "cum_before"))
    assert(mix.count() > 0)
    val bad = intercept[Exception] { spark.sql(
      "SELECT * FROM graft_mix_by_budget('docs_mix', 'source', 'doc_id', 'text', 'src0=50')") }
    assert(bad.getMessage.contains("domain:budget"))
    // eval TVF: in-sample on the planted exact model is perfect;
    // holdout form scores only the held-out rows
    val ev = spark.sql(
      "SELECT * FROM graft_ols_eval('reg_tvf', 'y', 'x1,x2')").head()
    assert(ev.getAs[Double]("r2") == 1.0 && ev.getAs[Double]("n") == 40.0)
    val hv = spark.sql(
      "SELECT * FROM graft_ols_eval('reg_tvf', 'y', 'x1,x2', 80, 'x1')").head()
    assert(hv.getAs[Double]("n") < 40.0 && hv.getAs[Double]("r2") == 1.0)
    // BPE TVF: pieces reconstruct the word
    Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
      .createOrReplaceTempView("bpe_tvf")
    val pieces = spark.sql(
      "SELECT word, pieces FROM graft_bpe_pieces('bpe_tvf', 'doc_id', 'text', 4)")
      .as[(String, Seq[String])].collect().toMap
    assert(pieces("lowest") == Seq("lowe", "s", "t"))
    assert(pieces("low") == Seq("low"))
    // a production-sized merge request (>512) must dispatch to the
    // broadcast-ranks encoder instead of building a 5000-deep fold
    // plan — same rows as the folded path on the trained merges
    // (training exhausts this vocabulary long before 5000, so the
    // case stays cheap while exercising the large-n dispatch)
    val bigSql = spark.sql(
      "SELECT word, pieces FROM graft_bpe_pieces('bpe_tvf', 'doc_id', 'text', 5000)")
    assert(bigSql.queryExecution.sparkPlan.toString.contains("MapPartitions"),
      "numMerges=5000 did not dispatch to the broadcast encoder")
    val bigPieces = bigSql.as[(String, Seq[String])].collect().toMap
    // fully-merged fixpoint: every word collapses to one piece
    assert(bigPieces.keySet == Set("low", "lower", "lowest"))
    assert(bigPieces.forall { case (w, p) => p == Seq(w) })
    // co-occurrence TVF == the Scala API on the same tiny corpus
    val sqlCo = spark.sql(
      "SELECT * FROM graft_cooccurrence('bpe_tvf', 'text', 1)")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val apiCo = graft.operators.Corpus.cooccurrence(
        spark.table("bpe_tvf"), "text", window = 1)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(sqlCo == apiCo && sqlCo.size == 3) // (low,low)x2,(low,lower),(lower,lowest)
    // pairwise-complete corr TVF == the Scala API (grouped form)
    val sqlPw = spark.sql(
      "SELECT * FROM graft_corr_pairwise('reg_tvf', 'x1,x2,y', 'g')")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val apiPw = graft.operators.Relational.corrMatrixPairwiseBy(df,
        Seq("g"), Seq("x1", "x2", "y"))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(sqlPw == apiPw && sqlPw.size == 18)
    // grouped logistic TVF: output shape + a sane keep/drop fit
    val logiDf = (1 to 200).map { i =>
      val x = ((i % 21) - 10) / 2.0
      ("g" + (i % 2), x, if (x > 0.5) 1.0 else 0.0)
    }.toDF("g", "x", "y")
    logiDf.createOrReplaceTempView("logi_tvf")
    val lg = spark.sql(
      "SELECT * FROM graft_logistic_fit('logi_tvf', 'y', 'x', 'g', 0.5)")
    assert(lg.columns.toSeq == Seq("g", "term", "beta", "loss"))
    val lgm = lg.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(lgm.size == 4 && lgm(("g0", "x")) > 0.0 && lgm(("g1", "x")) > 0.0)
    // WEIGHTED maintained model from pure SQL: weight-built view +
    // weighted=true serve == the Scala WLS fit
    val wdf = df.withColumn("w", expr("1.0 + (x1 % 4) * 0.25"))
    wdf.createOrReplaceTempView("reg_wtvf")
    Snapshots.commit(wdf, s"$root/wsrc", statsCol = Some("g"))
    spark.sql(
      s"SELECT * FROM graft_view_refresh_corr('$root/wsrc', '$root/wv', 'g', 'y,x1,x2', 'w', 2)")
      .collect()
    val sqlWls = spark.sql(
      s"SELECT * FROM graft_ols_model('$root/wv', 'g', 'y,x1,x2', 'y', 'x1,x2', true)")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val apiWls = graft.operators.Regression.olsFitBy(wdf, Seq("g"), "y",
        Seq("x1", "x2"), weight = Some(("w", 2)))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(sqlWls == apiWls)
  }

  test("embedding-moment TVFs: maintained PCA from pure SQL == Similarity.pca") {
    import graft.sources.Snapshots
    val root = java.nio.file.Files.createTempDirectory("graft_sqlpca").toString
    val embs = Tables.load(spark, sf("sf0.001"), "embeddings")
      .select("vec_id", "embedding").limit(40)
    Snapshots.commit(embs, s"$root/src", statsCol = Some("vec_id"))
    spark.sql(
      s"SELECT * FROM graft_view_refresh_embedding_moments('$root/src', '$root/mom', 'embedding', 64)")
      .collect()
    def canonRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val sqlPc = canonRows(spark.sql(
      s"SELECT * FROM graft_pca_view('$root/mom', '$root/src', 'vec_id', 'embedding', 64, 4)"))
    val batchPc = canonRows(graft.operators.Similarity.pca(
      Snapshots.read(spark, s"$root/src").select("vec_id", "embedding"),
      "vec_id", "embedding", 64, 4))
    assert(sqlPc == batchPc && sqlPc.nonEmpty)
  }

  test("TVFs compose with ordinary SQL (filter + agg over graft_sessionize)") {
    Tables.events(spark, sf("sf0.001")).createOrReplaceTempView("ev_tvf2")
    val r = spark.sql(
      """SELECT user_id, max(session_idx) AS n_sessions
        |FROM graft_sessionize('ev_tvf2', 'user_id', 'ts', 'event_id', 1800)
        |GROUP BY user_id ORDER BY n_sessions DESC, user_id LIMIT 5""".stripMargin)
    assert(r.count() == 5)
    assert(r.collect().head.getLong(1) >= 1L)
  }

  test("graft's custom expressions are first-class in SQL (cosine ranking query)") {
    Tables.embeddings(spark, sf("sf0.001")).createOrReplaceTempView("emb")
    val r = spark.sql(
      """SELECT a.vec_id, b.vec_id AS other, graft_cosine(a.embedding, b.embedding) AS cos
        |FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id BETWEEN 1 AND 20
        |ORDER BY cos DESC LIMIT 3""".stripMargin).collect()
    assert(r.length == 3)
    assert(r.map(_.getDouble(2)).toSeq == r.map(_.getDouble(2)).sortBy(-_).toSeq)
  }
}
