package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact

/** Relational operators covering the reference's ksqlDB surface and
  * the latency-monitor analytics.
  */
object Relational {

  /** ksqlDB's LATEST_BY_OFFSET (ksqldb-consumer profiles/
    * low_latency.sql:12): per key, the value carried by the row with
    * the highest offset. `max_by` is a single hash aggregation —
    * map-side partial agg keeps only one candidate per key per
    * partition, so state is O(keys), not O(rows).
    */
  def latestByOffset(
      df: DataFrame,
      keys: Seq[String],
      offsetCol: String,
      valueCols: Seq[String]): DataFrame = {
    val aggs =
      valueCols.map(v => max_by(col(v), col(offsetCol)).as(s"latest_$v")) ++
        Seq(max(col(offsetCol)).as("last_offset"), count(lit(1L)).as("row_count"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** ksqlDB's EARLIEST_BY_OFFSET — the dual of [[latestByOffset]];
    * same single hash-aggregation shape via `min_by`. */
  def earliestByOffset(
      df: DataFrame,
      keys: Seq[String],
      offsetCol: String,
      valueCols: Seq[String]): DataFrame = {
    val aggs =
      valueCols.map(v => min_by(col(v), col(offsetCol)).as(s"earliest_$v")) ++
        Seq(min(col(offsetCol)).as("first_offset"), count(lit(1L)).as("row_count"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The latency monitor's metric block (latency-monitor
    * models/LatencyMetrics): avg, p50, p95, p99, min, max, stddev,
    * count — as one aggregation pass.
    *
    * stddev is computed from exact decimal sums via the textbook
    * sqrt((Σx² − (Σx)²/n)/(n−1)) identity so the result is
    * bit-identical across engines (Welford merge order would not be);
    * inputs are ≤2-decimal so x² is ≤4-decimal and the decimal cast
    * is lossless. Percentiles use Spark's exact `percentile` (linear
    * interpolation — same definition as SQL quantile_cont).
    */
  def distributionStats(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      valueScale: Int = 2): DataFrame = {
    val v = col(valueCol)
    val n = count(lit(1L))
    val s = Exact.sumExact(v, valueScale)
    val sq = Exact.sumExact(v * v, 2 * valueScale)
    val grouped =
      if (keys.isEmpty) df.groupBy() else df.groupBy(keys.map(col): _*)
    grouped.agg(
      (s / n).as("avg_v"),
      Exact.roundAt(expr(s"percentile($valueCol, 0.5)"), 4).as("p50_v"),
      Exact.roundAt(expr(s"percentile($valueCol, 0.95)"), 4).as("p95_v"),
      Exact.roundAt(expr(s"percentile($valueCol, 0.99)"), 4).as("p99_v"),
      min(v).as("min_v"),
      max(v).as("max_v"),
      sqrt((sq - s * s / n) / (n - lit(1L))).as("stddev_v"),
      n.as("sample_count"))
  }

  /** Salted equi-join for skewed keys. AQE's skew-join splitting
    * handles most skew at runtime; explicit salting is the static
    * fallback for the cases AQE can't fix — a single key too hot for
    * any split (every row of it still hashes to one map output
    * partition before AQE sees it) or a build side that must stay
    * sort-merge. The left (skewed) side gets a deterministic salt in
    * [0, buckets) hashed from `leftSaltCol`; the right side replicates
    * each row `buckets` times; the join key becomes (keys, salt), so
    * one hot key spreads over `buckets` shuffle partitions at the cost
    * of a `buckets`× right-side blowup — use with a small-ish right
    * side and buckets sized to the observed skew ratio. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftSaltCol: String,
      buckets: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(leftSaltCol)), lit(buckets.toLong)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Bloom-prefiltered semi join — the explicit runtime-filter
    * pattern for a BIG probe side whose exact join keys are too many
    * to broadcast raw: one pass over `small` builds a
    * hundreds-of-KB bit set ([[graft.functions.BloomBuildAgg]],
    * map-side OR-merged), the bit set rides into `big`'s scan as a
    * plan literal probed inside whole-stage codegen, and only the
    * surviving rows (true matches + ≤fpp false positives) pay the
    * exact semi-join shuffle. No false negatives → result-identical
    * to the plain semi join at any fpp.
    *
    * `expectedItems` sizes the filter (pass the small side's distinct
    * key estimate; 0 = count it with one extra job). At 100 TB this
    * is the difference between shuffling the full fact table and
    * shuffling ~selectivity of it — the same move Spark's runtime
    * row-level filtering makes for eligible plans, available here for
    * ANY plan shape and tunable fpp. */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
                    small: DataFrame, smallKey: String,
                    expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    import graft.functions.{BloomBuildAgg, BloomMightContain, BloomUtil, ColumnBridge}
    val n = if (expectedItems > 0) expectedItems
            else small.select(smallKey).distinct().count()
    val (numBits, numHashes) = BloomUtil.sizing(math.max(1L, n), fpp)
    val filterWords = small.select(ColumnBridge.column(
        BloomBuildAgg(ColumnBridge.expression(xxhash64(col(smallKey))),
          numBits, numHashes).toAggregateExpression()).as("f"))
      .head().getSeq[Long](0)
    val pre = big.filter(ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(typedLit(filterWords)),
      ColumnBridge.expression(xxhash64(col(bigKey))))))
    pre.join(small, pre(bigKey) === small(smallKey), "left_semi")
  }

  /** Trailing time-range rolling mean (the streaming-dashboard "value
    * over the last hour" shape): a RANGE-frame window over event-time
    * micros, so rows with equal timestamps are frame peers on every
    * engine. One shuffle on the key; the frame sum accumulates in
    * exact decimal (order-independent) per the oracle discipline. */
  def rollingMean(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      idCol: String,
      trailingSeconds: Long,
      scale: Int = 2): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-trailingSeconds * 1000000L, 0)
    df.select(col(idCol) +: keys.map(col) :+
      (Exact.sumExactOver(col(valueCol), scale, w) /
        count(lit(1L)).over(w)).as("roll_avg") :+
      count(lit(1L)).over(w).as("n_window"): _*)
  }

  /** Rolling z-score anomaly detection: flags a point whose deviation
    * from the trailing-window mean exceeds `z` sample standard
    * deviations. The baseline frame is STRICTLY PRIOR (`RANGE …
    * PRECEDING AND 1 PRECEDING`) — a spike must not inflate its own
    * baseline, or large outliers mask themselves. Same RANGE-frame
    * family as [[rollingMean]]; the moment sums use the 128-bit exact
    * window aggregates so mean/variance — and therefore the boundary
    * comparison itself — are bit-identical across engines. Baselines
    * with fewer than `minN` points never flag (a 1-point baseline has
    * no variance).
    *
    * Scale: one shuffle on the key, one ordered frame scan; the two
    * moment sums ride the same frame. */
  def rollingAnomaly(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      idCol: String,
      trailingSeconds: Long,
      z: Double = 3.0,
      minN: Long = 5,
      scale: Int = 2): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-trailingSeconds * 1000000L, -1L)
    val n = count(lit(1L)).over(w)
    val s1 = Exact.sumExactOver(col(valueCol), scale, w)
    val s2 = Exact.sumExactOver(col(valueCol) * col(valueCol), 2 * scale, w)
    val nD = n.cast("double")
    val mean = s1 / nD
    val variance = (nD * s2 - s1 * s1) / (nD * (nD - lit(1.0)))
    val dev = abs(col(valueCol) - mean)
    df.select(col(idCol) +: keys.map(col) :+ col(valueCol) :+
      coalesce(Exact.roundAt(mean, 4), lit(0.0)).as("roll_mean") :+
      n.as("n_window") :+
      (n >= minN && dev > lit(z) * sqrt(variance)).as("is_anomaly"): _*)
  }

  /** [[distributionStats]]'s scale path: exact `percentile` buffers
    * every value per group (OOM risk on 100 TB groups);
    * `approx_percentile` (KLL-style sketch) keeps O(1/accuracy) state
    * per group and merges map-side. Engine-specific sketch → no
    * cross-engine oracle; accuracy is spec-bounded against exact. */
  def distributionStatsApprox(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      accuracy: Int = 10000): DataFrame = {
    val v = col(valueCol)
    val n = count(lit(1L))
    val grouped =
      if (keys.isEmpty) df.groupBy() else df.groupBy(keys.map(col): _*)
    grouped.agg(
      // exact-decimal avg (order-independent) like the exact twin —
      // the SKETCH part is the percentiles; an engine-exact mean costs
      // nothing and makes the query oracle-able in the sketch's exact
      // regime (n <= accuracy: the GK summary keeps every sample and
      // returns the order statistic at ceil(p*n))
      (Exact.sumExact(v, 2) / n).as("avg_v"),
      expr(s"approx_percentile($valueCol, 0.5, $accuracy)").as("p50_v"),
      expr(s"approx_percentile($valueCol, 0.95, $accuracy)").as("p95_v"),
      expr(s"approx_percentile($valueCol, 0.99, $accuracy)").as("p99_v"),
      min(v).as("min_v"),
      max(v).as("max_v"),
      n.as("sample_count"))
  }

  /** Streaming twin of [[distributionStatsApprox]]: the same sketch
    * aggregation keyed by (event-time window, keys) under a watermark
    * — the shape a live latency dashboard runs. The KLL-style
    * `approx_percentile` buffer is a TypedImperativeAggregate, so it
    * lives in the streaming state store (RocksDB by default in
    * [[graft.GraftSession]]) with O(1/accuracy) state per open window
    * × key, merged map-side per micro-batch; the watermark evicts
    * closed windows, bounding state independent of stream length. On a
    * batch frame the watermark is a no-op and the result is the exact
    * batch windowed aggregation — the parity the spec asserts after
    * draining the same rows through a stream. */
  def distributionStatsApproxStream(
      df: DataFrame,
      tsCol: String,
      windowSize: String,
      keys: Seq[String],
      valueCol: String,
      accuracy: Int = 10000,
      watermarkDelay: String = "2 minutes"): DataFrame = {
    val v = col(valueCol)
    val marked =
      if (df.isStreaming) df.withWatermark(tsCol, watermarkDelay) else df
    marked
      .groupBy(window(col(tsCol), windowSize) +: keys.map(col): _*)
      .agg(
        avg(v).as("avg_v"),
        expr(s"approx_percentile($valueCol, 0.5, $accuracy)").as("p50_v"),
        expr(s"approx_percentile($valueCol, 0.95, $accuracy)").as("p95_v"),
        expr(s"approx_percentile($valueCol, 0.99, $accuracy)").as("p99_v"),
        min(v).as("min_v"),
        max(v).as("max_v"),
        count(lit(1L)).as("sample_count"))
      .select(col("window.start").as("window_start") +: keys.map(col) :+
        col("avg_v") :+ col("p50_v") :+ col("p95_v") :+ col("p99_v") :+
        col("min_v") :+ col("max_v") :+ col("sample_count"): _*)
  }

  /** The latency monitor pipeline shape (LatencyMonitor.scala:
    * collectLatencyData → calculateMetrics): derive a per-window
    * latency (window close minus earliest stamp), apply the monitor's
    * validity guards (positive, under 10 minutes —
    * LatencyMonitor.scala:215-222), then the distribution stats.
    */
  def latencyReport(
      events: DataFrame,
      tsCol: String,
      keys: Seq[String],
      windowSize: String): DataFrame = {
    val perWindow = events
      .groupBy((window(col(tsCol), windowSize) +: keys.map(col)): _*)
      .agg(
        (expr(s"unix_micros(max($tsCol)) div 1000") -
          expr(s"unix_micros(min($tsCol)) div 1000")).as("latency_ms"))
      .filter(col("latency_ms") > 0 && col("latency_ms") < 600000L)
    // integer latencies: plain sums are exact, no decimal cast needed
    val v = col("latency_ms")
    val n = count(lit(1L))
    val s = sum(v).cast("double")
    val sq = sum(v * v).cast("double")
    perWindow.groupBy().agg(
      (s / n).as("avg_latency_ms"),
      expr("percentile(latency_ms, 0.5)").as("p50_latency_ms"),
      expr("percentile(latency_ms, 0.95)").as("p95_latency_ms"),
      expr("percentile(latency_ms, 0.99)").as("p99_latency_ms"),
      min(v).as("min_latency_ms"),
      max(v).as("max_latency_ms"),
      sqrt((sq - s * s / n) / (n - lit(1L))).as("stddev_latency_ms"),
      n.as("sample_count"))
  }

  /** ksqlDB's TOPK(col, k): the k largest values per group, descending.
    * Backed by [[graft.functions.BoundedTopK]] — O(k) state per group
    * with map-side trimming, vs the O(group) state of
    * `slice(sort_array(collect_list(v)))`. */
  def topK(value: Column, k: Int): Column =
    graft.functions.ColumnBridge.column(
      graft.functions.BoundedTopK(
        graft.functions.ColumnBridge.expression(value), k, distinct = false)
        .toAggregateExpression())

  /** Misra–Gries heavy hitters (bounded-state frequent items): at
    * most k counters per buffer — O(k) map-side state on an unbounded
    * item stream, exact when k ≥ |distinct|, guaranteed
    * ≤ n/(k+1)-undercount otherwise. See
    * [[graft.functions.FrequentItems]]. */
  def frequentItems(value: Column, k: Int): Column =
    graft.functions.ColumnBridge.column(
      graft.functions.FrequentItems(
        graft.functions.ColumnBridge.expression(value), k)
        .toAggregateExpression())

  /** ksqlDB's TOPKDISTINCT(col, k) — as [[topK]] over distinct values. */
  def topKDistinct(value: Column, k: Int): Column =
    graft.functions.ColumnBridge.column(
      graft.functions.BoundedTopK(
        graft.functions.ColumnBridge.expression(value), k, distinct = true)
        .toAggregateExpression())

  /** ksqlDB's HISTOGRAM(col), relationally normalized: one row per
    * (group, value) with its frequency, instead of ksqlDB's
    * map<value,count> column. At 100 TB a per-key map is unbounded
    * driver-side state waiting to happen; rows keep the histogram
    * distributed, sortable, and joinable. */
  def histogram(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy((keys.map(col) :+ col(valueCol)): _*)
      .agg(count(lit(1L)).as("frequency"))

  /** Forward fill — the notebook's `merged.ffill()` (price_prediction
    * .ipynb "Data Analysis" cell), distributed: running
    * `last(ignoreNulls)` per key ordered by `ordCol`. One shuffle on
    * the key; no driver state. */
  def forwardFill(
      df: DataFrame,
      keys: Seq[String],
      ordCol: String,
      valueCols: Seq[String]): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** [[forwardFill]] for the FEW-GIANT-SERIES regime. The plain
    * variant puts each key's whole history in one window partition —
    * right when keys are many, single-threaded (and spill-bound) when
    * one key's history alone outsizes an executor: one sensor, years
    * of ticks; or no key at all. This variant adds a TIME-BUCKET
    * level so parallelism scales with data, not key count:
    *
    *  1. rows group by (keys, bucket) — `bucket` is a caller-chosen
    *     MONOTONE non-decreasing function of `ordCol` (day/month
    *     truncation, id div N…);
    *  2. one aggregation finds each bucket's LAST non-null value per
    *     fill column (`max_by` over null-masked order);
    *  3. the carry-IN of every bucket = last non-null carry over all
    *     PRECEDING buckets — a window over the carry table, which has
    *     one row per (key, bucket), orders of magnitude smaller than
    *     the data (the only per-key serial step, and it is tiny);
    *  4. the within-bucket fill windows over (keys, bucket) — bounded
    *     partitions — seeded by `coalesce(within-bucket fill,
    *     carry-in)`.
    *
    * Exactly equal to [[forwardFill]] (spec-asserted), including
    * `keys = Nil` (one global series — the case the plain variant
    * cannot distribute at all). `ordCol` must be unique per key, the
    * same determinism contract the plain variant already needs. */
  def forwardFillBucketed(
      df: DataFrame,
      keys: Seq[String],
      ordCol: String,
      valueCols: Seq[String],
      bucket: Column): DataFrame = {
    val b = "__ffb"
    val grp = keys :+ b
    val withB = df.withColumn(b, bucket)
    val lastAggs = valueCols.map(c =>
      max_by(col(c), when(col(c).isNotNull, col(ordCol))).as(s"__last_$c"))
    val carries = withB.groupBy(grp.map(col): _*)
      .agg(lastAggs.head, lastAggs.tail: _*)
    val wCarry = Window.partitionBy(keys.map(col): _*).orderBy(col(b))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = valueCols.foldLeft(carries)((d, c) =>
        d.withColumn(s"__ci_$c",
          last(col(s"__last_$c"), ignoreNulls = true).over(wCarry)))
      .select(grp.map(col) ++ valueCols.map(c => col(s"__ci_$c")): _*)
    val wIn = Window.partitionBy(grp.map(col): _*).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(withB.join(carryIn, grp))((d, c) =>
      d.withColumn(c,
        coalesce(last(col(c), ignoreNulls = true).over(wIn), col(s"__ci_$c"))))
    filled.drop((b +: valueCols.map(c => s"__ci_$c")): _*)
  }

  /** Winsorize: clip `valueCol` to its per-group [lo, hi] exact
    * percentiles — standard outlier scrubbing before training.
    *
    * Scale: the per-group bounds aggregate is tiny (one row per
    * group) and broadcasts back onto the fact side — no second
    * shuffle of the data. The exact `percentile` buffers each group
    * once in the bounds agg; at 100 TB swap it for
    * `approx_percentile` (same shape, sketch state) — the
    * [[distributionStatsApprox]] trade documented in SURVEY §4. */
  def winsorize(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      lo: Double,
      hi: Double): DataFrame = {
    val bounds = df.groupBy(keys.map(col): _*).agg(
      // backtick-quoted so non-identifier column names survive the
      // expr() splice (percentile has no typed Column overload)
      expr(s"percentile(`$valueCol`, $lo)").as("__plo"),
      expr(s"percentile(`$valueCol`, $hi)").as("__phi"))
    df.join(broadcast(bounds), keys)
      .withColumn(s"${valueCol}_w",
        Exact.roundAt(least(greatest(col(valueCol), col("__plo")), col("__phi")), 4))
      .drop("__plo", "__phi")
  }

  /** Per-group z-score standardization (exact decimal mean, sample
    * stddev via the decimal-sum formula — both engine-portable).
    * Same broadcast-stats-back shape as [[winsorize]]. */
  def zscore(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      valueScale: Int = 2): DataFrame = {
    val v = col(valueCol)
    val n = count(lit(1L))
    val s = Exact.sumExact(v, valueScale)
    val sq = Exact.sumExact(v * v, 2 * valueScale)
    val stats = df.groupBy(keys.map(col): _*).agg(
      (s / n).as("__mean"),
      // sample stddev is undefined for 1-row groups ((n-1)=0 → NaN
      // that would flow through silently); emit NULL instead — the
      // same thing DuckDB's stddev_samp returns for n=1
      when(n > 1, sqrt((sq - s * s / n) / (n - lit(1L)))).as("__std"))
    df.join(broadcast(stats), keys)
      .withColumn(s"${valueCol}_z",
        Exact.roundAt((v - col("__mean")) / col("__std"), 4))
      .drop("__mean", "__std")
  }

  /** Full Pearson correlation matrix over a metric column list — the
    * reference notebook's `correlation_matrix` step
    * (dmi/price_prediction.ipynb: df[metrics].corr()) as ONE
    * aggregation pass.
    *
    * A single `agg` computes n, every Σcᵢ and every pairwise Σcᵢ·cⱼ
    * (i ≤ j) — k + k(k+1)/2 + 1 exact sums in one map-side-combined
    * HashAggregate over one scan — and the k×k matrix cells are then a
    * pure PROJECTION over that one stats row (explode of literal
    * structs): no second shuffle, no per-pair scan. At 100 TB the cost
    * is exactly one pass over the data regardless of k.
    *
    * Bit-stable across engines: sums via [[Exact.sumExact]] and the
    * same explicit moment formula as [[Exact.corrExact]], so the
    * DuckDB oracle reproduces every cell exactly. Symmetric cells
    * reuse the identical Σ terms (IEEE multiplication commutes), and
    * the long (col_x, col_y, corr_v) form keeps the output
    * engine-sortable. */
  def corrMatrix(df: DataFrame, cols: Seq[String], scale: Int = 2): DataFrame =
    corrMatrixBy(df, Nil, cols, scale)

  /** [[corrMatrix]] PER GROUP — one k×k matrix per key combination
    * (e.g. the notebook frame's per-DK-area matrices), still one
    * aggregation pass: the stats row is per group and the cells stay
    * a pure projection, so groups add hash-aggregate state, never
    * extra scans or shuffles. */
  def corrMatrixBy(df: DataFrame, keys: Seq[String], cols: Seq[String],
                   scale: Int = 2): DataFrame = {
    val n = count(lit(1L)).cast("double").as("n")
    val sums = cols.map(c => Exact.sumExact(col(c), scale).as(s"s_$c"))
    val prods = for { i <- cols.indices; j <- i until cols.length }
      yield Exact.sumExact(col(cols(i)) * col(cols(j)), 2 * scale)
        .as(s"p_${i}_$j")
    val stats = df.groupBy(keys.map(col): _*).agg(n, (sums ++ prods): _*)
    def p(i: Int, j: Int) = col(s"p_${math.min(i, j)}_${math.max(i, j)}")
    def variance(i: Int) =
      col("n") * p(i, i) - col(s"s_${cols(i)}") * col(s"s_${cols(i)}")
    val cells = for { i <- cols.indices; j <- cols.indices } yield
      struct(
        lit(cols(i)).as("col_x"),
        lit(cols(j)).as("col_y"),
        ((col("n") * p(i, j) - col(s"s_${cols(i)}") * col(s"s_${cols(j)}")) /
          sqrt(variance(i) * variance(j))).as("corr_v"))
    stats.select((keys.map(col) :+ explode(array(cells: _*)).as("cell")): _*)
      .select((keys.map(col) ++
        Seq(col("cell.col_x"), col("cell.col_y"), col("cell.corr_v"))): _*)
  }

  /** PAIRWISE-COMPLETE correlation matrix — pandas `.corr()`
    * semantics: each (cᵢ, cⱼ) cell uses every row where BOTH columns
    * are non-null, independently per pair, instead of
    * [[corrMatrixBy]]'s listwise rows. On a frame with late-starting
    * series (the notebook's hourly feature frame before a series'
    * first observation) the two differ exactly on those leading-edge
    * cells — this is the bit-for-bit `.corr()` replay.
    *
    * Still ONE aggregation pass over one scan: per unordered pair the
    * agg carries (n, Σcᵢ, Σcⱼ, Σcᵢcⱼ, Σcᵢ², Σcⱼ²) as conditional
    * exact sums (`when(both non-null)` — NULL rows drop out of count
    * and sums alike), a 6·k(k+1)/2 ≈ O(k²) buffer independent of row
    * count, and the k×k cells stay a pure projection. A pair with no
    * complete rows (or zero variance) yields NULL, as pandas' NaN. */
  def corrMatrixPairwise(df: DataFrame, cols: Seq[String],
                         scale: Int = 2): DataFrame =
    corrMatrixPairwiseBy(df, Nil, cols, scale)

  /** [[corrMatrixPairwise]] per group — one matrix per key
    * combination, same single-pass discipline as [[corrMatrixBy]]. */
  def corrMatrixPairwiseBy(df: DataFrame, keys: Seq[String],
                           cols: Seq[String], scale: Int = 2): DataFrame = {
    val pairs = for { i <- cols.indices; j <- i until cols.length } yield (i, j)
    def both(i: Int, j: Int) =
      col(cols(i)).isNotNull && col(cols(j)).isNotNull
    val aggs = pairs.flatMap { case (i, j) =>
      val ci = when(both(i, j), col(cols(i)))
      val cj = when(both(i, j), col(cols(j)))
      Seq(
        count(when(both(i, j), lit(1L))).cast("double").as(s"n_${i}_$j"),
        Exact.sumExact(ci, scale).as(s"a_${i}_$j"),
        Exact.sumExact(cj, scale).as(s"b_${i}_$j"),
        Exact.sumExact(ci * cj, 2 * scale).as(s"p_${i}_$j"),
        Exact.sumExact(ci * ci, 2 * scale).as(s"u_${i}_$j"),
        Exact.sumExact(cj * cj, 2 * scale).as(s"v_${i}_$j"))
    }
    val stats = df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // ordered cell (i, j) reads the unordered pair's stats; when the
    // order is swapped, cᵢ plays the b/v role
    val cells = for { i <- cols.indices; j <- cols.indices } yield {
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      val (sx, sy, ux, vy) =
        if (i <= j)
          (col(s"a_${lo}_$hi"), col(s"b_${lo}_$hi"),
            col(s"u_${lo}_$hi"), col(s"v_${lo}_$hi"))
        else
          (col(s"b_${lo}_$hi"), col(s"a_${lo}_$hi"),
            col(s"v_${lo}_$hi"), col(s"u_${lo}_$hi"))
      val n = col(s"n_${lo}_$hi")
      val p = col(s"p_${lo}_$hi")
      struct(
        lit(cols(i)).as("col_x"),
        lit(cols(j)).as("col_y"),
        ((n * p - sx * sy) /
          sqrt((n * ux - sx * sx) * (n * vy - sy * sy))).as("corr_v"))
    }
    stats.select((keys.map(col) :+ explode(array(cells: _*)).as("cell")): _*)
      .select((keys.map(col) ++
        Seq(col("cell.col_x"), col("cell.col_y"), col("cell.corr_v"))): _*)
  }

  /** Batch max-gap sessionization — the batch twin of the streaming
    * `session_window` agg (#4): an event starts a new session for its
    * user when the gap since the user's previous event exceeds
    * `maxGapSec`. Emits every event with its 1-based per-user
    * `session_idx` (deterministic: events ordered by (ts, id) so
    * equal timestamps tie-break stably).
    *
    * Scale: ONE hash-partition shuffle on the user key; both window
    * passes (lag → running sum) reuse the same partitioning+ordering,
    * so Spark plans a single Exchange+Sort. Per-user state during the
    * scan is O(1). */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 idCol: String, maxGapSec: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val us = unix_micros(col(tsCol))
    val prevUs = lag(us, 1).over(w)
    val isNew = when(prevUs.isNull ||
      us - prevUs > maxGapSec * 1000000L, 1L).otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__new")
  }

  /** Per-session roll-up over [[sessionize]]: event count, start/end
    * (epoch micros — engine-portable), and duration. Adds one
    * aggregation on (user, session) — partial-agg collapsed before
    * its shuffle. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
                   idCol: String, maxGapSec: Long): DataFrame =
    sessionize(df, userCol, tsCol, idCol, maxGapSec)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1L)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"))
      .withColumn("dur_us", col("end_us") - col("start_us"))

  /** Equi-depth (quantile) discretization: bin b(v) = number of the
    * nBins−1 interpolated-percentile cutpoints strictly below v, so
    * bins are 0-based and population-balanced. Cutpoints come from
    * ONE exact-percentile aggregation collected as bounded driver
    * metadata (nBins−1 doubles — the int8Range budget) and return as
    * comparison literals, making the binning itself a pure
    * shuffle-free codegen projection. Spark's exact `percentile`
    * interpolates identically to DuckDB's `quantile_cont` (proved
    * bitwise by q_latency_stats), so bins are engine-exact. */
  def quantileBin(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val cuts = df.agg(expr(
        s"percentile($valueCol, array(${ps.mkString(", ")}))").as("c"))
      .head().getSeq[Double](0)
    val bin = cuts.map(c => when(col(valueCol) > c, 1L).otherwise(0L))
      .reduce(_ + _)
    df.withColumn("bin", bin)
  }

  /** Path analysis: the k most common within-session event-type
    * sequences. Builds on [[sessionize]]; each session's path is its
    * event types joined in (ts, id) order. The per-session collect is
    * bounded by the session length (the max-gap rule caps it in any
    * real stream — no unbounded per-key state), path counting is a
    * map-side-combined agg on the path string, and the final top-k
    * orders (count desc, path asc) for a deterministic boundary. */
  /** The per-(user, session) event-type path — [[topPaths]] before
    * its global rollup, exposed so the maintained-view twin can store
    * exactly these rows and serve the rollup with zero event I/O. */
  def sessionPaths(df: DataFrame, userCol: String, tsCol: String,
                   idCol: String, typeCol: String,
                   maxGapSec: Long): DataFrame =
    sessionize(df, userCol, tsCol, idCol, maxGapSec)
      .groupBy(col(userCol), col("session_idx"))
      .agg(concat_ws("->",
        transform(
          array_sort(collect_list(struct(
            unix_micros(col(tsCol)).as("us"),
            col(idCol).as("id"),
            col(typeCol).as("et")))),
          x => x("et"))).as("path"))

  def topPaths(df: DataFrame, userCol: String, tsCol: String,
               idCol: String, typeCol: String, maxGapSec: Long,
               k: Int): DataFrame =
    sessionPaths(df, userCol, tsCol, idCol, typeCol, maxGapSec)
      .groupBy("path")
      .agg(count(lit(1L)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)

  /** Weekly retention cohorts: a user's cohort is the epoch week of
    * their first event; cell (cohort_wk, offset_wk) counts the
    * cohort's distinct users active that many weeks later (offset 0
    * row = cohort size, so the retention rate is a self-join away).
    *
    * Scale: first-event week is a map-side-combined min-agg on the
    * user key, the activity join is co-partitioned on that same key,
    * and the cell rollup is a count-distinct whose expansion is
    * bounded by (user, week) pairs — already collapsed by the
    * distinct before the final shuffle. */
  def retention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val wk = floor(unix_micros(col(tsCol)) / lit(604800000000L)).cast("long")
    val base = df.select(col(userCol), wk.as("__wk")).distinct()
    val first = base.groupBy(userCol).agg(min(col("__wk")).as("cohort_wk"))
    base.join(first, userCol)
      .groupBy(col("cohort_wk"),
        (col("__wk") - col("cohort_wk")).as("offset_wk"))
      .agg(count(lit(1L)).as("n_active"))
  }

  /** Ordered funnel over an event stream: for stages [s₁..s_k], the
    * earliest completion time of each stage per user, where stage i's
    * event must be STRICTLY after stage i−1's completion. Greedy
    * earliest-completion is optimal (taking the earliest valid event
    * for a stage never hurts later stages), so `stages_completed` is
    * the true furthest stage reached. Emits one row per stage-1
    * entrant: t_1..t_k as epoch micros (0 = stage not reached, so
    * every column stays a non-null long) and `stages_completed`.
    *
    * Scale: one filtered min-aggregation per stage joined back on the
    * user key — k small and fixed, every shuffle on the same key (the
    * per-stage filter prunes the event scan before any shuffle; no
    * per-user event buffering anywhere, unlike collect-and-scan
    * funnel UDFs). */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val base = df.select(col(userCol), col(typeCol).as("__et"),
      unix_micros(col(tsCol)).as("__us"))
    var acc = base.filter(col("__et") === stages.head)
      .groupBy(userCol).agg(min(col("__us")).as("t_1"))
    for (i <- 2 to stages.length) {
      val next = base.filter(col("__et") === stages(i - 1))
        .join(acc.select(col(userCol), col(s"t_${i - 1}")), Seq(userCol))
        .filter(col("__us") > col(s"t_${i - 1}"))
        .groupBy(userCol).agg(min(col("__us")).as(s"t_$i"))
      acc = acc.join(next, Seq(userCol), "left")
    }
    val reached = stages.indices.drop(1)
      .map(i => when(col(s"t_${i + 1}").isNotNull, 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    acc.select(
      col(userCol) +:
        stages.indices.map(i => coalesce(col(s"t_${i + 1}"), lit(0L)).as(s"t_${i + 1}")) :+
        reached.as("stages_completed"): _*)
  }

  /** Time-series subsequence search: for every length-m window ending
    * at each event (per key, (ts, id) order), the z-normalized
    * Euclidean distance to a query pattern; returns the k closest
    * windows corpus-wide (deterministic (dist, key, id) tie-break).
    * Constant windows (σ = 0) carry no shape and are excluded.
    *
    * Scale: the sliding window is a ROWS frame of exactly m values —
    * O(m) state per row, never a per-key collect; the z-normalized
    * pattern is a broadcast literal; distance is a sequential
    * zip-fold (engine-mirrorable); the final top-k is a TakeOrdered,
    * not a global sort. */
  def patternSearch(df: DataFrame, keys: Seq[String], tsCol: String,
                    idCol: String, valueCol: String,
                    pattern: Seq[Double], k: Int): DataFrame = {
    val m = pattern.length
    require(m >= 2, "pattern needs at least 2 points")
    val qMean = pattern.sum / m
    val qStd = math.sqrt(pattern.map(x => (x - qMean) * (x - qMean)).sum / m)
    require(qStd > 0, "constant pattern has no shape")
    val qz = pattern.map(x => (x - qMean) / qStd)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(m - 1), Window.currentRow)
    val withWin = df
      .withColumn("__win", collect_list(col(valueCol).cast("double")).over(w))
      .filter(size(col("__win")) === m)
      .withColumn("__mu",
        aggregate(col("__win"), lit(0.0), (a, x) => a + x) / lit(m.toDouble))
      .withColumn("__var",
        aggregate(col("__win"), lit(0.0),
          (a, x) => a + (x - col("__mu")) * (x - col("__mu"))) / lit(m.toDouble))
      .filter(col("__var") > 0.0)
      .withColumn("__sd", sqrt(col("__var")))
    val qLit = array(qz.map(lit(_)): _*)
    val dist = sqrt(aggregate(
      zip_with(col("__win"), qLit, (x, q) => {
        val d = (x - col("__mu")) / col("__sd") - q
        d * d
      }),
      lit(0.0), (a, x) => a + x))
    withWin
      .select(keys.map(col) :+ col(idCol) :+
        Exact.roundAt(dist, 4).as("dist"): _*)
      .orderBy(col("dist") +: keys.map(col) :+ col(idCol): _*)
      .limit(k)
  }

  /** Data-quality validation (Deequ-style, single pass): evaluate
    * every (name, predicate) rule as a conditional count in ONE
    * map-side-combined aggregation over one scan — k rules cost one
    * pass at any scale — then project the per-rule rows (name, rows
    * checked, violations, violation rate) as a literal-struct explode
    * (the [[corrMatrix]] shape). NULL predicate results count as
    * violations: an unknown is not a pass. */
  def qualityChecks(df: DataFrame,
                    rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1L)).as("__n") +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v_$i")
      }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val cells = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(
        lit(name).as("rule"),
        col("__n").as("n_rows"),
        col(s"__v_$i").as("n_violations"),
        Exact.roundAt(
          col(s"__v_$i").cast("double") / col("__n").cast("double"), 4)
          .as("violation_rate"))
    }
    stats.select(explode(array(cells: _*)).as("c")).select(col("c.*"))
  }

  /** Point-in-interval (range) join WITHOUT a nested loop. Spark
    * plans a bare `p BETWEEN lo AND hi` join condition as
    * BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons,
    * dead at scale. This rewrites it as an EQUI-join on a bin key:
    * each interval is exploded to the `binWidth`-sized bins it
    * covers, each point maps to its single bin, the hash join matches
    * on the bin, and the original predicate runs as a residual
    * filter. Every qualifying (point, interval) pair matches in
    * exactly ONE bin — the point's — so the output needs no dedup.
    *
    * `pointCol` (in `points`) and `loCol`/`hiCol` (in `intervals`)
    * must be numeric longs (dates → `unix_date`, timestamps → epoch
    * units) with `hi >= lo`; negative-width intervals match nothing
    * and are dropped before the explode. Pick `binWidth` near the
    * typical interval width: explode factor is ~width/binWidth + 1
    * rows per interval, and a too-small `binWidth` multiplies the
    * shuffle. Both sides shuffle (or broadcast) on the bin key;
    * hot bins are AQE-skew-splittable because the join is a plain
    * hash join after the rewrite. */
  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                binWidth: Long, maxBinsPerInterval: Long = 10000): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val loBin = floor(col(loCol) / binWidth)
    val hiBin = floor(col(hiCol) / binWidth)
    val binned = intervals
      .filter(col(hiCol) >= col(loCol))
      // a pathologically wide interval must fail loud, not OOM the
      // executor materializing its bin sequence — raise binWidth
      .withColumn("__bin", explode(
        when(hiBin - loBin >= maxBinsPerInterval,
          raise_error(concat(lit(s"rangeJoin: interval spans >= " +
            s"$maxBinsPerInterval bins at binWidth=$binWidth; " +
            "raise binWidth or maxBinsPerInterval (lo="),
            col(loCol), lit(", hi="), col(hiCol), lit(")"))))
          .otherwise(sequence(loBin, hiBin))))
    points
      .withColumn("__bin", floor(col(pointCol) / binWidth))
      .join(binned, "__bin")
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__bin")
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): merge any number
    * of RANKED result lists into one, scoring each id by
    * Σ_legs 1/(rrfK + rank) — the standard hybrid-retrieval combiner
    * (rank-based, so a BM25 leg and a cosine leg fuse without score
    * calibration). Each leg carries `(idCol, rank)` with rank
    * 1-based; an id absent from a leg simply contributes nothing.
    * Emits the top-`k` as `(idCol, rrf, n_legs)` by (rrf desc, id
    * asc) — a TakeOrdered heap, never a global sort.
    *
    * Exactness: each contribution is rounded at 9 decimals and the
    * sum is an exact decimal fold, so the fused score is independent
    * of leg order and partitioning and bit-reproducible by a SQL
    * oracle running the same formula text. Scale: legs are
    * k-bounded by construction (they come out of top-k serves), so
    * the union is metadata-sized however large the corpus. */
  def rrfFuse(legs: Seq[DataFrame], idCol: String, k: Int,
              rrfK: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranked leg")
    require(k > 0, s"k must be positive: $k")
    require(rrfK > 0, s"rrfK must be positive: $rrfK")
    import graft.functions.Exact
    // ranks are 1-based by contract; a 0/negative/null rank would
    // silently inflate the fused score (and rank = -rrfK divides by
    // zero), so the violation fails loudly inside the scan instead
    val u = legs.map(_.select(col(idCol),
      when(col("rank").isNull || col("rank") < 1,
        raise_error(concat(lit("rrfFuse: leg carries rank "),
          coalesce(col("rank").cast("string"), lit("NULL")),
          lit(" — ranks are 1-based; fix the leg's ranking"))))
        .otherwise(col("rank").cast("double")).as("__r")))
      .reduce(_ unionByName _)
    u.groupBy(col(idCol))
      .agg(Exact.sumExact(
          Exact.roundAt(lit(1.0) / (lit(rrfK.toDouble) + col("__r")), 9),
          9).as("rrf"),
        count(lit(1L)).as("n_legs"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
  }
}
