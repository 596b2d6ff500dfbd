package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exact

/** Distributed ordinary-least-squares regression — the reference
  * notebook's final step (price_prediction.ipynb "Model training":
  * an sklearn LinearRegression over the merged feature matrix),
  * re-expressed in-engine so the whole workflow — ingest → merge →
  * ffill → fit → evaluate — runs as Spark plans with no
  * driver-side learning library.
  *
  * Shape: OLS over k predictors + intercept needs only the
  * normal-equation moments (n, Σy, Σxᵢ, Σxᵢxⱼ, Σxᵢy) — k(k+3)/2 + 3
  * exact sums computed in ONE map-side-combined aggregation pass over
  * the data (the same discipline as [[Relational.corrMatrixBy]]), after
  * which the solve touches no data:
  *
  *  - `olsFitBy` solves IN THE PLAN via Cramer's rule for k ≤ 3:
  *    the determinant expansions are generated ONCE as SQL strings
  *    ([[detSql]]) and evaluated by Spark (`expr`) and by the DuckDB
  *    oracle from the SAME text, so both engines walk an identical
  *    IEEE expression tree over identical 128-bit-exact sums —
  *    bit-identical coefficients, a fully driver-free fit. Grouped:
  *    one model per key combination (the notebook's per-DK-area
  *    models), a million models costing one aggregation + projection.
  *  - `olsSolve` handles arbitrary k: the one moments row (bounded
  *    driver metadata, like the IVF centroids) feeds Gaussian
  *    elimination with partial pivoting on the driver; singular
  *    systems fail loudly naming the collinear predictors.
  *
  * Scale: the data pass is one aggregation whose buffer is O(k²) —
  * independent of row count; a 10⁹-row partition ships one buffer.
  * Prediction ([[predictionSql]]) is a shuffle-free projection;
  * evaluation ([[evalAggs]]) is one further aggregation pass.
  *
  * Reference: price_prediction.ipynb model-training cells (sklearn
  * LinearRegression fit on the DK-area feature frame, R² scoring).
  */
object Regression {

  /** Moment-column aliases shared by the Spark aggregation and the
    * oracle CTE: `__n`, `__sy`, `__s{i}`, `__p{i}_{j}` (i≤j),
    * `__q{i}`. */
  def termNames(xCols: Seq[String]): Seq[String] = "intercept" +: xCols

  /** Complete-case predicate shared by every fit/score path: a NULL
    * label, feature, or weight would otherwise let `__n` count a row
    * whose NULL-propagating sums skipped it, silently biasing every
    * coefficient and metric (the exact hazard [[logisticFit]] already
    * filters against). Spark column + oracle text twins. */
  def completeCase(yCol: String, xCols: Seq[String],
                   weight: Option[(String, Int)] = None): Column =
    (yCol +: xCols) ++ weight.map(_._1) match {
      case cs => cs.map(col(_).isNotNull).reduce(_ && _)
    }

  /** [[completeCase]] as ANSI SQL for the oracle CTEs. */
  def completeCaseSql(yCol: String, xCols: Seq[String],
                      weight: Option[(String, Int)] = None): String =
    ((yCol +: xCols) ++ weight.map(_._1))
      .map(c => s"$c IS NOT NULL").mkString(" AND ")

  /** The one-pass moment aggregation (Spark side). `yScale`/`xScale`
    * are the input columns' decimal scales (exact-sum contract).
    * With `weight = Some((wCol, wScale))` every sum is importance-
    * weighted — the WLS normal equations X'WX β = X'Wy use exactly
    * the same Cramer text, with `__n` = Σw and every moment carrying
    * the per-row weight factor (still exact: w is a fixed-decimal
    * column, so the products stay decimal-summable). */
  def momentAggs(yCol: String, xCols: Seq[String],
                 yScale: Int = 2, xScale: Int = 2,
                 weight: Option[(String, Int)] = None): Seq[Column] = {
    val y = col(yCol)
    val (w, ws) = weight match {
      case Some((c, sc)) => (col(c), sc)
      case None => (lit(1.0), 0)
    }
    val base = Seq(
      (weight match {
        case Some((c, sc)) => Exact.sumExact(col(c), sc)
        case None => count(lit(1L)).cast("double")
      }).as("__n"),
      Exact.sumExact(w * y, ws + yScale).as("__sy"))
    val sums = xCols.zipWithIndex.map { case (c, i) =>
      Exact.sumExact(w * col(c), ws + xScale).as(s"__s$i") }
    val prods = for { i <- xCols.indices; j <- i until xCols.length }
      yield Exact.sumExact(w * col(xCols(i)) * col(xCols(j)),
        ws + 2 * xScale).as(s"__p${i}_$j")
    val xy = xCols.zipWithIndex.map { case (c, i) =>
      Exact.sumExact(w * col(c) * y, ws + xScale + yScale).as(s"__q$i") }
    base ++ sums ++ prods ++ xy
  }

  /** The same moments as a DuckDB select list (decimal-sum formula —
    * the proven bit-equal twin of [[Exact.sumExact]]). */
  def momentSqlSelect(yCol: String, xCols: Seq[String],
                      yScale: Int = 2, xScale: Int = 2,
                      weight: Option[(String, Int)] = None): String = {
    def s(x: String, sc: Int) = Exact.sumExactSql(x, sc)
    val (wp, ws) = weight match {
      case Some((c, sc)) => (s"$c * ", sc)
      case None => ("", 0)
    }
    val base = Seq(
      (weight match {
        case Some((c, sc)) => s"${s(c, sc)} AS __n"
        case None => "CAST(count(*) AS DOUBLE) AS __n"
      }),
      s"${s(s"$wp$yCol", ws + yScale)} AS __sy")
    val sums = xCols.zipWithIndex.map { case (c, i) =>
      s"${s(s"$wp$c", ws + xScale)} AS __s$i" }
    val prods = for { i <- xCols.indices; j <- i until xCols.length }
      yield s"${s(s"$wp${xCols(i)} * ${xCols(j)}", ws + 2 * xScale)} AS __p${i}_$j"
    val xy = xCols.zipWithIndex.map { case (c, i) =>
      s"${s(s"$wp$c * $yCol", ws + xScale + yScale)} AS __q$i" }
    (base ++ sums ++ prods ++ xy).mkString(",\n       ")
  }

  /** Cofactor expansion along the first row, fixed order and explicit
    * parentheses — the ONE determinant text both engines evaluate.
    * 4×4 (k=3) expands to 24 products; larger systems go through
    * [[olsSolve]]. */
  private[graft] def detSql(m: Vector[Vector[String]]): String = m.size match {
    case 1 => m(0)(0)
    case n =>
      val terms = (0 until n).map { j =>
        val minor = m.tail.map(row => row.patch(j, Nil, 1))
        s"(${m(0)(j)} * ${detSql(minor)})"
      }
      terms.tail.zipWithIndex.foldLeft(s"(${terms.head}") {
        case (acc, (t, idx)) =>
          acc + (if (idx % 2 == 0) s" - $t" else s" + $t")
      } + ")"
  }

  /** The normal-equation matrix / RHS in moment-alias text:
    * A(0,0)=n, A(0,j)=Σxⱼ, A(i,j)=Σxᵢxⱼ; b(0)=Σy, b(i)=Σxᵢy.
    * `ridge` > 0 adds λ to the predictor diagonal (never the
    * intercept cell) — Tikhonov regularization on the same moments. */
  private def normalMatrix(k: Int, ridge: Double = 0.0)
      : (Vector[Vector[String]], Vector[String]) = {
    def p(i: Int, j: Int) = s"__p${math.min(i, j)}_${math.max(i, j)}"
    val a = Vector.tabulate(k + 1, k + 1) { (i, j) =>
      (i, j) match {
        case (0, 0) => "__n"
        case (0, c) => s"__s${c - 1}"
        case (r, 0) => s"__s${r - 1}"
        case (r, c) if r == c && ridge != 0.0 =>
          s"(${p(r - 1, c - 1)} + CAST($ridge AS DOUBLE))"
        case (r, c) => p(r - 1, c - 1)
      }
    }
    val b = Vector.tabulate(k + 1)(i => if (i == 0) "__sy" else s"__q${i - 1}")
    (a, b)
  }

  /** Unrounded Cramer coefficient expressions β₀..βₖ over the moment
    * aliases — identical text for Spark `expr` and the oracle. */
  def cramerBetaSqls(k: Int, ridge: Double = 0.0): Seq[String] = {
    require(k >= 1 && k <= 3,
      s"cramer path supports 1..3 predictors (got $k); use olsSolve for larger systems")
    require(ridge >= 0.0, s"ridge must be >= 0 (got $ridge)")
    val (a, b) = normalMatrix(k, ridge)
    val den = detSql(a)
    (0 to k).map { i =>
      val ai = a.map(_.toVector).zipWithIndex.map { case (row, r) =>
        row.updated(i, b(r)) }
      s"(${detSql(ai)} / $den)"
    }
  }

  /** Engine-portable round-half-up ([[Exact.roundAtSql]]). */
  def roundSql(x: String, scale: Int): String = Exact.roundAtSql(x, scale)

  /** Per-group OLS fit, solved in the plan (k ≤ 3 predictors):
    * `(keys…, term, beta)` with `term` ∈ intercept +: xCols, beta
    * rounded at `betaScale`. One aggregation pass + one projection —
    * no driver participation, any number of groups. */
  def olsFitBy(df: DataFrame, keys: Seq[String], yCol: String,
               xCols: Seq[String], yScale: Int = 2, xScale: Int = 2,
               betaScale: Int = 6, ridge: Double = 0.0,
               weight: Option[(String, Int)] = None): DataFrame = {
    val stats = momentsBy(df, keys, yCol, xCols, yScale, xScale, weight)
    val betas = cramerBetaSqls(xCols.length, ridge)
    val terms = termNames(xCols)
    val cells = terms.zip(betas).map { case (t, b) =>
      struct(lit(t).as("term"),
        expr(roundSql(b, betaScale)).as("beta")) }
    stats.select((keys.map(col) :+ explode(array(cells: _*)).as("cell")): _*)
      .select((keys.map(col) ++ Seq(col("cell.term"), col("cell.beta"))): _*)
  }

  /** Ungrouped [[olsFitBy]]. */
  def olsFit(df: DataFrame, yCol: String, xCols: Seq[String],
             yScale: Int = 2, xScale: Int = 2, betaScale: Int = 6): DataFrame =
    olsFitBy(df, Nil, yCol, xCols, yScale, xScale, betaScale)

  /** The grouped moments frame (one row per group). Complete cases
    * only ([[completeCase]]) — mirrored in every oracle CTE via
    * [[completeCaseSql]]. */
  def momentsBy(df: DataFrame, keys: Seq[String], yCol: String,
                xCols: Seq[String], yScale: Int = 2,
                xScale: Int = 2,
                weight: Option[(String, Int)] = None): DataFrame = {
    val aggs = momentAggs(yCol, xCols, yScale, xScale, weight)
    df.filter(completeCase(yCol, xCols, weight))
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** General-k fit: moments → driver-side Gaussian elimination with
    * partial pivoting (the moments row is bounded metadata — k(k+3)/2+3
    * doubles — the same driver budget as the IVF centroids). Returns
    * (term, beta) unrounded. Singular/collinear systems fail loudly. */
  def olsSolve(df: DataFrame, yCol: String, xCols: Seq[String],
               yScale: Int = 2, xScale: Int = 2): Seq[(String, Double)] = {
    val row = momentsBy(df, Nil, yCol, xCols, yScale, xScale).head()
    def d(name: String) = row.getDouble(row.fieldIndex(name))
    val k = xCols.length
    val (aN, bN) = normalMatrix(k)
    val a = Array.tabulate(k + 1, k + 1)((i, j) => d(aN(i)(j)))
    val b = Array.tabulate(k + 1)(i => d(bN(i)))
    termNames(xCols).zip(gaussSolve(a, b,
      s"singular normal equations: predictors ${xCols.mkString(", ")} " +
        "are collinear (or a column is constant alongside the intercept)")
      .toSeq)
  }

  /** Gaussian elimination with partial pivoting on a small dense
    * system — shared by the linear and logistic driver solves.
    * Mutates its arguments. */
  private def gaussSolve(a: Array[Array[Double]], b: Array[Double],
                         singularMsg: String): Array[Double] = {
    val k = b.length - 1
    for (c <- 0 to k) {
      val piv = (c to k).maxBy(r => math.abs(a(r)(c)))
      require(math.abs(a(piv)(c)) > 1e-12 * (1.0 + math.abs(a(0)(0))),
        singularMsg)
      if (piv != c) { val t = a(piv); a(piv) = a(c); a(c) = t
        val tb = b(piv); b(piv) = b(c); b(c) = tb }
      for (r <- c + 1 to k) {
        val f = a(r)(c) / a(c)(c)
        for (j <- c to k) a(r)(j) -= f * a(c)(j)
        b(r) -= f * b(c)
      }
    }
    val beta = new Array[Double](k + 1)
    for (c <- k to 0 by -1) {
      var s = b(c)
      for (j <- c + 1 to k) s -= a(c)(j) * beta(j)
      beta(c) = s / a(c)(c)
    }
    beta
  }

  /** The prediction expression `(β₀ + (x₁·β₁) + … )` as shared text;
    * `betaRefs` are the beta column names/expressions in term order
    * (intercept first). */
  def predictionSql(xCols: Seq[String], betaRefs: Seq[String]): String =
    xCols.zip(betaRefs.tail)
      .foldLeft(s"(${betaRefs.head}")((acc, xb) =>
        acc + s" + (${xb._1} * ${xb._2})") + ")"

  /** Shuffle-free ŷ projection from literal (driver-solved or stored)
    * coefficients. Built with Column arithmetic and `lit(beta)` (like
    * [[predictProba]]) so non-finite coefficients stay representable —
    * interpolating a NaN/Infinity double into SQL text would fail
    * `expr()` parsing; [[predictionSql]] remains the oracle-text twin. */
  def predict(df: DataFrame, betas: Seq[(String, Double)], xCols: Seq[String],
              yhatCol: String = "yhat", predScale: Int = 4): DataFrame = {
    val m = betas.toMap
    val yhat = (lit(m("intercept")) +:
      xCols.map(c => col(c) * lit(m(c)))).reduce(_ + _)
    df.withColumn(yhatCol, Exact.roundAt(yhat, predScale))
  }

  /** In-plan fit + predict + evaluate: one moments pass → betas
    * broadcast-cross-joined back → ŷ projection (rounded at
    * `predScale` so residuals are exact decimals) → one metrics pass:
    * `(n, rmse, mae, r2)`. Everything mirrors [[evalSql]] text-for-text
    * so the oracle reproduces each metric bit-for-bit. */
  def fitEval(df: DataFrame, yCol: String, xCols: Seq[String],
              yScale: Int = 2, xScale: Int = 2, predScale: Int = 4,
              metricScale: Int = 6): DataFrame =
    fitEvalOn(df, df, yCol, xCols, yScale, xScale, predScale, metricScale)

  /** [[fitEval]] with separate fit and scoring frames: coefficients
    * from `train`, metrics over `test` — the honest generalization
    * measure (R² on `test` uses `test`'s own total variance and can go
    * negative when the model is worse than the test mean, as it
    * should). */
  def fitEvalOn(train: DataFrame, test: DataFrame, yCol: String,
                xCols: Seq[String], yScale: Int = 2, xScale: Int = 2,
                predScale: Int = 4, metricScale: Int = 6): DataFrame = {
    val wide = betasWide(train, Nil, yCol, xCols, yScale, xScale)
    val scored = test.filter(completeCase(yCol, xCols))
      .crossJoin(broadcast(wide))
      .withColumn("__yhat", yhatExpr(xCols, predScale))
    val aggs = metricAggs(yCol, yScale, predScale, metricScale)
    scored.agg(aggs.head, aggs.tail: _*)
  }

  /** PER-GROUP fit + evaluate: one model AND one metric row per key
    * combination — the notebook's per-DK-area R² table in one plan
    * (grouped moments → per-group betas broadcast back on the keys →
    * grouped metrics pass; the join is a broadcast NULL-SAFE
    * equi-join (`<=>`), one row per group on the build side, so a
    * NULL-key group gets the same metric row `momentsBy` fits a
    * model for — consistent grouped output). */
  def fitEvalBy(df: DataFrame, keys: Seq[String], yCol: String,
                xCols: Seq[String], yScale: Int = 2, xScale: Int = 2,
                predScale: Int = 4, metricScale: Int = 6): DataFrame = {
    require(keys.nonEmpty, "use fitEval for the ungrouped case")
    val wide = betasWide(df, keys, yCol, xCols, yScale, xScale)
    val l = df.filter(completeCase(yCol, xCols)).alias("__l")
    val r = broadcast(wide).alias("__r")
    val cond = keys.map(k => col(s"__l.$k") <=> col(s"__r.$k")).reduce(_ && _)
    val scored = l.join(r, cond)
      .select(keys.map(k => col(s"__l.$k").as(k)) ++
        (yCol +: xCols).map(c => col(s"__l.$c")) ++
        (0 to xCols.length).map(i => col(s"__r.__b$i")): _*)
      .withColumn("__yhat", yhatExpr(xCols, predScale))
    val aggs = metricAggs(yCol, yScale, predScale, metricScale)
    scored.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group unrounded beta columns `__b0..__bk` (+ the keys). */
  private def betasWide(df: DataFrame, keys: Seq[String], yCol: String,
                        xCols: Seq[String], yScale: Int,
                        xScale: Int): DataFrame = {
    val stats = momentsBy(df, keys, yCol, xCols, yScale, xScale)
    val betaCols = cramerBetaSqls(xCols.length).zipWithIndex.map {
      case (b, i) => expr(b).as(s"__b$i") }
    stats.select(keys.map(col) ++ betaCols: _*)
  }

  private def yhatExpr(xCols: Seq[String], predScale: Int): Column =
    expr(roundSql(
      predictionSql(xCols, (0 to xCols.length).map(i => s"__b$i")),
      predScale))

  /** The shared metrics aggregation list — mirrors [[evalSql]]
    * term-for-term. The residual y − ŷ is exact at
    * max(yScale, predScale), so the |e| sum carries that scale and
    * the e² sum twice it — the exactness contract holds for any
    * scale combination, not just the defaults. */
  private def metricAggs(yCol: String, yScale: Int, predScale: Int,
                         metricScale: Int): Seq[Column] = {
    val y = col(yCol); val e = y - col("__yhat")
    val resScale = math.max(yScale, predScale)
    val n = count(lit(1L)).cast("double")
    val ssRes = Exact.sumExact(e * e, 2 * resScale)
    val ssTot = Exact.sumExact(y * y, 2 * yScale) -
      Exact.sumExact(y, yScale) * Exact.sumExact(y, yScale) / n
    Seq(
      n.as("n"),
      Exact.roundAt(sqrt(ssRes / n), metricScale).as("rmse"),
      Exact.roundAt(Exact.sumExact(abs(e), resScale) / n, metricScale).as("mae"),
      Exact.roundAt(lit(1.0) - ssRes / ssTot, metricScale).as("r2"))
  }

  /** Fit on a deterministic hash-train split, score on the held-out
    * rest — [[fitEvalOn]] over the [[Corpus.hashSplit]] assignment
    * (portableMix(id) % 100 < trainPct), so the split is reproducible
    * across engines, runs, and partitionings and the whole
    * train/evaluate loop stays one oracled plan. */
  def fitEvalHoldout(df: DataFrame, idCol: String, yCol: String,
                     xCols: Seq[String], trainPct: Int = 80,
                     yScale: Int = 2, xScale: Int = 2, predScale: Int = 4,
                     metricScale: Int = 6): DataFrame = {
    val bucket = graft.functions.Text.portableMix(col(idCol)) % 100
    fitEvalOn(df.filter(bucket < trainPct), df.filter(bucket >= trainPct),
      yCol, xCols, yScale, xScale, predScale, metricScale)
  }

  /** The [[fitEval]] metrics as DuckDB text over a `scored` relation
    * carrying `yCol` and `__yhat`. */
  def evalSql(yCol: String, yScale: Int, predScale: Int,
              metricScale: Int): String =
    evalSqlBy(Nil, yCol, yScale, predScale, metricScale)

  /** Grouped [[evalSql]] — one metric row per key combination
    * ([[fitEvalBy]]'s mirror; `scored` must also carry the keys). */
  def evalSqlBy(keys: Seq[String], yCol: String, yScale: Int,
                predScale: Int, metricScale: Int): String = {
    def s(x: String, sc: Int) = Exact.sumExactSql(x, sc)
    val resScale = math.max(yScale, predScale)
    val n = "CAST(count(*) AS DOUBLE)"
    val ssRes = s(s"($yCol - __yhat) * ($yCol - __yhat)", 2 * resScale)
    val ssTot =
      s"${s(s"$yCol * $yCol", 2 * yScale)} - ${s(yCol, yScale)} * ${s(yCol, yScale)} / $n"
    val keySel = keys.map(k => s"$k,\n       ").mkString
    val groupBy =
      if (keys.isEmpty) "" else s"\nGROUP BY ${keys.mkString(", ")}"
    s"""SELECT $keySel$n AS n,
       |       ${roundSql(s"sqrt($ssRes / $n)", metricScale)} AS rmse,
       |       ${roundSql(s"${s(s"abs($yCol - __yhat)", resScale)} / $n", metricScale)} AS mae,
       |       ${roundSql(s"1.0 - ($ssRes) / ($ssTot)", metricScale)} AS r2
       |FROM scored$groupBy""".stripMargin
  }

  /** LOGISTIC regression via iteratively-reweighted least squares —
    * the in-engine trainer for binary labels (the quality-classifier
    * step of a data pipeline: fit "keep / drop" on labeled docs, then
    * score the corpus with a pure projection).
    *
    * Each Newton/IRLS iteration is ONE distributed aggregation: the
    * current coefficients ride into the plan as literals, the row
    * projection computes p = σ(xᵀβ) and w = p(1−p) in codegen, and
    * the shuffle carries only the (k+1)(k+2)/2 + (k+1) weighted
    * moment sums (Σ w·xᵢ·xⱼ and the score Σ xᵢ(y−p)) — an O(k²)
    * buffer independent of rows, the [[momentAggs]] discipline with
    * weights. The (k+1)-dim Newton step solves on the driver
    * ([[gaussSolve]]); `ridge` adds λ to the predictor diagonal
    * (needed when classes separate perfectly, where unregularized
    * logistic diverges). Stops after `iters` or when the step's max
    * component falls below `tol`. Returns (term, beta) with the final
    * mean log-loss.
    *
    * Unlike the OLS path, sums are plain doubles (weights are
    * transcendental, so decimal exactness is unavailable) — verified
    * by spec (gradient ≈ 0 at the optimum, loss decreases, sign/value
    * recovery on planted data), not by the DuckDB hash oracle.
    *
    * Fits COMPLETE CASES only (rows with a NULL label or feature are
    * dropped up front), and persists the filtered frame internally —
    * each iteration rescans it, so an expensive upstream plan is paid
    * once, not iters times. The mean log-loss rides each Newton
    * aggregation, so a CONVERGED fit pays no separate loss scan: the
    * final sub-`tol` step is not applied, keeping the reported loss
    * exactly at the reported coefficients (only an iteration-capped,
    * unconverged fit pays one extra nll-only pass). */
  def logisticFit(df: DataFrame, yCol: String, xCols: Seq[String],
                  iters: Int = 12, ridge: Double = 0.0,
                  tol: Double = 1e-9): (Seq[(String, Double)], Double) = {
    val k = xCols.length
    // complete cases only — a NULL label or feature would otherwise
    // enter the Hessian (whose terms never touch y) while dropping
    // out of the NULL-propagating score sums, silently attenuating
    // every Newton step; and the mean loss must divide by the rows
    // it actually summed
    val data = df
      .filter((yCol +: xCols).map(col(_).isNotNull).reduce(_ && _))
      .persist() // each IRLS iteration + the loss pass rescans it
    try {
      var beta = new Array[Double](k + 1)
      val xs = lit(1.0) +: xCols.map(c => col(c).cast("double"))
      val y = col(yCol).cast("double")
      var it = 0
      var step = Double.MaxValue
      var loss = Double.NaN
      var lossAtBeta = false // does `loss` hold the mean nll at the CURRENT beta?
      while (it < iters && step > tol) {
        val z = xs.zip(beta).map { case (x, b) => x * lit(b) }.reduce(_ + _)
        val p = lit(1.0) / (lit(1.0) + exp(-z))
        val w = p * (lit(1.0) - p)
        val resid = y - p
        // log-loss via log1p(exp(·)) in its stable branch — the loss
        // moments RIDE the Newton aggregation (same scan), so a
        // converged fit never pays a separate full loss pass
        val nll = when(z >= 0, (lit(1.0) - y) * z + log1p(exp(-z)))
          .otherwise(-y * z + log1p(exp(z)))
        val hess = for { i <- 0 to k; j <- i to k }
          yield sum(w * xs(i) * xs(j)).as(s"h_${i}_$j")
        val score = (0 to k).map(i => sum(xs(i) * resid).as(s"g_$i"))
        val aggs = (hess ++ score) :+ (sum(nll) / count(lit(1L))).as("__nll")
        val row = data.agg(aggs.head, aggs.tail: _*).head()
        def d(name: String) = row.getDouble(row.fieldIndex(name))
        loss = d("__nll")
        val a = Array.tabulate(k + 1, k + 1) { (i, j) =>
          val (lo, hi) = (math.min(i, j), math.max(i, j))
          d(s"h_${lo}_$hi") + (if (i == j && i > 0) ridge else 0.0)
        }
        val g = Array.tabulate(k + 1)(i => d(s"g_$i") -
          (if (i > 0) ridge * beta(i) else 0.0))
        val delta = gaussSolve(a, g,
          s"singular IRLS Hessian: predictors ${xCols.mkString(", ")} are " +
            "collinear, or the classes separate perfectly (add ridge > 0)")
        step = delta.map(math.abs).max
        if (step > tol) {
          beta = beta.zip(delta).map { case (b, dd) => b + dd }
          lossAtBeta = false
        } else lossAtBeta = true // converged: the sub-tol step is noise;
        // NOT applying it keeps the reported loss exactly at the
        // reported coefficients with zero extra scans
        it += 1
      }
      if (!lossAtBeta) {
        // ran out of iterations mid-step: one nll-only pass at the
        // final coefficients (the only case that needs it)
        val z = xs.zip(beta).map { case (x, b) => x * lit(b) }.reduce(_ + _)
        val nll = when(z >= 0, (lit(1.0) - y) * z + log1p(exp(-z)))
          .otherwise(-y * z + log1p(exp(z)))
        loss = data.agg((sum(nll) / count(lit(1L))).as("loss"))
          .head().getDouble(0)
      }
      (termNames(xCols).zip(beta.toSeq), loss)
    } finally data.unpersist()
  }

  /** PER-GROUP logistic regression — the per-domain quality-classifier
    * shape (one "keep/drop" model per source domain): IRLS for every
    * key combination simultaneously, ONE distributed aggregation per
    * Newton iteration for ALL groups.
    *
    * Each iteration: the current per-group coefficients (bounded
    * driver metadata — `maxGroups` × (k+1) doubles) ride back in as a
    * broadcast table, NULL-SAFE-joined on the keys (a NULL-key group
    * trains like any other, the [[fitEvalBy]] convention); the row
    * projection computes p and w in codegen; one `groupBy(keys)`
    * aggregation ships every group's (k+1)(k+2)/2 + (k+1) weighted
    * moments — O(groups × k²) state, independent of rows — and the
    * driver takes one Newton step per group ([[gaussSolve]]; a
    * singular group fails loudly NAMING the group). Iterates until
    * every group's step falls below `tol` or `iters` is reached; a
    * converged group's step is ~0, so late groups cost nothing extra.
    *
    * Returns `(keys…, term, beta, loss)` — per-group coefficients
    * with the group's final mean log-loss on each term row. Complete
    * cases only, like [[logisticFit]]; doubles, so spec-verified
    * (planted per-group recovery), not hash-oracled. */
  def logisticFitBy(df: DataFrame, keys: Seq[String], yCol: String,
                    xCols: Seq[String], iters: Int = 12,
                    ridge: Double = 0.0, tol: Double = 1e-9,
                    maxGroups: Int = 10000): DataFrame = {
    require(keys.nonEmpty, "use logisticFit for the ungrouped case")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    val spark = df.sparkSession
    val k = xCols.length
    val data = df.filter(completeCase(yCol, xCols)).persist()
    try {
      val keySchema = StructType(keys.map(kc => data.schema(kc)))
      // collected key values become Scala map keys below — array/
      // binary/struct values compare by reference there, which would
      // make every betas(g) lookup miss. Fail loudly up front.
      keySchema.fields.foreach { f =>
        f.dataType match {
          case _: org.apache.spark.sql.types.ArrayType |
               _: org.apache.spark.sql.types.MapType |
               _: org.apache.spark.sql.types.StructType |
               org.apache.spark.sql.types.BinaryType =>
            throw new IllegalArgumentException(
              s"logisticFitBy group key '${f.name}' has type ${f.dataType.sql}: " +
                "array/map/struct/binary keys compare by reference on the " +
                "driver — project a scalar key (e.g. a hash or a string form) first")
          case _ =>
        }
      }
      val keyRows = data.select(keys.map(col): _*).distinct().collect()
      require(keyRows.length <= maxGroups,
        s"logisticFitBy solves one Newton system per group on the driver — " +
          s"${keyRows.length} groups exceed maxGroups=$maxGroups; coarsen the " +
          "keys or raise the cap deliberately")
      val groups = keyRows.map(_.toSeq)
      val betas = scala.collection.mutable.Map[Seq[Any], Array[Double]](
        groups.map(g => g -> new Array[Double](k + 1)): _*)
      val bSchema = StructType(keySchema.fields ++
        (0 to k).map(i => StructField(s"__b$i", DoubleType, nullable = false)))
      def joinedWithBetas(): DataFrame = {
        val bRows: java.util.List[Row] = java.util.Arrays.asList(
          groups.map(g => Row.fromSeq(g ++ betas(g).toSeq)): _*)
        val l = data.alias("__l")
        val r = broadcast(spark.createDataFrame(bRows, bSchema)).alias("__r")
        val cond = keys.map(kc =>
          col(s"__l.$kc") <=> col(s"__r.$kc")).reduce(_ && _)
        l.join(r, cond).select(
          keys.map(kc => col(s"__l.$kc").as(kc)) ++
            (yCol +: xCols).map(c => col(s"__l.$c")) ++
            (0 to k).map(i => col(s"__r.__b$i")): _*)
      }
      val xs = lit(1.0) +: xCols.map(c => col(c).cast("double"))
      val zExpr: Column =
        xs.zipWithIndex.map { case (x, i) => x * col(s"__b$i") }.reduce(_ + _)
      val yc = col(yCol).cast("double")
      def nllExpr(z: Column): Column =
        when(z >= 0, (lit(1.0) - yc) * z + log1p(exp(-z)))
          .otherwise(-yc * z + log1p(exp(z)))
      var it = 0
      var step = Double.MaxValue
      var lossMap = Map.empty[Seq[Any], Double]
      var lossAtBetas = false // is lossMap evaluated at the CURRENT betas?
      while (it < iters && step > tol) {
        val joined = joinedWithBetas()
        val z = zExpr
        val p = lit(1.0) / (lit(1.0) + exp(-z))
        val w = p * (lit(1.0) - p)
        val resid = yc - p
        val hess = for { i <- 0 to k; j <- i to k }
          yield sum(w * xs(i) * xs(j)).as(s"h_${i}_$j")
        val score = (0 to k).map(i => sum(xs(i) * resid).as(s"g_$i"))
        // per-group loss moments ride the same grouped aggregation —
        // a converged fit pays no separate loss scan
        val aggs = (hess ++ score) :+
          (sum(nllExpr(z)) / count(lit(1L))).as("__nll")
        val moments = joined.groupBy(keys.map(col): _*)
          .agg(aggs.head, aggs.tail: _*).collect()
        lossMap = moments.map(r => r.toSeq.take(keys.length) ->
          r.getDouble(r.fieldIndex("__nll"))).toMap
        val deltas = moments.map { row =>
          val g = row.toSeq.take(keys.length)
          def d(name: String) = row.getDouble(row.fieldIndex(name))
          val beta = betas(g)
          val a = Array.tabulate(k + 1, k + 1) { (i, j) =>
            val (lo, hi) = (math.min(i, j), math.max(i, j))
            d(s"h_${lo}_$hi") + (if (i == j && i > 0) ridge else 0.0)
          }
          val grad = Array.tabulate(k + 1)(i => d(s"g_$i") -
            (if (i > 0) ridge * beta(i) else 0.0))
          g -> gaussSolve(a, grad,
            s"singular IRLS Hessian in group (${g.mkString(", ")}): predictors " +
              s"${xCols.mkString(", ")} are collinear there, or that group's " +
              "classes separate perfectly (add ridge > 0)")
        }
        // no groups (all rows dropped by completeCase / empty input):
        // fall through to the empty result frame, like the pre-fold code
        step = if (deltas.isEmpty) 0.0
          else deltas.map(_._2.map(math.abs).max).max
        if (step > tol) {
          deltas.foreach { case (g, delta) =>
            betas(g) = betas(g).zip(delta).map { case (b, dd) => b + dd }
          }
          lossAtBetas = false
        } else lossAtBetas = true // converged: skip the sub-tol step so
        // the riding loss is exact at the returned coefficients
        it += 1
      }
      if (!lossAtBetas) {
        // iteration-capped mid-step: one grouped nll pass at the
        // final coefficients
        lossMap = joinedWithBetas().groupBy(keys.map(col): _*)
          .agg((sum(nllExpr(zExpr)) / count(lit(1L))).as("__loss")).collect()
          .map(r => r.toSeq.take(keys.length) -> r.getDouble(keys.length)).toMap
      }
      val outSchema = StructType(keySchema.fields ++ Seq(
        StructField("term", StringType, nullable = false),
        StructField("beta", DoubleType, nullable = false),
        StructField("loss", DoubleType, nullable = false)))
      val outRows: java.util.List[Row] = java.util.Arrays.asList(
        (for { g <- groups; (t, b) <- termNames(xCols).zip(betas(g).toSeq) }
          yield Row.fromSeq(g ++ Seq(t, b, lossMap(g)))): _*)
      spark.createDataFrame(outRows, outSchema)
    } finally data.unpersist()
  }

  /** σ(xᵀβ) scoring projection from literal coefficients —
    * shuffle-free, codegen. */
  def predictProba(df: DataFrame, betas: Seq[(String, Double)],
                   xCols: Seq[String], probCol: String = "p"): DataFrame = {
    val m = betas.toMap
    val z = (lit(1.0) * lit(m("intercept")) +:
      xCols.map(c => col(c).cast("double") * lit(m(c)))).reduce(_ + _)
    df.withColumn(probCol, lit(1.0) / (lit(1.0) + exp(-z)))
  }
}
