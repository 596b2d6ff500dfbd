package graft

/** Composes the single compact JSON line `Bench.main` prints as its
  * last stdout line — separated from Bench so the byte-budget logic is
  * unit-testable without a SparkSession.
  *
  * The driver machine-reads this line out of a bounded 2000-character
  * tail of the sbt output. That tail also contains whatever sbt prints
  * AFTER the line — `[success] Total time: NNN s (MM:SS), completed
  * <date>` plus newlines, ~80 bytes — so the line itself must stay
  * within `LineBudget` = 2000 − `TrailerAllowance`. Rounds 1–6 all
  * produced `parsed: null` by overflowing this; round 6 missed by ~40
  * bytes because the sweep block pushed the line to 1960B.
  *
  * Budget strategy, applied in order until the line fits:
  *  1. 2-decimal times, trailing zeros stripped ("0.50"→"0.5").
  *  2. 1-decimal times (rounding error ≤ 0.05s — fine for a
  *     driver-side signal; BENCH_FULL.json keeps millisecond
  *     precision for every rep).
  *  3. Drop the errors map (errors still land in BENCH_FULL.json).
  *  4. GREEDY mixed precision: whole seconds for every query, then
  *     upgrade queries to 1 decimal MOST-EXPENSIVE-FIRST while the
  *     line still fits — the hot queries (the ones a reader of the
  *     line acts on) keep a decimal instead of the whole map going
  *     coarse at once. Round 9 hit the old all-or-nothing
  *     whole-second rung and 70 of 95 queries printed "0".
  *  5. Keep only the MOST EXPENSIVE queries that fit, with a
  *     `"queries_omitted":K` marker — the per-query names dominate
  *     the byte budget (~16B each vs ≤4B of time), so past ~115
  *     queries no numeric format can save the full map. The line's
  *     job is the headline total + the hot queries; BENCH_FULL.json
  *     always carries every rep of every query at full precision.
  * The sweep block never appears on the line at all.
  */
object BenchLine {
  /** Bytes reserved for sbt's success trailer inside the 2000-char
    * driver tail. Round 6 measured it: a 1960B line missed the tail
    * by ~40B, so the usable window is ≈1920B. Round 9's parsed tail
    * pinned the trailer exactly: `\n[success] Total time: 455 s
    * (07:35), completed Aug 14, 2026, 1:04:14 AM\n` = 74B. Reserve
    * 120 — 46B of slack for a longer duration/locale date — instead
    * of round 9's 200, which squeezed the 95-query map down to the
    * whole-second rung for no measured reason. */
  val TrailerAllowance = 120
  val LineBudget: Int = 2000 - TrailerAllowance

  private def r2(v: Double): Double = math.round(v * 100) / 100.0
  private def strip(s: String): String =
    if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
  /** 2-decimal rendering with trailing zeros (and a bare dot) stripped
    * — "0.50"→"0.5", "1.00"→"1". */
  def fmt2(v: Double): String = strip(f"${r2(v)}%.2f")
  /** 1-decimal fallback rendering — "0.37"→"0.4", "6.04"→"6". */
  def fmt1(v: Double): String = strip(f"${math.round(v * 10) / 10.0}%.1f")
  /** Whole-second floor rendering — "0.37"→"0", "6.04"→"6". */
  def fmt0(v: Double): String = math.round(v).toString

  /** Build the line, degrading precision until it fits `LineBudget`.
    * `errs` is either "" or a pre-rendered `,"errors":{…}` fragment;
    * `cal` likewise a pre-rendered `,"cal_ms":[…]` window-health
    * fragment (~30B) that every rung keeps — a drifted window must be
    * visible on the artifact the driver actually records. */
  def compose(total: Double, reps: Int, streamRate: Double, errs: String,
              queries: Seq[(String, Double)], sfName: String,
              cal: String = ""): String = {
    def render(fmt: Double => String, withErrs: Boolean): String = {
      val qs = queries.map { case (k, v) =>
        "\"" + k.stripPrefix("q_") + "\":" + fmt(v) }.mkString("{", ",", "}")
      val e = if (withErrs) errs else ""
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"stream_msgs_per_s":$streamRate$cal$e,"queries":$qs,"sf":"$sfName"}"""
    }
    def fits(s: String): Boolean = s.getBytes("UTF-8").length <= LineBudget
    // greedy mixed precision: from a whole-second base line, upgrade
    // the most expensive queries to 1 decimal while the remaining
    // byte budget allows. Query names are ASCII, so char count ==
    // byte count and the upgrade deltas are exact. Shared by rungs 4
    // and 5 so the two cannot drift.
    def greedyOneDec(qset: Seq[(String, Double)], baseLen: Int): Set[String] = {
      var budget = LineBudget - baseLen
      qset.sortBy { case (k, v) => (-v, k) }.iterator
        .flatMap { case (k, v) =>
          val delta = fmt1(v).length - fmt0(v).length
          if (delta <= budget) { budget -= delta; Some(k) } else None
        }.toSet
    }
    // rung 4: the full map at mixed precision
    def renderGreedy(): Option[String] = {
      val base = render(fmt0, withErrs = false)
      if (!fits(base)) return None
      val oneDec = greedyOneDec(queries, base.getBytes("UTF-8").length)
      val qs = queries.map { case (k, v) =>
        val f = if (oneDec(k)) fmt1(v) else fmt0(v)
        "\"" + k.stripPrefix("q_") + "\":" + f }.mkString("{", ",", "}")
      Some(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"stream_msgs_per_s":$streamRate$cal,"queries":$qs,"sf":"$sfName"}""")
    }
    val attempts = Iterator(
      render(fmt2, withErrs = true),
      render(fmt1, withErrs = true),
      render(fmt1, withErrs = false)).filter(fits) ++
      renderGreedy().iterator
    attempts.nextOption().getOrElse {
      // rung 5: the full map cannot fit in ANY numeric format — keep
      // the most expensive queries (the ones a reader of the line
      // acts on) and say how many were dropped; then spend whatever
      // budget remains upgrading the hottest kept queries to 1
      // decimal (the rung-4 trick applied to the kept set — without
      // it the one rung that actually fires at >~115 queries prints
      // every time as a whole second)
      val byCost = queries.sortBy { case (k, v) => (-v, k) }
      def renderTop(n: Int, oneDec: Set[String] = Set.empty): String = {
        val qs = byCost.take(n).map { case (k, v) =>
          val f = if (oneDec(k)) fmt1(v) else fmt0(v)
          "\"" + k.stripPrefix("q_") + "\":" + f }.mkString("{", ",", "}")
        s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"stream_msgs_per_s":$streamRate$cal,"queries_omitted":${queries.size - n},"queries":$qs,"sf":"$sfName"}"""
      }
      (queries.size to 0 by -1).iterator.find(n => fits(renderTop(n)))
        .map { n =>
          renderTop(n, greedyOneDec(byCost.take(n),
            renderTop(n).getBytes("UTF-8").length))
        }
        .getOrElse(renderTop(0))
    }
  }
}
