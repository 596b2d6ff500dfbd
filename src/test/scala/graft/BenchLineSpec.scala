package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses the bench line out of a 2000-character tail of
  * the sbt output that ALSO contains sbt's `[success] Total time…`
  * trailer. These cases pin the whole-tail arithmetic so the line can
  * never again silently outgrow the window (rounds 1–6 all did). */
class BenchLineSpec extends AnyFunSuite {
  private val sbtTrailer =
    "\n[success] Total time: 1242 s (20:42), completed Aug 13, 2026, 11:59:59 PM\n"

  // names sized to the real inventory's average (stripped names avg
  // ~12 chars), times shaped like the real distribution (mostly
  // sub-second, a handful multi-second)
  private def fakeQueries(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q_fake_qry_nm$i%02d",
      if (i % 12 == 0) 1.0 + (i % 7) * 0.97 else 0.05 + (i % 10) * 0.093))

  test("95 synthetic queries + sbt trailer fit the 2000-char tail") {
    val line = BenchLine.compose(
      total = 123.45, reps = 3, streamRate = 43714.0, errs = "",
      queries = fakeQueries(95), sfName = "sf0.1")
    val tail = line + sbtTrailer
    assert(tail.getBytes("UTF-8").length <= 2000,
      s"tail is ${tail.length}B; line is ${line.length}B")
  }

  test("real inventory at pessimistic times fits with the trailer") {
    // every query pinned at a 3-char-integer time (worst realistic
    // rendering width with fmt2: "999.99" → 6 chars each)
    val names = SparkEntry.queries.keys.toSeq.sorted :+ "q_stream_pipeline"
    val line = BenchLine.compose(
      total = 9999.99, reps = 3, streamRate = 43714.0, errs = "",
      queries = names.map(_ -> 999.99), sfName = "sf0.1")
    assert((line + sbtTrailer).getBytes("UTF-8").length <= 2000,
      s"line is ${line.length}B for ${names.size} queries")
  }

  test("past the floor, the line keeps the most expensive queries and says what it dropped") {
    // 140 long-named queries at 4-char pessimistic times: no numeric
    // format fits the full map, so rung 5 must truncate BY COST with
    // an explicit marker, never overflow
    val many = (1 to 140).map(i => (f"q_very_long_query_name_$i%03d",
      if (i <= 5) 5000.0 + i else 999.99))
    val line = BenchLine.compose(99999.9, 3, 50000.0, "", many, "sf0.1")
    assert((line + sbtTrailer).getBytes("UTF-8").length <= 2000,
      s"rung-5 line is ${line.length}B")
    assert(line.contains("\"queries_omitted\":"))
    // the expensive outliers survive the cut
    (1 to 5).foreach(i => assert(
      line.contains(f"very_long_query_name_$i%03d"),
      s"hot query $i was dropped while cheap ones might remain"))
  }

  test("rung 5 still spends leftover budget on decimals for the hottest kept queries") {
    // a 106-query realistic inventory (the round-10 shape): the full
    // map overflows every uniform format, so rung 5 truncates — but
    // the hot lifecycle queries must keep a decimal, not print "11"
    val many = (1 to 106).map { i =>
      (f"q_realistic_name_$i%03d", if (i <= 8) 10.0 + i * 0.13 else 0.04) }
    val line = BenchLine.compose(116.2, 3, 50053.0, "", many, "sf0.1")
    assert((line + sbtTrailer).getBytes("UTF-8").length <= 2000)
    assert(line.contains("\"queries_omitted\":"))
    // hottest query prints with its decimal (10.13 -> "10.1")
    assert(line.contains("\"realistic_name_001\":10.1"), line.take(300))
  }

  test("line degrades precision rather than overflow") {
    // 98 realistic-length queries: 2-decimal rendering overflows the
    // budget, so the composer must fall back to a coarser format —
    // and the fallback must actually fit
    val many = fakeQueries(98)
    val line = BenchLine.compose(6.0, 3, 1000.0, "", many, "sf0.1")
    val two = many.map { case (k, v) =>
      "\"" + k.stripPrefix("q_") + "\":" + BenchLine.fmt2(v) }.mkString(",")
    assert(two.length > BenchLine.LineBudget - 120,
      "precondition: 2-decimal body should be near/over budget for this case")
    assert(line.getBytes("UTF-8").length <= BenchLine.LineBudget,
      s"composer emitted ${line.length}B, over the ${BenchLine.LineBudget}B budget")
  }

  test("line is valid JSON with expected fields and no sweep block") {
    val line = BenchLine.compose(46.6, 3, 43714.0, "", fakeQueries(10), "sf0.1")
    assert(line.startsWith("{\"metric\":\"total\",\"value\":46.6,"))
    assert(line.contains("\"stream_msgs_per_s\":43714.0"))
    assert(line.contains("\"queries\":{\"fake_qry_nm01\":"))
    assert(line.endsWith("\"sf\":\"sf0.1\"}"))
    assert(!line.contains("\"sweep\""), "sweep must stay out of the stdout line")
    // structural JSON sanity: balanced braces, no raw newline
    assert(line.count(_ == '{') === line.count(_ == '}'))
    assert(!line.contains('\n'))
  }

  test("errors fragment is kept when it fits, dropped at the floor") {
    val errs = ",\"errors\":{\"q_x\":\"SomeException: boom\"}"
    val small = BenchLine.compose(1.0, 3, 100.0, errs, fakeQueries(5), "sf0.1")
    assert(small.contains("\"errors\""))
    val huge = (1 to 200).map(i => (f"q_extremely_long_query_name_padding_$i%03d", 123.456))
    val floor = BenchLine.compose(1.0, 3, 100.0, errs, huge, "sf0.1")
    assert(!floor.contains("\"errors\"") || floor.getBytes("UTF-8").length <= BenchLine.LineBudget)
  }

  test("property: seeded random inventories up to 100 queries always fit") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 200).foreach { trial =>
      val n = 1 + rnd.nextInt(100)
      val qs = (1 to n).map { i =>
        val nameLen = 6 + rnd.nextInt(9) // 6..14 chars, the real spread
        val name = "q_" + rnd.alphanumeric.filter(_.isLetter)
          .take(nameLen).mkString.toLowerCase
        val t = rnd.nextInt(4) match {
          case 0 => rnd.nextDouble() * 0.5
          case 1 => rnd.nextDouble() * 2
          case 2 => rnd.nextDouble() * 10
          case _ => rnd.nextDouble() * 120
        }
        (name, t)
      }
      val errs = if (rnd.nextBoolean()) "" else
        ",\"errors\":{\"q_x\":\"SomeException: " + ("e" * rnd.nextInt(40)) + "\"}"
      val line = BenchLine.compose(rnd.nextDouble() * 1000, 3,
        rnd.nextDouble() * 99999, errs, qs, "sf0.1")
      assert((line + sbtTrailer).getBytes("UTF-8").length <= 2000,
        s"trial $trial: $n queries overflowed (${line.length}B)")
      assert(line.count(_ == '{') == line.count(_ == '}'), s"trial $trial: unbalanced")
    }
  }

  test("greedy rung keeps a decimal on the most expensive queries") {
    // a 95-query inventory whose 1-decimal rendering overflows the
    // budget (the round-9 regression shape): the composer must NOT
    // collapse the whole map to integers — the hot queries keep 1
    // decimal, only the cheapest tail goes coarse
    val many = (1 to 95).map(i =>
      (f"q_shape_name_$i%02d", 0.15 + (i % 50) * 0.27))
    def render(fmt: Double => String): Int =
      many.map { case (k, v) =>
        "\"" + k.stripPrefix("q_") + "\":" + fmt(v) }.mkString(",").length + 113
    assert(render(BenchLine.fmt1) > BenchLine.LineBudget,
      "precondition: all-1-decimal must overflow for this case")
    assert(render(BenchLine.fmt0) <= BenchLine.LineBudget,
      "precondition: whole-second base must fit for this case")
    val line = BenchLine.compose(93.4, 3, 44264.0, "", many, "sf0.1")
    assert((line + sbtTrailer).getBytes("UTF-8").length <= 2000)
    // every query still present
    many.foreach { case (k, _) => assert(line.contains("\"" + k.stripPrefix("q_") + "\":")) }
    // the most expensive queries carry a decimal point
    val hottest = many.sortBy(-_._2).take(10)
    hottest.foreach { case (k, v) =>
      assert(line.contains("\"" + k.stripPrefix("q_") + "\":" + BenchLine.fmt1(v)),
        s"hot query $k lost its decimal: wanted ${BenchLine.fmt1(v)}")
    }
  }

  test("the cal_ms window-health fragment survives every degradation rung") {
    val cal = ",\"cal_ms\":[312,318,45,44]"
    // rung 1 (small inventory, full precision)
    val small = BenchLine.compose(1.0, 3, 100.0, "", fakeQueries(5),
      "sf0.1", cal = cal)
    assert(small.contains("\"cal_ms\":[312,318,45,44]"))
    // rung 4/5 (inventory too big for any uniform format): the cal
    // block must still be on the line — a drifted window has to be
    // visible on the artifact the driver records, not only in the file
    val huge = (1 to 200).map(i =>
      (f"q_extremely_long_query_name_padding_$i%03d", 123.456))
    val floor = BenchLine.compose(1.0, 3, 100.0, "", huge, "sf0.1",
      cal = cal)
    assert(floor.contains("\"cal_ms\":[312,318,45,44]"),
      "cal block lost at the truncation rung")
    assert((floor + sbtTrailer).getBytes("UTF-8").length <= 2000)
    // real inventory at pessimistic times still fits WITH the block
    val names = SparkEntry.queries.keys.toSeq.sorted :+ "q_stream_pipeline"
    val real = BenchLine.compose(9999.99, 3, 43714.0, "",
      names.map(_ -> 999.99), "sf0.1", cal = cal)
    assert(real.contains("\"cal_ms\":") &&
      (real + sbtTrailer).getBytes("UTF-8").length <= 2000)
  }

  test("fmt rounding behaves at the boundaries") {
    assert(BenchLine.fmt2(0.5) === "0.5")
    assert(BenchLine.fmt2(1.0) === "1")
    assert(BenchLine.fmt2(0.375) === "0.38")
    assert(BenchLine.fmt1(0.37) === "0.4")
    assert(BenchLine.fmt1(6.04) === "6")
    assert(BenchLine.fmt1(0.04) === "0")
  }
}
