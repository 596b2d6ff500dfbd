package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps README's inventory figures GENERATED-equivalent instead of
  * hand-maintained (a stale count shipped twice): the run-section
  * query count must equal the live `SparkEntry.queries` map. */
class ReadmeCountsSpec extends AnyFunSuite {
  test("README's query count matches SparkEntry.queries") {
    val readme = {
      val src = scala.io.Source.fromFile("README.md", "UTF-8")
      try src.mkString finally src.close()
    }
    val n = SparkEntry.queries.size
    assert(readme.contains(s"oracle dump ($n queries)"),
      s"README.md's run section is stale — SparkEntry.queries now " +
        s"holds $n entries; update the 'oracle dump (N queries)' line")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      "every oracleSql key needs a queries entry")
  }
}
