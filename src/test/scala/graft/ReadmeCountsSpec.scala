package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps README's inventory figures GENERATED-equivalent instead of
  * hand-maintained (a stale count shipped twice): the run-section
  * query count must equal the live `SparkEntry.queries` map. */
class ReadmeCountsSpec extends AnyFunSuite {
  test("README's query count matches SparkEntry.queries") {
    // resolve README.md from the repo root, not the JVM's working
    // directory: an IDE running this suite from a module dir would
    // otherwise fail with FileNotFoundException instead of a
    // stale-count message — walk up from user.dir to the build root
    // (marked by build.sbt) and assume-cancel if there isn't one
    val root = Iterator.iterate(
        new java.io.File(sys.props("user.dir")).getAbsoluteFile)(_.getParentFile)
      .takeWhile(_ != null)
      .find(d => new java.io.File(d, "build.sbt").isFile &&
        new java.io.File(d, "README.md").isFile)
    assume(root.isDefined,
      "no build root with a README.md above " + sys.props("user.dir"))
    val readme = {
      val src = scala.io.Source.fromFile(
        new java.io.File(root.get, "README.md"), "UTF-8")
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
