package graft

/** Plan audit: dumps `explain("formatted")` for selected queries so
  * scan pushdown (PushedFilters/ReadSchema), broadcast choices, and
  * WholeStageCodegen spans can be reviewed per round.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [queryName ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(4)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
