package graft
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    li.printSchema()
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    println(li.filter(org.apache.spark.sql.functions.expr("l_shipdate <= TIMESTAMP_NTZ'2000-12-01 00:00:00'")).count())
    spark.stop()
  }
}
