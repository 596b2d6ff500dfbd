package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (sbt forks one test
  * JVM; building a session per suite would dominate runtime). */
object TestSession {
  lazy val spark: SparkSession = GraftSession.local(4)
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = TestSession.spark
  def sf(name: String) = s"/root/testdata/$name"
}
