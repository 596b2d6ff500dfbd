package graft

import graft.sources.CsvSource
import java.nio.file.Files

class CsvSourceSpec extends SparkSpec {

  test("schema-bound CSV read types rows and quarantines corrupt lines") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "weather.csv")
    Files.writeString(f.toPath,
      """station_id,station_name,metric,value,observed
        |st1,Copenhagen,wind,12.5,2024-01-01 10:00:00
        |st2,Aarhus,sunshine,3.25,2024-01-01 10:05:00
        |st3,Odense,wind,not_a_number,2024-01-01 10:10:00
        |""".stripMargin)
    // caching is required to query the corrupt-record column by itself
    // (Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction)
    val df = CsvSource.readWeather(spark, f.getAbsolutePath).cache()
    assert(df.schema.fieldNames.contains("_corrupt"))
    val good = df.filter("_corrupt IS NULL").collect()
    assert(good.length == 2)
    assert(good.map(_.getAs[Double]("value")).sorted.sameElements(Array(3.25, 12.5)))
    assert(df.filter("_corrupt IS NOT NULL").count() == 1)
    // streaming variant builds on the same schema/options
    assert(CsvSource.streamWeather(spark, dir.getAbsolutePath).isStreaming)
  }

  test("schema-bound JSON-lines read types rows and quarantines bad lines") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "events.json")
    Files.writeString(f.toPath,
      """{"event_id": 1, "event_type": "click", "value": 2.5}
        |{"event_id": 2, "event_type": "view", "value": 0.5}
        |{"event_id": "oops", "event_type": 7, "value": []}
        |this is not json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val df = CsvSource.readJson(spark, f.getAbsolutePath, schema).cache()
    val good = df.filter("_corrupt IS NULL").collect()
    assert(good.length == 2)
    assert(good.map(_.getAs[Long]("event_id")).sorted.sameElements(Array(1L, 2L)))
    assert(df.filter("_corrupt IS NOT NULL").count() == 2)
    assert(CsvSource.streamJson(spark, dir.getAbsolutePath, schema).isStreaming)
  }
}
