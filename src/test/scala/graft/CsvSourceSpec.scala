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
}
