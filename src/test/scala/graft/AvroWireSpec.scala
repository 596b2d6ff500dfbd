package graft

import org.apache.spark.sql.functions._
import graft.sources.AvroWire
import graft.sources.AvroWire.WeatherReading

class AvroWireSpec extends SparkSpec {

  private val readings = Seq(
    WeatherReading("st1", "Copenhagen", "wind", 12.5, 1700000000000L),
    WeatherReading("st2", "Aarhus", "sunshine", 3.25, 1700000000500L),
    WeatherReading("st1", "Copenhagen", "wind", 13.0, 1700000001000L))

  test("byte-level frame/unframe roundtrip + header detection") {
    val body = Array[Byte](1, 2, 3, 4)
    val framed = AvroWire.frame(42, body)
    assert(framed.length == 9 && framed(0) == 0)
    assert(AvroWire.hasWireHeader(framed))
    assert(!AvroWire.hasWireHeader(body))
    val Some((id, b)) = AvroWire.unframe(framed)
    assert(id == 42 && b.sameElements(body))
    assert(AvroWire.unframe(Array[Byte](9, 9)).isEmpty)
  }

  test("distributed encode → wire columns → decode roundtrip") {
    val s = spark
    import s.implicits._
    val encoded = AvroWire.encodeWeather(readings.toDS, schemaId = 7)
    // column-level header parsing (the consumer's expression side)
    val ids = encoded.select(AvroWire.schemaIdCol(col("value"))).distinct().collect()
    assert(ids.map(_.getInt(0)).toSeq == Seq(7))
    val decoded = AvroWire.decodeWeather(encoded).collect().toSet
    assert(decoded == readings.toSet)
  }

  test("decode drops unframed garbage like the latency monitor") {
    val s = spark
    import s.implicits._
    val good = AvroWire.encodeWeather(readings.take(1).toDS, 7)
    val bad = Seq((Array[Byte](1), Array[Byte](99, 1, 2))).toDF("key", "value")
    val decoded = AvroWire.decodeWeather(good.unionByName(bad))
    assert(decoded.count() == 1)
  }
}
