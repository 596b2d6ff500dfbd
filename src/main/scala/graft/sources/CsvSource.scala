package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema-bound CSV ingest — the reference producer's input side
  * (producer KafkaWeatherProducer.scala reads the DMI weather CSV
  * with an explicit column layout; the dmi scripts read the same
  * dumps for batch aggregation).
  *
  * Explicit schema (never inferSchema at scale: inference is an extra
  * full scan) + permissive mode with a corrupt-record column, so bad
  * lines are quarantined instead of failing the job. Works for batch
  * `read` and streaming `readStream` (same options, file-source
  * directory watching).
  */
object CsvSource {

  /** The reference weather reading layout, typed. */
  val weatherSchema: StructType = StructType(Seq(
    StructField("station_id", StringType, nullable = false),
    StructField("station_name", StringType, nullable = true),
    StructField("metric", StringType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("observed", TimestampType, nullable = true),
    StructField("_corrupt", StringType, nullable = true)))

  def readWeather(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read
      .schema(weatherSchema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** Streaming variant: the producer-side directory feed. */
  def streamWeather(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(weatherSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(dir)

  /** Schema-bound JSON-lines ingest with the same quarantine
    * discipline — the event-feed twin of the CSV reader (the
    * reference's monitor parses JSON payloads; `props` in the events
    * table is a JSON column). Explicit schema (no inference scan),
    * PERMISSIVE mode, bad lines land in `_corrupt` instead of
    * failing the job. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  def streamJson(spark: SparkSession, dir: String, schema: StructType,
                 maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains("_corrupt")) schema
    else schema.add(StructField("_corrupt", StringType, nullable = true))
}
