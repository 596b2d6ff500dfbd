package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test schema (TESTDATA.md).
  *
  * Everything is plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom — a `.select` or `.filter` downstream
  * reaches the scan (`PushedFilters`/`ReadSchema` in explain()).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The generator has emitted `events.ts` two ways across driver
    * versions: TIMESTAMP(NANOS) (vectorized reader rejects it — read
    * nanos as long via the legacy conf and convert), and naive
    * TIMESTAMP(MICROS) (isAdjustedToUTC=false → TIMESTAMP_NTZ). Both
    * are normalized to plain TimestampType here, matching what every
    * downstream operator (watermarks, window(), unix_micros) and the
    * DuckDB oracle expect; the session timezone is UTC
    * (GraftSession), so the NTZ→LTZ cast is micros-identity. The
    * date-ish columns on orders/lineitem stay NTZ as read — all code
    * and oracles already use NTZ literals for them. */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => // legacy nanos-as-long: exact integer division —
        // double division would lose ns precision
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // harmless when the column is already a timestamp; required for
    // the legacy nanos layout. Set at runtime so it also holds under
    // a driver-owned session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Streaming reader over the events parquet — same nanos→micros
    * conversion as the batch loader, as a file-stream source (the
    * local stand-in for the reference's Kafka source). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // file-stream sources take a directory; select just the events
    // table out of the shared testdata dir
    normalizeTs(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir))
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
