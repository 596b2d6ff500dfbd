package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rate-limited replay of a static table as a stream — the analog of
  * the reference producer's throughput-controlled CSV replay
  * (producer KafkaWeatherProducer.scala:96-160: read rows, emit at
  * `throughput` msg/s, key by station id).
  *
  * Spark-first: the built-in `rate` source emits `rowsPerSecond`
  * ticks; each tick's monotonically increasing `value` indexes into
  * the row-numbered static table via a broadcast-able join. No
  * driver-side loop, no sleeps — backpressure and pacing are the
  * source's contract.
  */
object ReplayProducer {

  /** Index the static table deterministically (by `ordCols`) so tick
    * n replays row n. */
  def indexed(df: DataFrame, ordCols: Seq[String]): DataFrame =
    df.withColumn("__idx",
      row_number().over(Window.orderBy(ordCols.map(col): _*)).cast("long") - 1)

  /** Streaming replay at `rowsPerSecond`. The join is stream-static
    * (the static side is the table being replayed) — Spark plans it
    * without stateful shuffle on the stream side. */
  def replay(
      spark: SparkSession,
      table: DataFrame,
      ordCols: Seq[String],
      rowsPerSecond: Int): DataFrame = {
    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load() // columns: timestamp, value
    src.join(indexed(table, ordCols), src("value") === col("__idx"))
      .drop("__idx")
      .withColumnRenamed("timestamp", "emit_ts")
      .withColumnRenamed("value", "emit_seq")
  }
}
