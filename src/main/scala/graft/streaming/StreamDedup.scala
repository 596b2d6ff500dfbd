package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming ingest deduplication — the first stage of an LLM-data
  * pipeline consuming an at-least-once source (Kafka redeliveries,
  * producer retries).
  *
  * `dropDuplicatesWithinWatermark` keys the state store on the id
  * columns and — unlike plain streaming `dropDuplicates`, whose state
  * grows forever — evicts each key once the watermark passes it, so
  * state is O(keys per watermark horizon), stream-length-independent.
  * On a batch frame it degrades to plain `dropDuplicates` (same
  * result set, no state semantics needed), which is what the parity
  * spec compares against.
  */
object StreamDedup {

  def byKeyWithinWatermark(
      df: DataFrame,
      tsCol: String,
      delay: String,
      idCols: Seq[String]): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(idCols)
    else df.dropDuplicates(idCols)
}
