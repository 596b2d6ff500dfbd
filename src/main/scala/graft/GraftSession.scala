package graft

import org.apache.spark.sql.SparkSession

/** Tuned session factory.
  *
  * Local dev/bench runs on `local[32]`; the same settings are what we
  * would ship as `--conf` defaults on a real cluster: AQE owns runtime
  * re-planning (partition coalesce + skew-join splitting), shuffle
  * partition count matches available parallelism instead of Spark's
  * 200 default, Kryo for the few non-Tungsten payloads.
  *
  * Streaming state lives in RocksDB, not the default HDFS-backed
  * in-memory map: heap state caps total streaming state at executor
  * memory, while RocksDB spills to local disk — the 100 TB-tier
  * choice, and the same backend ksqlDB (the system this engine
  * matches) runs all its state on. Changelog checkpointing uploads
  * per-batch deltas instead of full RocksDB snapshots, so checkpoint
  * cost tracks the batch's state churn rather than total state size.
  */
object GraftSession {
  def local(cores: Int = 32): SparkSession = tuned(
    SparkSession.builder().master(s"local[$cores]"), cores
  )

  def tuned(b: SparkSession.Builder, shufflePartitions: Int): SparkSession = {
    val spark = b
      .appName("graft")
      .withExtensions(new GraftExtensions) // SQL names for graft's native exprs
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
