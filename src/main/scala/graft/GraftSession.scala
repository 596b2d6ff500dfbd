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
  *
  * RocksDB's OFF-HEAP memory is explicitly bounded: without
  * `boundedMemoryUsage`, every RocksDB instance on an executor (one
  * per stateful-operator partition — dozens on a 32-core executor)
  * allocates its own block cache + memtables outside the JVM heap,
  * and at 100 TB-tier state the sum silently exceeds
  * `memoryOverhead` until the YARN/K8s container is OOM-killed —
  * the classic large-cluster streaming failure. With the bound, all
  * instances on an executor share ONE LRU cache capped at
  * `maxMemoryUsageMB` (write buffers charged against the same cap),
  * so the engine's total memory is executor heap + this single
  * known constant, whatever the key cardinality does. 512 MB is the
  * local[32] default; on a real cluster set it alongside
  * `spark.executor.memoryOverhead` (overhead must exceed the cap).
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
      // one shared, capped LRU cache across all RocksDB instances on
      // the executor instead of per-instance unbounded off-heap — see
      // the class doc for why this is load-bearing at cluster scale
      .config("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
      .config("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
