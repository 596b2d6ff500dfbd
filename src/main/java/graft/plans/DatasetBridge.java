package graft.plans;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;

/**
 * Java bridge to {@code classic.Dataset.ofRows} (private[sql] in
 * Scala, public static in bytecode) — turns a hand-built LogicalPlan
 * into a DataFrame. Same pattern as graft.functions.ColumnBridge.
 */
public final class DatasetBridge {
    private DatasetBridge() {}

    public static Dataset<Row> ofRows(SparkSession spark, LogicalPlan plan) {
        return org.apache.spark.sql.classic.Dataset.ofRows(
            (org.apache.spark.sql.classic.SparkSession) spark, plan);
    }

    /**
     * {@code internalCreateDataFrame(rdd, schema, isStreaming = true)}:
     * wraps an already-planned batch computation as a STREAMING-flagged
     * DataFrame — what a V1 {@code Source.getBatch} must return
     * (MicroBatchExecution asserts {@code isStreaming} on the plan).
     */
    public static Dataset<Row> streamingDataFrame(
            SparkSession spark,
            org.apache.spark.rdd.RDD<org.apache.spark.sql.catalyst.InternalRow> rdd,
            org.apache.spark.sql.types.StructType schema) {
        return ((org.apache.spark.sql.classic.SparkSession) spark)
            .internalCreateDataFrame(rdd, schema, true);
    }

    /**
     * The inverse wrap for a V1 {@code Sink.addBatch}: the DataFrame the
     * engine hands in is streaming-flagged and cannot be re-planned by
     * ordinary writers — rewrap its already-planned RDD as a BATCH
     * DataFrame first (the standard V1 sink pattern).
     */
    public static Dataset<Row> batchDataFrame(
            SparkSession spark,
            org.apache.spark.rdd.RDD<org.apache.spark.sql.catalyst.InternalRow> rdd,
            org.apache.spark.sql.types.StructType schema) {
        return ((org.apache.spark.sql.classic.SparkSession) spark)
            .internalCreateDataFrame(rdd, schema, false);
    }
}
