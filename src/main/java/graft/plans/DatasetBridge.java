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
}
