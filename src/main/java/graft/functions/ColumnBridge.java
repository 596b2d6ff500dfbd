package graft.functions;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Java bridge to the Column&lt;-&gt;Expression converters. They are
 * {@code private[sql]} in Scala, but their static forwarders are plain
 * public methods at the classfile level, which javac is happy to link
 * (the standard pattern for third-party Catalyst expressions on
 * Spark 4's column-node API).
 */
public final class ColumnBridge {
    private ColumnBridge() {}

    public static Column column(Expression e) {
        return org.apache.spark.sql.classic.ExpressionUtils.column(e);
    }

    public static Expression expression(Column c) {
        return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
    }
}
