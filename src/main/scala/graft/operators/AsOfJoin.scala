package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the reference notebook's time-indexed
  * merge (price_prediction.ipynb joins day-ahead prices, consumption
  * and weather frames on datetime, then forward-fills gaps).
  *
  * Spark-first design: instead of a range join (whose candidate set
  * explodes at scale) or a broadcast loop, we:
  *   1. tag right rows side=0 carrying a payload struct, left rows side=1,
  *   2. union them (no shuffle),
  *   3. one window pass per key ordered by (ts, side) taking the
  *      running `last(payload, ignoreNulls)`,
  *   4. keep left rows: the running value IS the as-of match
  *      (right wins ties at equal ts because side 0 sorts first — the
  *      usual `l.ts >= r.ts` as-of convention).
  *
  * Cost: one shuffle on the key + an in-partition sort — O(n log n)
  * per key, linear state, no pair explosion. At 100 TB this is a
  * single exchange reused by any downstream op partitioned the same
  * way; a range-join formulation would be quadratic in bucket size.
  */
object AsOfJoin {

  /** Left as-of join: every `left` row gets the latest `right` payload
    * with `right.ts <= left.ts` for the same key (null when none).
    *
    * @param payload right-side columns to carry, as (srcCol, outName);
    *                outNames must not collide with left columns.
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[(String, String)]): DataFrame = {
    val rightTagged = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        struct(payload.map { case (src, out) => col(src).as(out) }: _*).as("__p")): _*)
    val leftTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(col) ++
        payload.map { case (_, out) => col(s"__m.$out").as(out) }): _*)
  }
}
