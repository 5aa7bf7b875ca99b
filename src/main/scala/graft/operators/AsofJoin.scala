package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the LATEST right row with the same key
  * and timestamp at-or-before the left row's timestamp (the point-in-time
  * lookup financial and feature-store systems call ASOF).
  *
  * Spark has no native as-of operator; the scalable composition is the
  * tagged-union trick rather than a range join:
  *
  *   1. union right rows (payload set) and left rows (payload null),
  *   2. ONE shuffle: window over the key ordered by (ts, tag) — right rows
  *      sort before left rows at equal ts so "at-or-before" includes ties,
  *   3. `last(payload, ignoreNulls = true)` over the running frame gives
  *      each left row the most recent right payload,
  *   4. keep the left rows.
  *
  * No per-pair row blowup exists anywhere (an interval join would expand
  * every candidate pair); state per key is one running payload. The DuckDB
  * oracle uses its NATIVE `ASOF LEFT JOIN` — two independent formulations
  * agreeing row-for-row.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate ties (e.g.
  * `max(id)`) or the match is ambiguous in BOTH engines.
  *
  * @param left     (keyCol, tsCol, ...) probe rows, preserved
  * @param right    (keyCol, tsCol, payloadCols...) point-in-time facts
  * @param payloads right columns carried onto matches (null when no right
  *                 row is at-or-before)
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloads: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(payloads.contains)
    val taggedRight = right
      .select(
        (col(keyCol) +: col(tsCol) +: payloads.map(col)) ++
          leftCols.filterNot(c => c == keyCol || c == tsCol)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
      .withColumn("__tag", lit(0))
    val taggedLeft = left
      .select(
        (col(keyCol) +: col(tsCol) +: payloads.map(c => lit(null).cast(right.schema(c).dataType).as(c))) ++
          leftCols.filterNot(c => c == keyCol || c == tsCol).map(col): _*)
      .withColumn("__tag", lit(1))
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    payloads
      .foldLeft(taggedRight.unionByName(taggedLeft)) { (df, p) =>
        df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
      }
      .where(col("__tag") === 1)
      .drop("__tag")
  }
}
