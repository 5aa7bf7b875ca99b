package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join: match points to [lo, hi) intervals with NO equality key.
  *
  * Spark plans a pure inequality join as BroadcastNestedLoopJoin (or a
  * cartesian sort-merge) — O(points × ranges) compared everywhere. The
  * scalable composition BUCKETIZES: slice the value domain into fixed-width
  * buckets, explode each interval into the buckets it covers, equi-join
  * points on their bucket, and post-filter the exact bounds. Comparisons
  * drop from |P|·|R| to Σ per-bucket products, and the join is a plain
  * shuffled/broadcast hash join that scales like any other equi-join.
  *
  * `bucketWidth` trades replication for selectivity: intervals replicate
  * into ≈ span/width buckets, points into exactly one — pick width near the
  * median interval span. Overlapping intervals and multi-matches are
  * supported (one output row per qualifying pair).
  */
object RangeJoin {

  def bucketedRangeJoin(
      points: DataFrame,
      ranges: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth ($bucketWidth) must be positive")
    val p = points.withColumn("__bucket", floor(col(valueCol) / bucketWidth).cast("long"))
    // inclusive bucket span + exact post-filter: a hi landing on a bucket
    // boundary yields one spurious replica that the filter removes —
    // simpler and always correct vs. special-casing the boundary
    val r = ranges.withColumn(
      "__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(r, Seq("__bucket"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
