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

  /** Interval-OVERLAP join: pairs of half-open intervals [lLo, lHi) ×
    * [rLo, rHi) that intersect, optionally within equi `keys` — the
    * session-vs-session / span-vs-span case [[bucketedRangeJoin]]'s
    * point-in-range shape can't express. A direct `lLo < rHi AND rLo <
    * lHi` join is inequality-only, which Spark plans as a nested loop.
    *
    * Bucketized: BOTH sides explode into the fixed-width cells their span
    * covers and equi-join on (keys, cell). A pair sharing several cells
    * would duplicate, so each surviving pair is claimed by exactly ONE
    * cell — the one containing the overlap's start `greatest(lLo, rLo)`
    * (both intervals necessarily cover it, so both replicated into it):
    * exact dedup with no distinct/shuffle. Replication is span/width per
    * row; pick `bucketWidth` near the median span, as for the point form.
    *
    * Left/right non-key column names must be disjoint (the join output
    * carries both).
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lLo: String, lHi: String,
      rLo: String, rHi: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth ($bucketWidth) must be positive")
    def cells(df: DataFrame, lo: String, hi: String): DataFrame =
      df
        // empty intervals overlap nothing — and sequence(a, b) with b < a
        // would generate DESCENDING cells
        .where(col(hi) > col(lo))
        .withColumn("__cell",
          explode(sequence(
            floor(col(lo) / bucketWidth).cast("long"),
            // hi is EXCLUSIVE: an interval ending exactly on a cell edge
            // does not enter that cell
            floor((col(hi) - lit(1e-9)) / bucketWidth).cast("long"))))
    cells(left, lLo, lHi)
      .join(cells(right, rLo, rHi), keys :+ "__cell")
      .where(
        col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
          col("__cell") === floor(greatest(col(lLo), col(rLo)) / bucketWidth).cast("long"))
      .drop("__cell")
  }
}
