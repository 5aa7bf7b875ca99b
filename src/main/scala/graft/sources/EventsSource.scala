package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The `events` table ships with parquet TIMESTAMP(NANOS) timestamps, which
  * different Spark versions surface differently:
  *
  *   - Spark 3.x / early 4.x: refuses the column outright
  *     ([PARQUET_TYPE_ILLEGAL]) unless `spark.sql.legacy.parquet.nanosAsLong`
  *     is set, in which case the column scans as BIGINT nanoseconds.
  *   - Spark 4.1.2 (this sandbox): reads TIMESTAMP(NANOS) natively as
  *     TIMESTAMP_NTZ at microsecond precision (floor-truncated), and the
  *     legacy flag no longer affects the scan.
  *
  * We set the legacy flag for the old behavior and then branch on the dtype
  * the scan ACTUALLY produced, so the same code is correct under both
  * runtimes. Derived columns (what every downstream event query consumes):
  *
  *   - `ts_us`  BIGINT microseconds since epoch (exact integer arithmetic —
  *     what sessionization gaps compare on; DuckDB mirror: `epoch_us(ts)`)
  *   - `ts_t`   TIMESTAMP at microsecond precision (for windowing/formatting)
  *
  * The NTZ->LTZ cast is exact because every session in this engine pins
  * `spark.sql.session.timeZone=UTC` (Bench/Verify/Main/specs all set it):
  * the NTZ wall-clock IS the UTC instant, so `unix_micros(cast(ts as
  * timestamp))` equals DuckDB's `epoch_us(ts)` to the microsecond.
  *
  * SESSION-LEVEL SIDE EFFECT (deliberate, legacy path only): the legacy flag
  * must stay set for the lifetime of the returned (lazy) DataFrame — scan
  * execution re-reads footers under the then-current conf, so restoring the
  * flag here would break the plan later. On Spark 4.1.2 the flag is inert.
  */
object EventsSource {

  /** Epoch-microseconds expression for the `ts` column, given the dtype the
    * parquet scan actually produced (see version notes above).
    */
  private[graft] def tsUsColumn(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column =
    dt match {
      case LongType         => expr("ts div 1000") // BIGINT nanos -> micros
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case TimestampType    => unix_micros(col("ts"))
      case other =>
        throw new IllegalStateException(
          s"events.ts scanned as unexpected type $other; expected BIGINT nanos or a timestamp type")
    }

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw
      .withColumn("ts_us", tsUsColumn(raw.schema("ts").dataType))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
  }
}
