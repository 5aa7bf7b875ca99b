package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `events` table ships with parquet TIMESTAMP(NANOS) timestamps, which
  * Spark 4 refuses to read as timestamps ([PARQUET_TYPE_ILLEGAL]). We read
  * nanos as Long (`spark.sql.legacy.parquet.nanosAsLong`) and derive:
  *
  * SESSION-LEVEL SIDE EFFECT (deliberate): the legacy flag must stay set for
  * the lifetime of the returned (lazy) DataFrame — scan execution re-reads
  * footers under the then-current conf, so restoring the flag here would
  * break the plan later. Consequence: after calling this, OTHER nanos
  * parquet reads in the same session also see BIGINT nanos. Acceptable for
  * this engine (events is the only nanos table); callers embedding this in
  * a larger app should scope it with a dedicated session
  * (`spark.newSession()`).
  *   - `ts_us`  BIGINT microseconds since epoch (exact integer arithmetic —
  *     what sessionization gaps compare on; DuckDB mirror: `epoch_us(ts)`)
  *   - `ts_t`   TIMESTAMP at microsecond precision (for windowing/formatting)
  */
object EventsSource {

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
  }
}
