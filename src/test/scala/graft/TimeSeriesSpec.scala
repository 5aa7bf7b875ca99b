package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** [[TimeSeries.resampleFfill]]: dense spine, interior gaps carry the
  * last observed value, keys are independent.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("interior gaps fill forward with the last observed daily average") {
    val ev = Seq(
      (1L, ts("2024-03-01 10:00:00"), 2.0),
      (1L, ts("2024-03-01 14:00:00"), 4.0),  // day 1 avg 3.0
      (1L, ts("2024-03-04 09:00:00"), 7.0),  // days 2-3 are gaps
      (2L, ts("2024-03-02 00:00:00"), 5.0)   // single-day key: spine of 1
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.resampleFfill(ev, "user_id", "ts", "value")
      .orderBy("user_id", "bucket")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(10), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (1L, "2024-03-01", 3.0, false),
      (1L, "2024-03-02", 3.0, true),
      (1L, "2024-03-03", 3.0, true),
      (1L, "2024-03-04", 7.0, false),
      (2L, "2024-03-02", 5.0, false)))
  }

  test("gap-free keys pass through unchanged (fill is the identity on dense series)") {
    val ev = Seq(
      (9L, ts("2024-05-01 01:00:00"), 1.0),
      (9L, ts("2024-05-02 01:00:00"), 2.0),
      (9L, ts("2024-05-03 01:00:00"), 3.0)
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.resampleFfill(ev, "user_id", "ts", "value").collect()
    assert(got.length == 3 && got.forall(!_.getBoolean(3)))
  }

  test("spine covers each key's own span — no global calendar bleed between keys") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, ts("2024-06-01 00:00:00"), 2.0)
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.resampleFfill(ev, "user_id", "ts", "value").collect()
    assert(got.length == 2, "disjoint single-day keys must produce one row each")
  }
}
