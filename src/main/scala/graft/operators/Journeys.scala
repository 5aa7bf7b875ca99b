package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence analytics over event streams: what users DO next. The
  * empirical Markov chain over event types is the standard product-
  * analytics artifact (funnel leak detection, next-action prediction
  * baselines) and, in a training-data pipeline, the transition prior a
  * synthetic-journey generator samples from.
  */
object Journeys {

  /** Session-scoped event-type transition counts and probabilities: for
    * each ordered pair of CONSECUTIVE events by the same key within one
    * session (gap rule `gapUs`, the same sessionization the q_sessions
    * family pins), count (from_type → to_type) and normalize per
    * from_type. Transitions never cross a session boundary — "view then
    * buy tomorrow" is two journeys, not a transition.
    *
    * Scale shape: sessionization + next-event lookup are ONE window pass
    * per key (per-key partitions — bounded, millions of keys), then the
    * transition aggregate collapses to |types|² rows; the probability
    * normalization windows over that metadata-sized relation, never the
    * event stream.
    *
    * Returns (from_type, to_type, n, p) with p rounded to 4 dp.
    */
  def sessionTransitions(
      events: DataFrame,
      gapUs: Long = 1800000000L,
      keyCol: String = "user_id",
      tsCol: String = "ts_us",
      typeCol: String = "event_type",
      tieCol: String = "event_id"): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(asc(tsCol), asc(tieCol))
    val cum   = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val counts = events
      .withColumn("prev_us", lag(col(tsCol), 1).over(byKey))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col(tsCol) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(cum))
      .withColumn("next_type", lead(col(typeCol), 1).over(byKey))
      .withColumn("next_sess", lead(col("sess_id"), 1).over(byKey))
      .where(col("next_type").isNotNull && col("next_sess") === col("sess_id"))
      .groupBy(col(typeCol).as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("p",
        graft.functions.Portable.pround(
          col("n").cast("double") /
            sum(col("n")).over(Window.partitionBy(col("from_type"))).cast("double"),
          4))
  }
}
