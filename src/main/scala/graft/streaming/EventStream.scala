package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` schema: the streaming twin
  * of the batch q_events_window / q_sessions queries.
  *
  * Scale design: windowed aggregation with a watermark is Spark's incremental
  * stateful hash agg — state is bounded by (watermark horizon × group
  * cardinality); sessionization keeps one small state record per user key.
  * Both shuffle once on their grouping key, exactly like the batch plan.
  */
object EventStream {

  /** The events schema as Structured Streaming needs it declared up front.
    * `ts`'s scanned type is Spark-version-dependent (BIGINT nanos under the
    * legacy flag; TIMESTAMP_NTZ on Spark 4.1.2+ — see EventsSource), so the
    * stream schema is built around whatever dtype a batch probe of the same
    * directory reports.
    */
  def eventSchema(tsType: org.apache.spark.sql.types.DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open a streaming read over a directory of events parquet files.
    *
    * A metadata-only batch read probes how this Spark version scans the
    * parquet TIMESTAMP(NANOS) `ts` column (footer read, no data scan), so
    * the declared stream schema always matches the scan and `ts_us`/`ts_t`
    * are derived the same way as the batch `EventsSource.events`.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // an empty / not-yet-populated directory is a LEGITIMATE state for a
    // streaming source at startup — the probe then has no footer to read,
    // so fall back to the legacy BIGINT-nanos schema rather than throwing
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch { case scala.util.control.NonFatal(_) => LongType }
    spark.readStream
      .schema(eventSchema(tsType))
      .parquet(dir)
      .withColumn("ts_us", graft.sources.EventsSource.tsUsColumn(tsType))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
  }

  /** Tumbling 1-hour windowed counts/sums per event type, 2-hour watermark
    * for late data. Append-mode compatible (finalized windows only).
    */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_t", "2 hours")
      .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour_bucket"),
        col("event_type"),
        col("n"),
        col("sum_value"))

  /** Per-user session tracking with mapGroupsWithState: counts sessions split
    * at >30-minute gaps. State per user is (lastTsUs, sessionCount) — O(1).
    * Emits (user_id, n_sessions, n_events) in Update mode.
    */
  case class UserSessions(userId: Long, nSessions: Long, nEvents: Long)
  case class SessState(lastTsUs: Long, nSessions: Long, nEvents: Long)

  val SessionGapUs: Long = 30L * 60 * 1000 * 1000

  def sessionCounts(spark: SparkSession, events: DataFrame): org.apache.spark.sql.Dataset[UserSessions] = {
    import spark.implicits._
    events
      .select(col("user_id").as("uid"), col("ts_us").as("tsUs"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessState, UserSessions](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[SessState]) =>
          val sorted = rows.map(_._2).toSeq.sorted
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          sorted.foreach { ts =>
            val newSession = st.lastTsUs == Long.MinValue || ts - st.lastTsUs > SessionGapUs
            st = SessState(ts, st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
          }
          state.update(st)
          UserSessions(uid, st.nSessions, st.nEvents)
      }
  }

  /** Streaming twin of the batch decayed-counts query (Journeys
    * .decayedCounts): per event type, the half-life-weighted activity
    * Σᵢ 2^(−(T − tᵢ)/halflife), maintained INCREMENTALLY with O(1) state
    * per key — (lastTsUs, sum-decayed-to-lastTs, n).
    *
    * The update is ORDER-INDEPENDENT, so late/out-of-order events need no
    * buffering: an event at ts ≥ lastTs decays the accumulated sum forward
    * (sum·2^(−Δ/hl) + 1) and advances the reference; an event at ts <
    * lastTs adds its own already-decayed contribution (2^(−Δ/hl)) without
    * moving it. Both are algebraically exact for Σ 2^(−(lastTs−tᵢ)/hl).
    *
    * Emits (eventType, n, decayedAtLast, lastTsUs) in Update mode; a
    * serving layer rescales to any reference time T with
    * decayedAtLast · 2^(−(T−lastTs)/hl) — which is how the parity spec
    * pins streaming == batch (the batch query references the global max
    * event time). At 100 TB/day the state stays |event types|-sized.
    */
  case class DecayState(lastTsUs: Long, sum: Double, n: Long)
  case class DecayedCount(eventType: String, n: Long, decayedAtLast: Double, lastTsUs: Long)

  def decayedCounts(
      spark: SparkSession,
      events: DataFrame,
      halfLifeUs: Long): org.apache.spark.sql.Dataset[DecayedCount] = {
    import spark.implicits._
    events
      .select(col("event_type"), col("ts_us"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[DecayState, DecayedCount](GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[DecayState]) =>
          var st = state.getOption.getOrElse(DecayState(Long.MinValue, 0.0, 0L))
          rows.foreach { case (_, ts) =>
            st =
              if (st.lastTsUs == Long.MinValue) DecayState(ts, 1.0, 1L)
              else if (ts >= st.lastTsUs) DecayState(
                ts,
                st.sum * math.pow(2.0, -((ts - st.lastTsUs).toDouble / halfLifeUs)) + 1.0,
                st.n + 1)
              else DecayState(
                st.lastTsUs,
                st.sum + math.pow(2.0, -((st.lastTsUs - ts).toDouble / halfLifeUs)),
                st.n + 1)
          }
          state.update(st)
          DecayedCount(key, st.n, st.sum, st.lastTsUs)
      }
  }

  /** Streaming exact dedup: drop repeated event_ids, with the watermark
    * bounding the dedup state (the streaming twin of Dedup.exact — at 100 TB
    * of events/day the state only holds the watermark horizon, not history).
    *
    * NOTE: plain `dropDuplicates("event_id")` would IGNORE the watermark for
    * state cleanup (event-time column not in the subset) and grow state
    * forever; `dropDuplicatesWithinWatermark` is the bounded-state form.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_t", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join — purchase attribution: join each
    * `purchase` to every `click` by the SAME user in the preceding hour.
    * Both sides carry a watermark and the join condition bounds the event-
    * time range, so Spark buffers only one hour of per-side state (the
    * canonical bounded stream-stream join; unbounded conditions would grow
    * state forever). Emits (purchase_id, click_id, user_id, gap_s).
    *
    * The same expression tree runs in batch (spec-asserted equal on a
    * static input) — watermarks are no-ops there.
    */
  def purchaseAttribution(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_t").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val c = clicks
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts_t").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    p.join(
        c,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") < col("p_ts"))
      .select(
        col("purchase_id"),
        col("click_id"),
        col("user_id"),
        ((col("p_ts").cast("long")) - col("c_ts").cast("long")).as("gap_s"))
  }

  /** Run a streaming query to a named memory sink until all available data
    * is processed (synchronous, for tests/local smoke).
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()
  }
}
