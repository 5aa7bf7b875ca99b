package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample irregular event streams onto a
  * fixed grid and fill the gaps — the feature-engineering step every
  * metrics/telemetry/training-signal pipeline runs before a model sees
  * the data (models want dense fixed-step series; event logs are sparse
  * and bursty).
  */
object TimeSeries {

  /** Per-key fixed-step resample with forward fill: bucket each key's
    * events to `truncUnit` grid points, average the value per bucket
    * (4-dp portable rounding), build the key's dense spine from its first
    * to its last observed bucket, and carry the last observed average
    * forward across empty buckets. Returns (keyCol, bucket, value,
    * is_gap) — `is_gap` marks carried-forward rows.
    *
    * Scale shape: ONE shuffle keys the bucket aggregate; the spine is a
    * map-side `sequence` generator off the per-key span (no driver-side
    * calendar, no cross join against a global date table); the gap join
    * and the forward-fill window both run on (key, bucket) / key — and a
    * per-KEY window partition is the bounded kind (≤ the key's span in
    * buckets), unlike the per-language windows this repo distributes via
    * prefix sums: keys number in the millions and partitions stay tiny,
    * so the window parallelizes on exactly the axis the data grows.
    */
  def resampleFfill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      truncUnit: String = "DAY"): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), date_trunc(truncUnit, col(tsCol)).as("bucket"))
      .agg(graft.functions.Portable.pround(avg(col(valueCol)), 4).as("v"))
    val spine = daily
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("d0"), max(col("bucket")).as("d1"))
      .select(col(keyCol),
        explode(sequence(col("d0"), col("d1"), expr(s"INTERVAL 1 $truncUnit"))).as("bucket"))
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(daily, Seq(keyCol, "bucket"), "left_outer")
      .select(
        col(keyCol),
        col("bucket"),
        last(col("v"), ignoreNulls = true).over(w).as("value"),
        col("v").isNull.as("is_gap"))
  }

  /** Rolling z-score anomaly flags per key: each observation's value
    * against the mean/stddev of the `n` STRICTLY PRECEDING observations
    * (the online-detector semantics — a point must not normalize itself),
    * flagged when |z| > `thr`. The first `n` points per key are warm-up
    * and are not emitted (no full window exists yet).
    *
    * Scale shape: ONE bounded `rowsBetween(-n, -1)` window per key — the
    * frame buffers at most `n` rows per task regardless of how hot the
    * key is, the bounded kind of window (same argument as
    * [[resampleFfill]]'s per-key fill). Zero-variance windows emit z = 0
    * (a constant history makes any value "anomalous" by division, which
    * is noise, not signal). z is 4-dp portably rounded BEFORE the
    * threshold test so both engines flag the identical rows.
    *
    * Returns (keyCol, tieCol, valueCol, z_r, is_anomaly).
    */
  /** Trending keys per time bucket: hour-over-hour count lift
    * (n / previous-hour n) per key, top-k lifts per bucket — the
    * "what's suddenly hot" feed every monitoring/discovery surface
    * renders. "Previous" is the key's previous OBSERVED bucket (a lag
    * over its sorted buckets — equal to hour-minus-one on a dense
    * stream; a key silent for a gap compares against its last active
    * hour). A key's first bucket is skipped: a lift against no baseline
    * is undefined, and a brand-new key is a different signal than a
    * rising one.
    *
    * Scale shape: the event stream reduces to (bucket, key, n) with one
    * partial-aggregated groupBy FIRST; both windows then run over that
    * metadata relation — lag partitions by key over its hour buckets,
    * the rank partitions by bucket over the key cardinality. Neither
    * touches an event-count axis. The lift is ROUNDED before ranking so
    * top-k tie-breaks are cross-engine identical.
    *
    * Returns (bucket, keyCol, n, prev_n, lift_r, rn), rn ≤ k per bucket.
    */
  def trending(
      events: DataFrame,
      tsCol: String = "ts_t",
      keyCol: String = "event_type",
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val counts = events
      .groupBy(
        date_format(col(tsCol), "yyyy-MM-dd HH").as("bucket"),
        col(keyCol))
      .agg(count(lit(1)).as("n"))
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    val byBucket = Window.partitionBy(col("bucket"))
      .orderBy(desc("lift_r"), asc(keyCol))
    counts
      .withColumn("prev_n", lag(col("n"), 1).over(byKey))
      .where(col("prev_n").isNotNull)
      .withColumn("lift_r",
        graft.functions.Portable.pround(col("n") / col("prev_n").cast("double"), 4))
      .withColumn("rn", row_number().over(byBucket))
      .where(col("rn") <= k)
      .select(col("bucket"), col(keyCol), col("n"), col("prev_n"), col("lift_r"), col("rn"))
  }

  def rollingZscore(
      events: DataFrame,
      n: Int = 10,
      thr: Double = 3.0,
      keyCol: String = "user_id",
      tsCol: String = "ts_t",
      valueCol: String = "value",
      tieCol: String = "event_id"): DataFrame = {
    require(n >= 2, s"n ($n) must be >= 2 for a sample stddev")
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(asc(tsCol), asc(tieCol))
      .rowsBetween(-n, -1)
    events
      .withColumn("__m", avg(col(valueCol)).over(w))
      .withColumn("__s", stddev_samp(col(valueCol)).over(w))
      .withColumn("__c", count(col(valueCol)).over(w))
      .where(col("__c") === n)
      .withColumn("z_r", graft.functions.Portable.pround(
        when(col("__s") > 0, (col(valueCol) - col("__m")) / col("__s"))
          .otherwise(lit(0.0)), 4))
      .withColumn("is_anomaly", (abs(col("z_r")) > thr).cast("int"))
      .select(col(keyCol), col(tieCol), col(valueCol), col("z_r"), col("is_anomaly"))
  }

  /** Burstiness (Fano factor / index of dispersion) of per-bucket event
    * counts, per key: F = Var(c)/Mean(c) over the key's ACTIVE time
    * buckets. A Poisson (memoryless) arrival process sits at F ≈ 1;
    * F ≫ 1 is bursty (bot storms, batch jobs, replay floods), F < 1 is
    * more regular than chance (schedulers, heartbeats) — the traffic-
    * shape dial a mean-rate dashboard can't see.
    *
    * Mean/variance come from EXACT integer sums of the bucket counts
    * (the [[graft.operators.Stats.welchTTest]] discipline), so the
    * statistic replays bit-identically. Two partial-agg passes — (key,
    * bucket) then key — nothing key-cardinality-sized beyond the counts.
    * Buckets with zero events don't exist in the count relation, so this
    * is the ACTIVE-bucket Fano (documented choice: including empty
    * buckets needs the key's span spine — resampleFfill's job).
    *
    * Keys with <2 active buckets are dropped (variance undefined).
    *
    * Returns (keyCol, n_buckets, n_events, mean_r, var_r, fano_r).
    */
  def burstiness(
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts_t",
      bucketFmt: String = "yyyy-MM-dd HH"): DataFrame = {
    val cnt = events
      .withColumn("__b", date_format(col(tsCol), bucketFmt))
      .groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("c"))
    cnt
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"))
      .where(col("n_buckets") >= 2)
      .withColumn("mean_r", graft.functions.Portable.pround(
        col("s1").cast("double") / col("n_buckets"), 4))
      .withColumn("var_r", graft.functions.Portable.pround(
        (col("s2").cast("double")
          - col("s1").cast("double") * col("s1").cast("double") / col("n_buckets"))
          / (col("n_buckets") - 1), 4))
      .withColumn("fano_r", graft.functions.Portable.pround(
        col("var_r") / col("mean_r"), 4))
      .select(col(keyCol), col("n_buckets"), col("s1").as("n_events"),
        col("mean_r"), col("var_r"), col("fano_r"))
  }

  /** Hour-of-day SEASONALITY profile per key — the one-way-ANOVA (η²)
    * answer to "is this stream's hourly volume driven by time of day?":
    * per key, seasonality strength = 1 − SS_within/SS_total over the
    * observed hourly buckets grouped by hour-of-day, plus the peak hour
    * and its mean. Strength ≈ 1 ⇒ the hour-of-day profile explains the
    * volume (schedule your compactions/backfills off-peak); ≈ 0 ⇒ volume
    * is aperiodic and [[burstiness]]'s Fano factor is the right lens.
    *
    * All sufficient statistics are EXACT integer sums (per-hod n, Σc,
    * Σc²); the SS terms become doubles only in the final ≤24-row
    * combine. Buckets are the OBSERVED (key, day-hour) cells — an hour
    * with zero events contributes no bucket (documented; a dense-grid
    * variant would cross-join the day×hod domain).
    *
    * Returns (keyCol, n_buckets, peak_hod, peak_mean_r, strength_r).
    */
  def seasonality(
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts_t"): DataFrame = {
    val cnt = events
      .withColumn("__b", date_format(col(tsCol), "yyyy-MM-dd HH"))
      .withColumn("__hod", hour(col(tsCol)))
      .groupBy(col(keyCol), col("__b"), col("__hod"))
      .agg(count(lit(1)).as("c"))
    val perHod = cnt
      .groupBy(col(keyCol), col("__hod"))
      .agg(count(lit(1)).as("nh"), sum(col("c")).as("s1"), sum(col("c") * col("c")).as("s2"))
      .withColumn("mean_r", graft.functions.Portable.pround(
        col("s1").cast("double") / col("nh"), 6))
    perHod
      .groupBy(col(keyCol))
      .agg(
        sum(col("nh")).as("n_buckets"),
        sum(col("s1")).as("t1"),
        sum(col("s2")).as("t2"),
        sum(col("s2").cast("double")
          - col("s1").cast("double") * col("s1").cast("double") / col("nh")).as("__ssw"),
        // peak hour: (mean DESC, hod ASC) — the struct ordering is total
        // because hods are distinct within a key
        max_by(struct(col("__hod"), col("mean_r")),
          struct(col("mean_r"), -col("__hod"))).as("__peak"))
      .withColumn("__sst",
        col("t2").cast("double")
          - col("t1").cast("double") * col("t1").cast("double") / col("n_buckets"))
      .select(col(keyCol), col("n_buckets"),
        col("__peak.__hod").as("peak_hod"),
        col("__peak.mean_r").as("peak_mean_r"),
        graft.functions.Portable.pround(
          when(col("__sst") > 0.0, lit(1.0) - col("__ssw") / col("__sst")).otherwise(0.0), 4)
          .as("strength_r"))
  }

  /** DENSE per-key hourly count series: the regular grid [min_h, max_h]
    * per key with zero-filled gaps — what lag-indexed statistics
    * ([[acf]], [[cusumChangepoint]]) require, where the ACTIVE-bucket
    * relations ([[burstiness]]) deliberately are not. The spine is a
    * per-key `sequence(min_h, max_h)` explode: span-sized (calendar-
    * bounded metadata), joined once against the (key, hour) counts.
    * Returns (key, __h, __x) with __x a zero-or-positive exact long.
    */
  def denseHourlySeries(
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts_t"): DataFrame = {
    val cnt = events
      .withColumn("__h", floor(col(tsCol).cast("long") / 3600L).cast("long"))
      .groupBy(col(keyCol), col("__h"))
      .agg(count(lit(1)).as("__c"))
    val spine = cnt
      .groupBy(col(keyCol))
      .agg(min(col("__h")).as("__mn"), max(col("__h")).as("__mx"))
      .select(col(keyCol), explode(sequence(col("__mn"), col("__mx"))).as("__h"))
    spine
      .join(cnt, Seq(keyCol, "__h"), "left_outer")
      .select(col(keyCol), col("__h"), coalesce(col("__c"), lit(0L)).as("__x"))
  }

  /** Sample autocorrelation function at lags 1..`maxLag` per key over
    * the dense hourly count series (Box & Jenkins, "Time Series
    * Analysis", 1970 — the standard r_k with the FULL-series mean and
    * denominator):
    *
    *   r_k = Σ_{t≤n−k} (x_t − x̄)(x_{t+k} − x̄) / Σ (x_t − x̄)²
    *
    * The memory test behind seasonality-period discovery and "is this
    * stream's volume sticky hour-to-hour" — [[seasonality]] asks the
    * hour-OF-DAY question, acf asks the adjacent-hour one. Expanded to
    * sufficient sums: every input (lagged cross-products C_k, window
    * sums A_k/B_k, S1, S2) is an EXACT integer from one pass of
    * PARTITIONED lag windows over the span-sized series, and r_k is one
    * fixed-order scalar expression over them — bit-identical
    * cross-engine before the 6-dp rounding. Keys whose series has zero
    * variance (constant counts) read NULL.
    *
    * Returns (key, lag, n_buckets, acf_r), one row per key × lag.
    */
  def acf(
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts_t",
      maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1, s"maxLag ($maxLag) must be >= 1")
    val ser = denseHourlySeries(events, keyCol, tsCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__h"))
    val lagged = (1 to maxLag).foldLeft(ser) { (d, k) =>
      d.withColumn(s"__l$k", lag(col("__x"), k).over(w))
    }
    val aggs = Seq(
      count(lit(1)).as("n"),
      sum(col("__x")).as("s1"),
      sum(col("__x") * col("__x")).as("s2")) ++
      (1 to maxLag).flatMap { k =>
        Seq(
          sum(col("__x") * col(s"__l$k")).as(s"c$k"),
          sum(when(col(s"__l$k").isNotNull, col(s"__l$k"))).as(s"a$k"),
          sum(when(col(s"__l$k").isNotNull, col("__x"))).as(s"b$k"))
      }
    val perKey = lagged.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    val rows = (1 to maxLag).map { k =>
      struct(lit(k.toLong).as("lag"), col(s"c$k").as("ck"),
        col(s"a$k").as("ak"), col(s"b$k").as("bk"))
    }
    perKey
      .select(col(keyCol), col("n"), col("s1"), col("s2"),
        explode(array(rows: _*)).as("__r"))
      .withColumn("__m", col("s1").cast("double") / col("n").cast("double"))
      .withColumn("__den",
        col("s2").cast("double") - col("s1").cast("double") * col("__m"))
      .select(col(keyCol), col("__r.lag").as("lag"), col("n").as("n_buckets"),
        graft.functions.Portable.pround(
          when(col("__den") > 0.0,
            (col("__r.ck").cast("double")
              - col("__m") * (col("__r.ak") + col("__r.bk")).cast("double")
              + (col("n") - col("__r.lag")).cast("double") * col("__m") * col("__m"))
              / col("__den")),
          6).as("acf_r"))
  }

  /** CUSUM changepoint locator (Page, Biometrika 1954; the Taylor
    * cumulative-deviation form): per key, S_t = Σ_{i≤t}(x_i − x̄) over
    * the dense hourly series, changepoint at argmax |S_t| — the "WHEN
    * did this stream's level shift" answer that [[rollingZscore]]'s
    * local window can't give (a slow drift never trips a z-score, but
    * its cumulative deviation keeps climbing). The estimator is exact
    * in integers end to end: n·S_t = n·prefix_t − t·S1 never touches a
    * float, the argmax tie-break (|nS| DESC, hour ASC) is total, and
    * only the reported magnitude becomes a rounded double. Prefix sums
    * ride a PARTITIONED window over the span-sized series.
    *
    * Returns (key, n_buckets, cp_hour, mag_r): the absolute epoch-hour
    * of the maximizing prefix and |S_t*| = |nS|/n at 6 dp.
    */
  def cusumChangepoint(
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts_t"): DataFrame =
    cusumFromSeries(denseHourlySeries(events, keyCol, tsCol), keyCol)

  /** [[cusumChangepoint]] body over an already-built (key, __h, __x)
    * dense series — shared with [[levelShift]] so both legs run off ONE
    * materialized spine.
    */
  def cusumFromSeries(ser: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wk = Window.partitionBy(col(keyCol))
    val wpick = Window.partitionBy(col(keyCol))
      .orderBy(abs(col("__ns")).desc, col("__h").asc)
    ser
      .withColumn("__pre", sum(col("__x")).over(w))
      .withColumn("__t", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("__h"))))
      .withColumn("__n", count(lit(1)).over(wk))
      .withColumn("__s1", sum(col("__x")).over(wk))
      .withColumn("__ns", col("__n") * col("__pre") - col("__t") * col("__s1"))
      .withColumn("__rn", row_number().over(wpick))
      .where(col("__rn") === 1)
      .select(col(keyCol), col("__n").as("n_buckets"), col("__h").as("cp_hour"),
        graft.functions.Portable.pround(
          abs(col("__ns")).cast("double") / col("__n").cast("double"), 6).as("mag_r"))
  }

  /** Level-shift readout at the CUSUM changepoint: split each key's
    * dense hourly series at [[cusumChangepoint]]'s argmax (the last
    * pre-shift hour by construction — S_t peaks where the deviation run
    * ends) and report both segment means with Welch's unequal-variance t
    * between them — "the stream's rate moved at hour H, from a to b,
    * and the shift is/isn't noise". Locator and test compose from the
    * engine's existing disciplines: the spine is materialized ONCE and
    * feeds both legs; all segment statistics are conditional EXACT
    * integer sums in one partial-agg pass (the [[graft.operators.Stats]]
    * welchTTest discipline), so the readout replays bit-identically.
    * Keys where either segment has <2 buckets or the combined variance
    * is 0 read t_r = NULL.
    *
    * Returns (key, cp_hour, n_pre, n_post, mean_pre_r, mean_post_r, t_r).
    */
  def levelShift(
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts_t"): DataFrame = {
    val ser = denseHourlySeries(events, keyCol, tsCol).localCheckpoint(true)
    val cp = cusumFromSeries(ser, keyCol).select(col(keyCol), col("cp_hour"))
    val pre = col("__h") <= col("cp_hour")
    val st = ser
      .join(cp, Seq(keyCol))
      .groupBy(col(keyCol), col("cp_hour"))
      .agg(
        sum(when(pre, 1L).otherwise(0L)).as("n_pre"),
        sum(when(pre, col("__x")).otherwise(0L)).as("__s1p"),
        sum(when(pre, col("__x") * col("__x")).otherwise(0L)).as("__s2p"),
        sum(when(!pre, 1L).otherwise(0L)).as("n_post"),
        sum(when(!pre, col("__x")).otherwise(0L)).as("__s1q"),
        sum(when(!pre, col("__x") * col("__x")).otherwise(0L)).as("__s2q"))
    val m1 = col("__s1p").cast("double") / col("n_pre")
    val m2 = col("__s1q").cast("double") / col("n_post")
    val v1 = ((col("__s2p").cast("double")
      - col("__s1p").cast("double") * col("__s1p").cast("double") / col("n_pre"))
      / (col("n_pre") - 1))
    val v2 = ((col("__s2q").cast("double")
      - col("__s1q").cast("double") * col("__s1q").cast("double") / col("n_post"))
      / (col("n_post") - 1))
    st.select(col(keyCol), col("cp_hour"), col("n_pre"), col("n_post"),
      graft.functions.Portable.pround(
        when(col("n_pre") > 0, m1), 4).as("mean_pre_r"),
      graft.functions.Portable.pround(
        when(col("n_post") > 0, m2), 4).as("mean_post_r"),
      graft.functions.Portable.pround(
        when(col("n_pre") >= 2 && col("n_post") >= 2
          && v1 / col("n_pre") + v2 / col("n_post") > 0.0,
          (m1 - m2) / sqrt(v1 / col("n_pre") + v2 / col("n_post"))), 4).as("t_r"))
  }

  /** Lagged cross-correlation between two keys' dense hourly series:
    * Pearson r of (x_t, y_{t+lag}) for lag 0..maxLag — does activity in
    * stream A LEAD stream B, and by how many hours ([[acf]] asks this of
    * a stream against itself; this asks it across streams — the
    * "clicks foreshadow purchases" readout). Each lag's sample is the
    * exact overlap of A's spine with B's shifted spine, so partial
    * windows never fabricate zeros outside either stream's span.
    *
    * One spine build ([[denseHourlySeries]] on the two keys only), a
    * (maxLag+1)-way explode of the A side, one equi-join on the shifted
    * hour, one partial-agg pass: all six sufficient sums are exact
    * integers (counts), r is one fixed-order scalar per lag —
    * deterministic under any partial-agg order. Span-sized everything.
    *
    * Returns (lag, n, r_r) ordered by lag; r reads NULL when either
    * side's variance is 0 in the overlap.
    */
  /** Simple-exponential-smoothing one-step forecast (Brown 1956) per key
    * over the dense hourly series, with α = 1/2 EXACTLY: every smoothing
    * weight α(1−α)^lag is a DYADIC rational, so scaling by 2^(L−1) turns
    * the entire level into ONE exact integer sum —
    * S = y_oldest + Σ_{lag<L−1} y_lag·2^(L−2−lag), forecast = S/2^(L−1)
    * — no float recursion to replay, no partial-agg order sensitivity,
    * and the division by a power of two is exact in doubles. The window
    * truncates at `window` lags (contributions beyond lag 40 are below
    * 2⁻⁴⁰ — noise); a shorter series uses its full span with the
    * classic l₁ = y₁ initialization absorbed into the oldest weight.
    *
    * One spine build, one key-sized extent join, one partial-agg sum.
    * y·2^(L−2) must fit the decimal sum — at window 40 that bounds
    * hourly counts by ~2¹⁴ per unit of the 38-digit budget; the window
    * dial trades memory horizon against headroom.
    *
    * Returns (key, n_points, forecast_r) ordered by key.
    */
  def sesForecast(
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts_t",
      window: Int = 40): DataFrame = {
    require(window >= 1 && window <= 60, s"window ($window) must be in [1, 60]")
    val ser = denseHourlySeries(events, keyCol, tsCol)
    val ext = ser
      .groupBy(col(keyCol))
      .agg(max(col("__h")).as("__hx"), min(col("__h")).as("__mn"))
      .select(col(keyCol), col("__hx"),
        least(lit(window.toLong), col("__hx") - col("__mn") + 1L).as("__leff"))
    val lag = col("__hx") - col("__h")
    // functions.shiftleft only takes a literal bit count — the SQL form
    // accepts a column expression
    val weight = when(lag === col("__leff") - 1L, lit(1L))
      .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(__leff - 2 - (__hx - __h) AS INT))"))
    ser
      .join(ext, Seq(keyCol))
      .where(lag < col("__leff"))
      .groupBy(col(keyCol))
      .agg(max(col("__leff")).as("n_points"),
        sum((col("__x") * weight).cast("decimal(38,0)")).as("__s"))
      .select(col(keyCol), col("n_points"),
        graft.functions.Portable.pround(
          col("__s").cast("double")
            / expr("shiftleft(CAST(1 AS BIGINT), CAST(n_points - 1 AS INT))").cast("double"),
          6).as("forecast_r"))
      .orderBy(keyCol)
  }

  /** MASE forecast backtest (Hyndman & Koehler, IJF 2006): hold out each
    * stream's LAST hour, forecast it with the dyadic [[sesForecast]]
    * from the remaining history, and scale the absolute error by the
    * in-sample seasonal-naive MAE (mean |y_t − y_{t−season}| over the
    * training span) — the scale-free accuracy number that makes streams
    * of different volumes comparable, and the "is the model beating the
    * dumbest seasonal guess" gate (MASE ≥ 1 means it is not).
    *
    * One spine build; the SES sum, the holdout actual, and the
    * seasonal-naive sum are each one bounded pass over the span-sized
    * series. Exact integers everywhere except the final ratios: the
    * forecast is ROUNDED before the error per derive-from-rounded, the
    * seasonal MAE stays an exact integer ratio, and MASE is one
    * fixed-order scalar.
    *
    * Returns (key, n_train, actual, forecast_r, mase_r) ordered by key;
    * mase reads NULL when the training span is shorter than `season`
    * (no naive baseline exists) or the naive MAE is 0.
    */
  def maseBacktest(
      events: DataFrame,
      keyCol: String = "event_type",
      tsCol: String = "ts_t",
      window: Int = 40,
      season: Int = 24): DataFrame = {
    require(window >= 1 && window <= 60, s"window ($window) must be in [1, 60]")
    require(season >= 1, s"season ($season) must be >= 1")
    val ser = denseHourlySeries(events, keyCol, tsCol)
    val ext = ser
      .groupBy(col(keyCol))
      .agg(max(col("__h")).as("__hx"), min(col("__h")).as("__mn"))
      .select(col(keyCol), col("__hx"),
        least(lit(window.toLong), col("__hx") - col("__mn")).as("__leff"))
      .where(col("__leff") >= 1)
    val lag = col("__hx") - 1L - col("__h")
    val weight = when(lag === col("__leff") - 1L, lit(1L))
      .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(__leff - 2 - (__hx - 1 - __h) AS INT))"))
    val fc = ser
      .join(ext, Seq(keyCol))
      .where(col("__h") < col("__hx") && lag < col("__leff"))
      .groupBy(col(keyCol))
      .agg(max(col("__leff")).as("n_train"),
        sum((col("__x") * weight).cast("decimal(38,0)")).as("__s"))
      .select(col(keyCol), col("n_train"),
        graft.functions.Portable.pround(
          col("__s").cast("double")
            / expr("shiftleft(CAST(1 AS BIGINT), CAST(n_train - 1 AS INT))").cast("double"),
          6).as("forecast_r"))
    val actual = ser
      .join(ext, Seq(keyCol))
      .where(col("__h") === col("__hx"))
      .select(col(keyCol), col("__x").as("actual"))
    val naive = ser.select(col(keyCol), col("__h"), col("__x"))
      .join(ser.select(col(keyCol), (col("__h") + season).as("__h"),
        col("__x").as("__xp")), Seq(keyCol, "__h"))
      .join(ext, Seq(keyCol))
      .where(col("__h") < col("__hx"))
      .groupBy(col(keyCol))
      .agg(sum(abs(col("__x") - col("__xp"))).as("__sad"),
        count(lit(1)).as("__nsn"))
    fc
      .join(actual, Seq(keyCol))
      .join(naive, Seq(keyCol), "left_outer")
      .select(col(keyCol), col("n_train"), col("actual"), col("forecast_r"),
        graft.functions.Portable.pround(
          when(col("__nsn") > 0 && col("__sad") > 0,
            abs(col("forecast_r") - col("actual").cast("double"))
              / (col("__sad").cast("double") / col("__nsn").cast("double"))),
          4).as("mase_r"))
      .orderBy(keyCol)
  }

  def crossCorrelation(
      events: DataFrame,
      keyA: String,
      keyB: String,
      keyCol: String = "event_type",
      tsCol: String = "ts_t",
      maxLag: Int = 6): DataFrame = {
    require(maxLag >= 0, s"maxLag ($maxLag) must be >= 0")
    val ser = denseHourlySeries(
      events.where(col(keyCol).isin(keyA, keyB)), keyCol, tsCol)
    val x = ser.where(col(keyCol) === keyA).select(col("__h"), col("__x"))
    val y = ser.where(col(keyCol) === keyB)
      .select(col("__h").as("__hy"), col("__x").as("__y"))
    val lags = array((0 to maxLag).map(l => lit(l.toLong)): _*)
    val nD = col("n").cast("double")
    val dx = nD * col("__sxx").cast("double") -
      col("__sx").cast("double") * col("__sx").cast("double")
    val dy = nD * col("__syy").cast("double") -
      col("__sy").cast("double") * col("__sy").cast("double")
    val num = nD * col("__sxy").cast("double") -
      col("__sx").cast("double") * col("__sy").cast("double")
    x.select(col("__h"), col("__x"), explode(lags).as("lag"))
      .join(y, col("__hy") === col("__h") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"),
        sum(col("__x") * col("__y")).as("__sxy"))
      .select(col("lag"), col("n"),
        graft.functions.Portable.pround(
          when(dx > 0.0 && dy > 0.0, num / sqrt(dx * dy)), 6).as("r_r"))
      .orderBy("lag")
  }
}
