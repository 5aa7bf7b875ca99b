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

  test("rollingZscore: planted spike flagged, warm-up skipped, constant history safe") {
    // key 1: 12 steady points then a spike; key 2: constant values (zero
    // variance); key 3: too few points (all warm-up)
    val ev =
      (1 to 12).map(i => (1L, i.toLong, ts(f"2024-03-01 ${i}%02d:00:00"), 10.0 + (i % 3) * 0.1)) ++
      Seq((1L, 13L, ts("2024-03-01 13:00:00"), 99.0)) ++
      (1 to 11).map(i => (2L, 100L + i, ts(f"2024-03-01 ${i}%02d:00:00"), 5.0)) ++
      Seq((3L, 200L, ts("2024-03-01 01:00:00"), 1.0))
    val got = TimeSeries
      .rollingZscore(ev.toDF("user_id", "event_id", "ts_t", "value"), n = 10, thr = 3.0)
      .orderBy("user_id", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getInt(4)))
    // key 1 emits events 11..13 (first 10 are warm-up); 13 is the spike
    val k1 = got.filter(_._1 == 1L)
    assert(k1.map(_._2).toSeq == Seq(11L, 12L, 13L), s"warm-up rows must not emit: $k1")
    assert(k1.count(_._4 == 1) == 1 && k1.last._4 == 1 && k1.last._3 > 3.0,
      s"only the spike flags: $k1")
    // key 2: zero variance -> z = 0, never flagged
    val k2 = got.filter(_._1 == 2L)
    assert(k2.nonEmpty && k2.forall(r => r._3 == 0.0 && r._4 == 0), s"constant history: $k2")
    // key 3: never emits
    assert(!got.exists(_._1 == 3L), "all-warm-up key emits nothing")
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

  test("trending: lift ranks per hour, first bucket skipped, exact hand values") {
    // type a counts by hour: 10, 10, 30 -> lifts 1.0 then 3.0
    // type b counts by hour: 10, 20, 10 -> lifts 2.0 then 0.5
    def burst(t: String, h: Int, n: Int) =
      (1 to n).map(i => (t, ts(f"2024-03-01 $h%02d:${i % 60}%02d:00")))
    val ev = (burst("a", 1, 10) ++ burst("a", 2, 10) ++ burst("a", 3, 30) ++
      burst("b", 1, 10) ++ burst("b", 2, 20) ++ burst("b", 3, 10))
      .toDF("event_type", "ts_t")
    val got = TimeSeries.trending(ev, "ts_t", "event_type", k = 1)
      .orderBy("bucket")
      .collect().map(r => (r.getString(0).takeRight(2), r.getString(1), r.getDouble(4), r.getInt(5)))
    // hour 1 has no baseline for either key -> absent entirely
    assert(got.toSeq == Seq(("02", "b", 2.0, 1), ("03", "a", 3.0, 1)), s"got ${got.toSeq}")
  }

  test("seasonality: hod-driven stream reads strength 1, hod-independent variance reads 0") {
    import spark.implicits._
    def day(d: Int, h: Int, m: Int) = Timestamp.valueOf(f"2024-05-0$d $h%02d:$m%02d:00")
    // "sched": hod 0 always 2 events, hod 1 always 6 — zero within-hod
    // variance, all variance between hods -> strength 1, peak hod 1 mean 6
    val sched = (1 to 3).flatMap { d =>
      (0 until 2).map(m => ("sched", day(d, 0, m))) ++
        (0 until 6).map(m => ("sched", day(d, 1, m)))
    }
    // "flat": hod 0 days (1,3), hod 1 days (3,1) — hod means equal (2, 2),
    // SS_within == SS_total -> strength 0
    val flat =
      Seq.fill(1)(("flat", day(1, 0, 0))) ++ (0 until 3).map(m => ("flat", day(2, 0, m))) ++
        (0 until 3).map(m => ("flat", day(1, 1, m))) ++ Seq.fill(1)(("flat", day(2, 1, 0)))
    val got = TimeSeries.seasonality((sched ++ flat).toDF("event_type", "ts_t"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got("sched") == (6L, 1, 6.0, 1.0), s"got $got")
    assert(got("flat") == (4L, 0, 2.0, 0.0), s"got $got")
  }

  test("burstiness: constant rate reads Fano 0, a burst reads high, singletons drop") {
    import spark.implicits._
    def at(h: Int, m: Int) = Timestamp.valueOf(f"2024-05-01 $h%02d:$m%02d:00")
    val rows =
      (0 until 4).flatMap(h => (0 until 3).map(m => ("reg", at(h, m)))) ++     // 3,3,3,3
        (Seq(("burst", at(0, 0)), ("burst", at(1, 0))) ++
          (0 until 10).map(m => ("burst", at(2, m)))) ++                        // 1,1,10
        (0 until 5).map(m => ("single", at(0, m)))                              // one bucket
    val got = TimeSeries.burstiness(rows.toDF("event_type", "ts_t"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got("reg") == (4L, 12L, 3.0, 0.0, 0.0), s"got $got")
    // mean 4, var (102 − 48)/2 = 27, fano 6.75
    assert(got("burst") == (3L, 12L, 4.0, 27.0, 6.75), s"got $got")
    assert(!got.contains("single"), "variance undefined on one bucket")
  }

  private def pround(x: Double, dp: Int): Double = {
    val m = math.pow(10, dp)
    math.floor(x * m + 0.5) / m
  }

  /** Textbook sample ACF over a dense integer series. */
  private def refAcf(xs: Seq[Long], k: Int): Option[Double] = {
    val n = xs.size
    val m = xs.sum.toDouble / n
    val den = xs.map(x => (x - m) * (x - m)).sum
    if (den <= 0.0 || n <= k) None
    else Some((0 until n - k).map(i => (xs(i) - m) * (xs(i + k) - m)).sum / den)
  }

  test("denseHourlySeries zero-fills interior gaps per key") {
    val ev = Seq(
      ("a", ts("2024-03-01 10:10:00")), ("a", ts("2024-03-01 10:50:00")),
      ("a", ts("2024-03-01 13:05:00")), // 11:00 and 12:00 are gaps
      ("b", ts("2024-03-02 00:30:00")))
      .toDF("event_type", "ts_t")
    val got = TimeSeries.denseHourlySeries(ev)
      .orderBy("event_type", "__h")
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 2L), ("a", 0L), ("a", 0L), ("a", 1L), ("b", 1L)),
      s"got ${got.toSeq}")
  }

  test("acf fuzz: == the textbook r_k over the densified series, 15 random streams") {
    val rnd = new java.util.Random(140814L)
    val base = ts("2024-01-01 00:00:00").getTime
    for (case_ <- 0 until 15) {
      // random events inside a random hour span; some hours stay empty
      val span = 4 + rnd.nextInt(40)
      val ev = (0 until 20 + rnd.nextInt(120)).map { _ =>
        ("k", new Timestamp(base + rnd.nextInt(span).toLong * 3600000L
          + rnd.nextInt(3600000).toLong))
      }
      val got = TimeSeries.acf(ev.toDF("event_type", "ts_t"), maxLag = 3)
        .orderBy("lag").collect()
        .map(r => r.getLong(1) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      // densify exactly like the operator: hour counts over [min, max]
      val hours = ev.map(_._2.getTime / 3600000L)
      val (mn, mx) = (hours.min, hours.max)
      val cnt = hours.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val xs = (mn to mx).map(h => cnt.getOrElse(h, 0L))
      (1 to 3).foreach { k =>
        (refAcf(xs, k), got(k.toLong)) match {
          case (Some(want), Some(g)) =>
            assert(math.abs(g - pround(want, 6)) <= 2e-6,
              s"case $case_ lag $k: $g vs $want (n=${xs.size})")
          case (None, g) => assert(g.isEmpty, s"case $case_ lag $k: want NULL, got $g")
          case (want, None) => fail(s"case $case_ lag $k: got NULL, want $want")
        }
      }
    }
  }

  test("acf reads NULL on a constant (zero-variance) series") {
    val ev = (0 until 6).map(h =>
      ("c", new Timestamp(ts("2024-01-01 00:30:00").getTime + h * 3600000L)))
      .toDF("event_type", "ts_t")
    val got = TimeSeries.acf(ev, maxLag = 2).collect()
    assert(got.length == 2 && got.forall(_.isNullAt(3)),
      "constant series has no autocorrelation to measure")
  }

  test("periodogram: == the plain-Scala mirror; planted 24h cycle dominates the axis") {
    val base = ts("2024-01-01 00:00:00").getTime
    // 96 hours, count = 2 on the "day" half of each 24h cycle, 1 at night
    val counts = (0 until 96).map(t => if (t % 24 < 12) 2 else 1)
    val ev = counts.zipWithIndex.flatMap { case (c, t) =>
      (0 until c).map(_ => ("k", new Timestamp(base + t.toLong * 3600000L)))
    }.toDF("event_type", "ts_t")
    val periods = Seq(6, 8, 12, 24, 48)
    val got = TimeSeries.periodogram(ev, periods)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    // mirror: same dev/cos/sin/rounding pipeline on the dense counts
    val n = counts.size
    val mean = counts.map(_.toLong).sum.toDouble / n.toDouble
    def r6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val want = periods.map { p =>
      var (sc, ss) = (0L, 0L)
      counts.zipWithIndex.foreach { case (x, t) =>
        val a = 2 * math.Pi / p.toDouble * t.toDouble
        sc += r6((x.toDouble - mean) * math.cos(a))
        ss += r6((x.toDouble - mean) * math.sin(a))
      }
      val pw = ((sc.toDouble / 1e6) * (sc.toDouble / 1e6)
        + (ss.toDouble / 1e6) * (ss.toDouble / 1e6)) / n.toDouble
      p -> math.floor(pw * 1e4 + 0.5) / 1e4
    }.toMap
    periods.foreach(p => assert(got(p) == want(p), s"period $p: ${got(p)} vs ${want(p)}"))
    // the planted cycle carries the axis' dominant power
    assert(periods.filter(_ != 24).forall(p => got(24) > got(p)),
      s"24h must dominate: $got")
  }

  test("hurstRs: == the plain-Scala mirror on random gappy streams") {
    val rnd = new java.util.Random(140815L)
    val base = ts("2024-01-01 00:00:00").getTime
    for (case_ <- 0 until 6) {
      val span = 40 + rnd.nextInt(60)
      val ev = (0 until 80 + rnd.nextInt(200)).map { _ =>
        ("k", new Timestamp(base + rnd.nextInt(span).toLong * 3600000L
          + rnd.nextInt(3600000).toLong))
      }
      val sizes = Seq(4, 8, 16)
      val got = TimeSeries.hurstRs(ev.toDF("event_type", "ts_t"), sizes).collect().head
      // mirror: densify, full blocks, Z range / pop std, scaled-int fit
      val hours = ev.map(_._2.getTime / 3600000L)
      val (mn, mx) = (hours.min, hours.max)
      val cnt = hours.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val xs = (mn to mx).map(h => cnt.getOrElse(h, 0L))
      def r6(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong
      val ys = sizes.flatMap { sz =>
        val ls = xs.grouped(sz).filter(_.size == sz).toSeq.flatMap { b =>
          val s = b.sum; val ss = b.map(x => x * x).sum
          val zs = b.scanLeft(0L)(_ + _).tail.zipWithIndex.map { case (pref, i) =>
            pref.toDouble - (i + 1).toDouble * (s.toDouble / sz.toDouble)
          }
          val r = zs.max - zs.min
          val sd = math.sqrt((ss.toDouble - s.toDouble * (s.toDouble / sz.toDouble)) / sz.toDouble)
          if (sd > 0 && r > 0) Some(r6(math.log(r / sd))) else None
        }
        if (ls.isEmpty) None
        else Some(math.log(sz.toDouble) ->
          math.floor(ls.sum.toDouble / 1e6 / ls.size.toDouble * 1e6 + 0.5) / 1e6)
      }
      val k = ys.size
      if (k > 1) {
        val fx = ys.map(p => r6(p._1)).sum; val fy = ys.map(p => r6(p._2)).sum
        val fxy = ys.map(p => r6(p._1 * p._2)).sum; val fxx = ys.map(p => r6(p._1 * p._1)).sum
        val dxx = k.toDouble * (fxx.toDouble / 1e6) - (fx.toDouble / 1e6) * (fx.toDouble / 1e6)
        val want = math.floor((k.toDouble * (fxy.toDouble / 1e6)
          - (fx.toDouble / 1e6) * (fy.toDouble / 1e6)) / dxx * 1e4 + 0.5) / 1e4
        assert(got.getLong(1) == k.toLong && got.getDouble(2) == want,
          s"case $case_: $got vs ($k, $want)")
      } else assert(got.isNullAt(2), s"case $case_: want NULL, got $got")
    }
  }

  test("cusumChangepoint localizes a hand-built level shift exactly") {
    // key "s": hourly counts 1,1,1,5,5,5 → mean 3, S_t = (−2,−4,−6,−4,−2,0);
    // argmax |S| at t=3 (the last low hour), |S|=6
    val base = ts("2024-01-01 00:00:00").getTime
    val counts = Seq(1, 1, 1, 5, 5, 5)
    val ev = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => ("s", new Timestamp(base + h * 3600000L + i * 60000L)))
    }.toDF("event_type", "ts_t")
    val got = TimeSeries.cusumChangepoint(ev).collect().head
    assert(got.getLong(1) == 6L, "n_buckets")
    assert(got.getLong(2) == base / 3600000L + 2, s"cp at the third hour, got ${got.getLong(2)}")
    assert(got.getDouble(3) == 6.0, s"|S| at the argmax, got ${got.getDouble(3)}")
  }

  test("levelShift: hand-traced segment means and Welch t around the cusum argmax") {
    // counts 1,3,2,8,10,12: x̄=6, nS peaks (|−72|) at the third hour →
    // segments (1,3,2) vs (8,10,12): means 2/10, variances 1/4,
    // t = −8/√(1/3 + 4/3) = −6.196773… → −6.1968 at 4 dp
    val base = ts("2024-01-01 00:00:00").getTime
    val counts = Seq(1, 3, 2, 8, 10, 12)
    val ev = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => ("s", new Timestamp(base + h * 3600000L + i * 60000L)))
    }.toDF("event_type", "ts_t")
    val got = TimeSeries.levelShift(ev).collect().head
    assert(got.getLong(1) == base / 3600000L + 2, s"cp hour: ${got.getLong(1)}")
    assert((got.getLong(2), got.getLong(3)) == ((3L, 3L)), "segment sizes")
    assert((got.getDouble(4), got.getDouble(5)) == ((2.0, 10.0)), "segment means")
    assert(got.getDouble(6) == -6.1968, s"welch t: ${got.getDouble(6)}")
  }

  test("levelShift: zero-variance segments read t NULL, means still exact") {
    val base = ts("2024-01-01 00:00:00").getTime
    val ev = Seq(1, 1, 1, 5, 5, 5).zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => ("s", new Timestamp(base + h * 3600000L + i * 60000L)))
    }.toDF("event_type", "ts_t")
    val got = TimeSeries.levelShift(ev).collect().head
    assert((got.getDouble(4), got.getDouble(5)) == ((1.0, 5.0)), "means")
    assert(got.isNullAt(6), "zero combined variance has no t to report")
  }

  test("cusum fuzz: == the argmax of |prefix − t·mean| with earliest-t ties, 15 random streams") {
    val rnd = new java.util.Random(5150L)
    val base = ts("2024-02-01 00:00:00").getTime
    for (case_ <- 0 until 15) {
      val span = 3 + rnd.nextInt(30)
      val ev = (0 until 10 + rnd.nextInt(80)).map { _ =>
        ("k", new Timestamp(base + rnd.nextInt(span).toLong * 3600000L
          + rnd.nextInt(3600000).toLong))
      }
      val got = TimeSeries.cusumChangepoint(ev.toDF("event_type", "ts_t")).collect().head
      val hours = ev.map(_._2.getTime / 3600000L)
      val (mn, mx) = (hours.min, hours.max)
      val cnt = hours.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val xs = (mn to mx).map(h => cnt.getOrElse(h, 0L))
      val n = xs.size; val s1 = xs.sum
      val nS = xs.scanLeft(0L)(_ + _).tail.zipWithIndex
        .map { case (pre, i) => (n * pre - (i + 1) * s1, i) }
      val best = nS.minBy { case (v, i) => (-math.abs(v), i) }
      assert(got.getLong(2) == mn + best._2, s"case $case_: cp hour")
      assert(got.getDouble(3) == pround(math.abs(best._1).toDouble / n, 6),
        s"case $case_: magnitude")
    }
  }

  private def hourlyEvents(key: String, startHour: Long, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)((key, new Timestamp((startHour + i) * 3600000L)))
    }

  test("crossCorrelation: a 1-hour-shifted copy reads r=1 exactly at lag 1") {
    // click hours 0..5 = [1,2,3,1,2,3]; purchase hours 1..6 = same values
    // → y_{t+1} == x_t over the full 6-point overlap
    val ev = (hourlyEvents("click", 1000L, Seq(1, 2, 3, 1, 2, 3))
      ++ hourlyEvents("purchase", 1001L, Seq(1, 2, 3, 1, 2, 3)))
      .toDF("event_type", "ts_t")
    val got = TimeSeries.crossCorrelation(ev, "click", "purchase", maxLag = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((0L, 5L), (1L, 6L), (2L, 5L)),
      s"overlap sizes: ${got.toSeq}")
    assert(got(1)._3 == 1.0, s"lag-1 r: ${got.toSeq}")
    assert(got(0)._3 < 1.0 && got(2)._3 < 1.0, s"off-lags: ${got.toSeq}")
  }

  test("sesForecast equals the classic alpha=1/2 recursion exactly; window truncates") {
    // counts [4, 2, 6] hourly: l1=4, l2=3, l3=0.5·6+0.25·2+0.25·4 = 4.5
    val ev = hourlyEvents("a", 3000L, Seq(4, 2, 6)).toDF("event_type", "ts_t")
    val full = TimeSeries.sesForecast(ev).collect().head
    assert((full.getString(0), full.getLong(1), full.getDouble(2)) == (("a", 3L, 4.5)),
      s"full: $full")
    // window 2 uses only the last two points: 0.5·6 + 0.5·2 = 4
    val win = TimeSeries.sesForecast(ev, window = 2).collect().head
    assert((win.getLong(1), win.getDouble(2)) == ((2L, 4.0)), s"windowed: $win")
    // a single point forecasts itself
    val one = TimeSeries.sesForecast(
      hourlyEvents("b", 4000L, Seq(7)).toDF("event_type", "ts_t")).collect().head
    assert((one.getLong(1), one.getDouble(2)) == ((1L, 7.0)), s"single: $one")
  }

  test("maseBacktest: hand SES holdout error over the seasonal-naive MAE") {
    // [4,2,6,2,8]: holdout 8; SES over [4,2,6,2] = 3.25; season-2 naive
    // MAE over training = (|6−4| + |2−2|)/2 = 1 → MASE = 4.75
    val ev = hourlyEvents("a", 5000L, Seq(4, 2, 6, 2, 8)).toDF("event_type", "ts_t")
    val got = TimeSeries.maseBacktest(ev, season = 2).collect().head
    assert((got.getString(0), got.getLong(1), got.getLong(2), got.getDouble(3),
      got.getDouble(4)) == (("a", 4L, 8L, 3.25, 4.75)), s"$got")
    // two points: forecast = the lone training point, no naive baseline
    val short = TimeSeries.maseBacktest(
      hourlyEvents("b", 6000L, Seq(5, 7)).toDF("event_type", "ts_t"), season = 2)
      .collect().head
    assert((short.getLong(1), short.getLong(2), short.getDouble(3))
      == ((1L, 7L, 5.0)) && short.isNullAt(4), s"short: $short")
    // a single point has no training span at all: stream absent
    assert(TimeSeries.maseBacktest(
      hourlyEvents("c", 7000L, Seq(9)).toDF("event_type", "ts_t"), season = 2)
      .count() == 0)
  }

  test("crossCorrelation: zero-variance side reads NULL; empty overlaps are absent rows") {
    val ev = (hourlyEvents("click", 2000L, Seq(2, 2, 2))
      ++ hourlyEvents("purchase", 2000L, Seq(1, 2, 1)))
      .toDF("event_type", "ts_t")
    val got = TimeSeries.crossCorrelation(ev, "click", "purchase", maxLag = 5)
      .collect()
    // constant click series: every present lag has zero x-variance
    assert(got.forall(_.isNullAt(2)), s"constant series must read NULL: ${got.toSeq}")
    // purchase spans hours 2000-2002: lags 3+ have no overlap at all
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L), s"lags: ${got.toSeq}")
  }

  private def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6

  test("holtForecast: hand alpha=beta=1/2 recursion; window truncates; single point flat") {
    // [4,2,6,10]: l2=2,b2=-2; l3=3,b3=-0.5; l4=6.25,b4=1.375 -> forecast 7.625
    val ev = (hourlyEvents("a", 7000L, Seq(4, 2, 6, 10))
      ++ hourlyEvents("b", 7100L, Seq(7))).toDF("event_type", "ts_t")
    val got = TimeSeries.holtForecast(ev).orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("a", 4L, 6.25, 1.375, 7.625),
      ("b", 1L, 7.0, 0.0, 7.0)), s"${got.toSeq}")
    // window 2 sees only [6,10]: l=10, b=4 -> forecast 14
    val win = TimeSeries.holtForecast(ev, window = 2).orderBy("event_type").collect().head
    assert((win.getLong(1), win.getDouble(2), win.getDouble(3), win.getDouble(4))
      == ((2L, 10.0, 4.0, 14.0)), s"windowed: $win")
  }

  test("holtForecast fuzz: == the plain-Scala step-rounded recursion") {
    val rnd = new scala.util.Random(1515L)
    val series = (0 until 6).map(k => s"k$k" -> (0 until 2 + rnd.nextInt(12))
      .map(h => h.toLong -> (if (rnd.nextBoolean()) 0 else 1 + rnd.nextInt(20))).toMap)
    val ev = series.flatMap { case (key, m) =>
      m.toSeq.flatMap { case (h, c) => hourlyEvents(key, 11000L + h, Seq(c)) }
    }.toDF("event_type", "ts_t")
    val got = TimeSeries.holtForecast(ev, window = 8).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    series.foreach { case (key, m) =>
      // the dense spine spans OBSERVED hours only (a zero-count hour at
      // the edge emits no event, so it can't extend the span)
      val obs = m.filter(_._2 > 0)
      if (obs.isEmpty) assert(!got.contains(key), s"$key: no events must be absent")
      else {
        val dense = (obs.keys.min to obs.keys.max).map(h => m.getOrElse(h, 0).toLong)
        val win = dense.takeRight(8).map(_.toDouble)
        var (l, b) = (win.head, 0.0)
        win.drop(1).zipWithIndex.foreach { case (x, i) =>
          if (i == 0) { b = x - l; l = x }
          else {
            val l1 = r6(0.5 * x + 0.5 * (l + b))
            b = r6(0.5 * (l1 - l) + 0.5 * b)
            l = l1
          }
        }
        assert(got(key) == ((win.size.toLong, r6(l), r6(b), r6(l + b))),
          s"$key: ${got(key)} vs (${win.size}, ${r6(l)}, ${r6(b)}, ${r6(l + b)})")
      }
    }
  }
}
