package graft

import graft.operators.Journeys

/** [[Journeys.sessionTransitions]]: transitions are consecutive, session-
  * scoped, per-key; probabilities normalize per from_type.
  */
class JourneysSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60000000L // one minute in µs

  test("session boundary cuts the chain; probabilities normalize per from_type") {
    val ev = Seq(
      // user 1, session 1: A → B
      (1L, 1L, 0 * M, "A"), (2L, 1L, 1 * M, "B"),
      // 2-hour gap → session 2: C → D → E
      (3L, 1L, 121 * M, "C"), (4L, 1L, 122 * M, "D"), (5L, 1L, 123 * M, "E"),
      // user 2, one session: A → C
      (6L, 2L, 0 * M, "A"), (7L, 2L, 1 * M, "C")
    ).toDF("event_id", "user_id", "ts_us", "event_type")
    val got = Journeys.sessionTransitions(ev)
      .orderBy("from_type", "to_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("A", "B", 1L, 0.5),
      ("A", "C", 1L, 0.5),
      ("C", "D", 1L, 1.0),
      ("D", "E", 1L, 1.0)))
    // the B → C 2-hour gap produced NO transition
    assert(!got.exists(t => t._1 == "B"))
  }

  test("topPaths: sessions collapse to ordered paths; maxLen truncates; ties by path") {
    val ev = Seq(
      (1L, 1L, 0 * M, "A"), (2L, 1L, 1 * M, "B"),          // u1 s1: A > B
      (3L, 1L, 121 * M, "A"), (4L, 1L, 122 * M, "B"),      // u1 s2: A > B
      (5L, 2L, 0 * M, "A"), (6L, 2L, 1 * M, "C"),          // u2 s1: A > C
      (7L, 3L, 0 * M, "X"), (8L, 3L, 1 * M, "Y"), (9L, 3L, 2 * M, "Z") // u3: truncated
    ).toDF("event_id", "user_id", "ts_us", "event_type")
    val got = Journeys.topPaths(ev, k = 10, maxLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("A > B", 2L), ("A > C", 1L), ("X > Y", 1L)),
      s"got ${got.toSeq}")
  }

  test("dauWau: trailing-7-day distinct; weekly user lifts WAU but not DAU") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val day = 86400L * 1000000L
    // user 1 active days 1..10; user 2 only day 3
    val ev = ((1 to 10).map(d => (d.toLong, 1L, d * day)) ++ Seq((100L, 2L, 3 * day)))
      .toDF("event_id", "user_id", "us")
      .withColumn("ts_t", to_timestamp(col("us") / 1000000L))
    val got = Journeys.dauWau(ev)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(got.size == 10, "one row per active day")
    // epoch-day d renders as 1970-01-(d+1)
    val byDay = got.map(t => t._1.takeRight(2).toInt - 1 -> t).toMap
    assert(byDay(3)._2 == 2 && byDay(3)._3 == 2, "both users active day 3")
    assert(byDay(4)._2 == 1 && byDay(4)._3 == 2,
      "day 4: only user 1 active, but user 2's day-3 visit stays in the 7-day window")
    assert(byDay(10)._3 == 1, "user 2 aged out of the window by day 10")
    assert(byDay(10)._4 == 1.0, "single habitual user -> stickiness 1")
  }

  test("associationRules: hand-computed support/confidence/lift, both directions") {
    val baskets = Seq(
      (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z")
    ).toDF("bk", "item")
    val got = Journeys.associationRules(baskets, "bk", "item")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // N=3 baskets; n_x=3, n_y=2, n_z=1; pairs (x,y)=2, (x,z)=1
    assert(got(("x", "y")) == ((2L, 0.6667, 0.6667, 1.0)))
    assert(got(("y", "x")) == ((2L, 0.6667, 1.0, 1.0)))
    assert(got(("x", "z")) == ((1L, 0.3333, 0.3333, 1.0)))
    assert(got(("z", "x")) == ((1L, 0.3333, 1.0, 1.0)))
  }

  test("survivalCurve: censoring removes from at-risk without a churn event; KM product exact") {
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 10:00:00")
    // corpus end = 2024-01-31 (u4/u5's last day)
    val ev = Seq(
      (1L, t("2024-01-01")),                        // t=0, churned (30d before end)
      (2L, t("2024-01-01")), (2L, t("2024-01-11")), // t=10, churned (20d)
      (3L, t("2024-01-06")), (3L, t("2024-01-29")), // t=23, last 2d before end -> CENSORED
      (4L, t("2024-01-01")), (4L, t("2024-01-31")), // t=30, censored
      (5L, t("2024-01-31"))                         // t=0, censored
    ).toDF("user_id", "ts_t")
    val got = Journeys.survivalCurve(ev, censorDays = 7)
      .orderBy("t_days").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // S(0)=1-1/5=0.8; S(10)=0.8*(1-1/3)=0.533333; censored-only rows keep S
    assert(got.toSeq == Seq(
      (0, 5L, 1L, 0.8),
      (10, 3L, 1L, 0.533333),
      (23, 2L, 0L, 0.533333),
      (30, 1L, 0L, 0.533333)), got.toSeq.toString)
  }

  test("logRank: matches a plain-Scala mirror with the same md5 arms and op order") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 10:00:00")
    // 12 users, varied lifetimes 0..18d, corpus end from the data itself
    val spans = (1L to 12L).map { u =>
      val first = 1 + (u % 4).toInt
      val last  = first + (u % 7).toInt * 3
      (u, first, last)
    }
    val ev = spans.flatMap { case (u, f, l) =>
      Seq((u, ts(f"2024-01-$f%02d")), (u, ts(f"2024-01-$l%02d")))
    }.toDF("user_id", "ts_t")
    val got = Journeys.logRank(ev, censorDays = 7).collect().head

    // brute-force mirror: same arms (md5 first-8-hex parity), same rounding
    def arm(u: Long): Int = {
      val md  = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"arm:$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(8), 16) % 2).toInt
    }
    val end = spans.map(_._3).max
    val lts = spans.map { case (u, f, l) => (arm(u), l - f, end - l >= 7) }
    val byT = lts.groupBy(_._2).toSeq.sortBy(_._1).map { case (t, g) =>
      (t, g.size.toLong, g.count(_._1 == 1).toLong,
        g.count(_._3).toLong, g.count(x => x._3 && x._1 == 1).toLong)
    }
    def r6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    var (so, se, sv) = (0L, 0L, 0L)
    var (natAcc, n1Acc) = (0L, 0L)
    byT.reverse.foreach { case (_, nEnd, n1End, dAll, d1) =>
      natAcc += nEnd; n1Acc += n1End
      if (dAll > 0) {
        val (dD, nD, n1D) = (dAll.toDouble, natAcc.toDouble, n1Acc.toDouble)
        val e1 = dD * n1D / nD
        so += r6(d1.toDouble - e1)
        se += r6(e1)
        if (natAcc > 1)
          sv += r6(dD * (n1D / nD) * ((nD - n1D) / nD) * ((nD - dD) / (nD - 1.0)))
      }
    }
    val n1 = lts.count(_._1 == 1).toLong
    assert(got.getLong(0) == 12L && got.getLong(1) == n1 && got.getLong(2) == 12L - n1, got.toString)
    assert(got.getLong(3) == lts.count(x => x._3 && x._1 == 1).toLong, got.toString)
    assert(got.getDouble(4) == se.toDouble / 1e6, got.toString)
    if (sv > 0) {
      val chi2 = math.floor((so.toDouble / 1e6) * (so.toDouble / 1e6) / (sv.toDouble / 1e6) * 1e4 + 0.5) / 1e4
      assert(got.getDouble(5) == chi2, s"chi2: $got vs $chi2")
    } else assert(got.isNullAt(5), got.toString)
  }

  test("retentionCohorts: offsets anchor to each user's own first week") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // users 1,2 start week of Mon 2024-03-04; 1 returns +1wk and +2wk, 2 never
      (1L, t("2024-03-05 10:00:00")), (1L, t("2024-03-12 10:00:00")), (1L, t("2024-03-19 10:00:00")),
      (2L, t("2024-03-06 10:00:00")),
      // user 3 starts the NEXT week and returns +1wk — its offset-1 lands
      // in its own cohort row, not the first cohort's
      (3L, t("2024-03-13 10:00:00")), (3L, t("2024-03-20 10:00:00"))
    ).toDF("user_id", "ts_t")
    val got = Journeys.retentionCohorts(ev)
      .orderBy("cohort", "week_offset")
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-03-04", 0, 2L, 1.0),
      ("2024-03-04", 1, 1L, 0.5),
      ("2024-03-04", 2, 1L, 0.5),
      ("2024-03-11", 0, 1L, 1.0),
      ("2024-03-11", 1, 1L, 1.0)))
  }

  test("funnel: ordering is strict — a click BEFORE the first view does not convert") {
    val ev = Seq(
      // user 1: full ordered funnel in one session
      (1L, 1L, 0 * M, "view"), (2L, 1L, 1 * M, "click"), (3L, 1L, 2 * M, "purchase"),
      // user 2: click precedes the first view → stalls at stage 1
      (4L, 2L, 0 * M, "click"), (5L, 2L, 1 * M, "view"),
      // user 3: view only
      (6L, 3L, 0 * M, "view")
    ).toDF("event_id", "user_id", "ts_us", "event_type")
    val got = Journeys.funnel(ev, Seq("view", "click", "purchase"))
      .orderBy("stage_idx")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq(("view", 1, 3L), ("click", 2, 1L), ("purchase", 3, 1L)))
  }

  test("sessionNgrams: contiguous trigrams within one session; a gap breaks the run; support filters") {
    import java.sql.Timestamp
    def ev(id: Long, uid: Long, t: String, typ: String) =
      (id, uid, Timestamp.valueOf(t).getTime * 1000L, typ)
    // user 1: a,b,c,d in one session → trigrams (a,b,c), (b,c,d)
    // user 2: a,b then a 2h gap then c,d → NO trigram survives the gap
    val rows = Seq(
      ev(1, 1, "2024-01-01 10:00:00", "a"), ev(2, 1, "2024-01-01 10:05:00", "b"),
      ev(3, 1, "2024-01-01 10:10:00", "c"), ev(4, 1, "2024-01-01 10:15:00", "d"),
      ev(5, 2, "2024-01-01 10:00:00", "a"), ev(6, 2, "2024-01-01 10:05:00", "b"),
      ev(7, 2, "2024-01-01 12:30:00", "c"), ev(8, 2, "2024-01-01 12:35:00", "d"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val got = Journeys.sessionNgrams(rows, n = 3, minSupport = 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(("a", "b", "c", 1L), ("b", "c", "d", 1L)), s"got $got")
    assert(Journeys.sessionNgrams(rows, n = 3, minSupport = 2L).collect().isEmpty,
      "support 2 filters the singletons")
  }

  test("rfmSegments: hand-computed quantile scores on a 5-customer base") {
    import java.sql.Timestamp
    def o(ck: Long, d: String, total: Double) = (ck, Timestamp.valueOf(d + " 00:00:00"), total)
    val orders = Seq(
      o(1, "2020-01-10", 100.0),
      o(2, "2020-01-08", 200.0),
      o(3, "2020-01-06", 300.0),
      o(4, "2020-01-04", 400.0),
      o(5, "2020-01-02", 500.0), o(5, "2020-01-01", 100.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Journeys.rfmSegments(orders, asOf = "2020-01-11", buckets = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(7))).toMap
    // recencies 1,3,5,7,9 → r 5..1; freq 1×4/2×1 → f 1,1,1,1,5;
    // monetary 100..600 → m 1..5
    assert(got == Map(
      1L -> (1L, 1L, 100.0, 511L),
      2L -> (3L, 1L, 200.0, 412L),
      3L -> (5L, 1L, 300.0, 313L),
      4L -> (7L, 1L, 400.0, 214L),
      5L -> (9L, 2L, 600.0, 155L)), s"got $got")
  }

  test("markovStationary: absorbing state takes all the mass; uniform chain is a fixpoint") {
    import org.apache.spark.sql.functions.col
    // a → b, b → b: every round drains a (no inbound), mass settles on b
    val absorbing = Seq(("a", "b", 10L), ("b", "b", 5L)).toDF("from_type", "to_type", "n")
    val got1 = Journeys.markovStationary(absorbing, iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got1 == Map("a" -> 0.0, "b" -> 1.0), s"got $got1")
    // symmetric two-state chain: uniform is the exact quantized fixpoint
    val symmetric = Seq(("a", "b", 3L), ("b", "a", 3L)).toDF("from_type", "to_type", "n")
    val got2 = Journeys.markovStationary(symmetric, iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got2 == Map("a" -> 0.5, "b" -> 0.5), s"got $got2")
  }

  test("markovEntropyRate: fair coin chain reads ln 2; deterministic cycle reads 0") {
    val coin = Seq(("a", "a", 1L), ("a", "b", 1L), ("b", "a", 1L), ("b", "b", 1L))
      .toDF("from_type", "to_type", "n")
    val h1 = Journeys.markovEntropyRate(coin, iters = 4).collect().head
    assert(h1.getLong(0) == 2L && h1.getDouble(1) == 0.693147, s"fair coin: $h1")
    val cycle = Seq(("a", "b", 5L), ("b", "a", 5L)).toDF("from_type", "to_type", "n")
    val h2 = Journeys.markovEntropyRate(cycle, iters = 4).collect().head
    assert(h2.getDouble(1) == 0.0, s"deterministic cycle: $h2")
  }

  test("markovStationary fuzz: == the exact quantized BigInt replay on 12 random chains") {
    import org.apache.spark.sql.functions.col
    val rnd = new java.util.Random(31415L)
    def quantReplay(edges: Seq[(String, String, Long)], iters: Int): Map[String, Double] = {
      val rows = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val p6 = edges.map { case (f, t, n) =>
        (f, t, math.floor(n.toDouble / rows(f).toDouble * 1e6 + 0.5).toLong)
      }
      val states = (edges.map(_._1) ++ edges.map(_._2)).distinct
      var pi: Map[String, Long] =
        states.map(_ -> math.floor(1e6 / states.size.toDouble + 0.5).toLong).toMap
      for (_ <- 1 to iters) {
        val mass = p6.groupBy(_._2).view.mapValues(es =>
          es.map { case (f, _, p) => BigInt(pi(f)) * p }.sum).toMap
        pi = states.map(s => s ->
          mass.get(s).map(m => math.floor(m.toDouble / 1e6 + 0.5).toLong).getOrElse(0L)).toMap
      }
      val tot = pi.values.sum.toDouble
      pi.map { case (s, v) => s -> math.floor(v.toDouble / tot * 1e6 + 0.5) / 1e6 }
    }
    for (case_ <- 0 until 12) {
      val k = 2 + rnd.nextInt(4)
      val edges = (for {
        f <- 0 until k; t <- 0 until k
        if rnd.nextInt(3) > 0
      } yield (s"s$f", s"s$t", 1L + rnd.nextInt(20))).toSeq
      val covered = edges.map(_._1).distinct
      if (edges.nonEmpty && covered.size == k) { // every state emits: rows well-defined
        val iters = 1 + rnd.nextInt(6)
        val got = Journeys.markovStationary(
          edges.toDF("from_type", "to_type", "n"), iters)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(got == quantReplay(edges, iters), s"case $case_ (iters=$iters)")
      }
    }
  }

  test("shapleyAttribution: hand 2-channel game; efficiency axiom holds") {
    // v(∅)=0, v(A)=1, v(B)=0, v(AB)=1 → φ_A = 1, φ_B = 0
    val ev = Seq((1L, "A"), (1L, "buy"), (2L, "A"), (2L, "buy"),
      (3L, "B"), (4L, "x"), (5L, "A"), (5L, "B"), (5L, "buy"))
      .toDF("user_id", "event_type")
    val got = Journeys.shapleyAttribution(ev, Seq("A", "B"), "buy")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("A", 1.0), ("B", 0.0)), s"${got.toSeq}")
    // symmetric channels split the credit: both touch, both convert
    val sym = Seq((1L, "A"), (1L, "B"), (1L, "buy"), (2L, "A"), (2L, "B"))
      .toDF("user_id", "event_type")
    val gs = Journeys.shapleyAttribution(sym, Seq("A", "B"), "buy")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    // v(AB)=0.5, all other sets unobserved (0): φ_A = φ_B = 0.25
    assert(gs.toSeq == Seq(("A", 0.25), ("B", 0.25)), s"${gs.toSeq}")
  }

  test("uplift: hand 2x2 per cohort; empty control reads NULL") {
    // u1 click+buy, u2 click only, u3 buy only, u4 neither → one cohort:
    // pT = 1/2, pC = 1/2, uplift 0, z 0
    val ev = Seq((1L, "click"), (1L, "purchase"), (2L, "click"),
      (3L, "purchase"), (4L, "view")).toDF("user_id", "event_type")
    val got = Journeys.uplift(ev, "click", "purchase", cohorts = 1).collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4),
      got.getDouble(5), got.getDouble(6)) == ((2L, 1L, 2L, 1L, 0.0, 0.0)), s"$got")
    // everyone treated: control side empty → NULL uplift and z
    val all = Seq((1L, "click"), (2L, "click"), (2L, "purchase"))
      .toDF("user_id", "event_type")
    val g2 = Journeys.uplift(all, "click", "purchase", cohorts = 1).collect().head
    assert(g2.isNullAt(5) && g2.isNullAt(6), s"empty control: $g2")
    // a real lift: 3/3 treated convert, 0/3 control → uplift 1, z = 3/√1.5...
    val lift = (Seq((1L, "click"), (1L, "purchase"), (2L, "click"), (2L, "purchase"),
      (3L, "click"), (3L, "purchase")) ++ Seq((4L, "view"), (5L, "view"), (6L, "view")))
      .toDF("user_id", "event_type")
    val g3 = Journeys.uplift(lift, "click", "purchase", cohorts = 1).collect().head
    val den = 0.5 * 0.5 * (1.0 / 3.0 + 1.0 / 3.0)
    assert(g3.getDouble(5) == 1.0
      && g3.getDouble(6) == math.floor(1.0 / math.sqrt(den) * 1e6 + 0.5) / 1e6, s"$g3")
  }

  test("sessionConcurrency: hand sweep — simultaneous end/start nets out, hour-start flat carries") {
    // sessions (30-min close): u1 [0,30m), u2 [10m,40m), u6 [30m,60m),
    // u4 [50m,100m) (two events 20m apart = one session), u3 [65m,95m)
    val ev = Seq(
      (1L, 1L, 0L, "A"),
      (2L, 2L, 10 * M, "A"),
      (6L, 6L, 30 * M, "A"),  // starts exactly as u1's session closes: net 0
      (3L, 4L, 50 * M, "A"), (4L, 4L, 70 * M, "A"),
      (5L, 3L, 65 * M, "A")
    ).toDF("event_id", "user_id", "ts_us", "event_type")
    val got = Journeys.sessionConcurrency(ev)
      .orderBy("hour_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // hour 0 sweep: 1,2,2(net-0 tick),1,2 -> peak 2, 4 starts
    // hour 1: boundaries 60m(->1+carry... conc 1),65m(2),95m(1),100m(0);
    // flat at hour start = 2 -> peak 2, 1 start (u3)
    assert(got.toSeq == Seq((0L, 4L, 2L), (1L, 1L, 2L)), s"got: ${got.toSeq}")
    // drop u3: hour 1's boundary concurrencies are 1,0 but the hour-START
    // flat value is 2 — the peak must come from the carry, not a boundary
    val got2 = Journeys.sessionConcurrency(ev.where($"user_id" =!= 3L))
      .orderBy("hour_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got2.toSeq == Seq((0L, 4L, 2L), (1L, 0L, 2L)), s"flat carry: ${got2.toSeq}")
  }
}
