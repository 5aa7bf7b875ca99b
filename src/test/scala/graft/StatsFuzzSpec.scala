package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, Stats}

/** Randomized brute-force mirrors for the round-13 statistics: the
  * distributed chunked-prefix / integer-exact forms must equal the
  * obvious O(n²)/sort-everything in-memory computations on arbitrary
  * small inputs — ties, duplicates, skew and degenerate shapes included.
  */
class StatsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def pround(x: Double, dp: Int): Double = {
    val m = math.pow(10, dp)
    math.floor(x * m + 0.5) / m
  }

  test("rocAuc fuzz: == the pairwise P(s+ > s-) + half-ties count, 25 random sets") {
    val rnd = new java.util.Random(20260814L)
    for (case_ <- 0 until 25) {
      val n = 10 + rnd.nextInt(80)
      // small score domain forces heavy ties; occasional negative scores
      val rows = (0 until n).map { _ =>
        ((rnd.nextInt(9) - 2) / 4.0, if (rnd.nextBoolean()) 1 else 0)
      }
      val pos = rows.filter(_._2 == 1).map(_._1)
      val neg = rows.filter(_._2 == 0).map(_._1)
      val got = Stats.rocAuc(rows.toDF("score", "label"), "score", "label").collect().head
      if (pos.isEmpty || neg.isEmpty) {
        assert(got.isNullAt(2), s"case $case_: single-class must read NULL")
      } else {
        val u = (for (p <- pos; q <- neg)
          yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
        val want = pround(u / (pos.size.toDouble * neg.size), 6)
        assert(got.getDouble(2) == want,
          s"case $case_: got ${got.getDouble(2)}, brute force $want (P=${pos.size}, N=${neg.size})")
      }
    }
  }

  test("tCloseness fuzz: == the direct ordered-EMD over rationals, 20 random tables") {
    val rnd = new java.util.Random(7L)
    for (case_ <- 0 until 20) {
      val nGroups = 2 + rnd.nextInt(4)
      val domain  = 1 + rnd.nextInt(6)
      val rows = (0 until (20 + rnd.nextInt(100))).map { _ =>
        (s"g${rnd.nextInt(nGroups)}", rnd.nextInt(domain))
      }
      val got = Stats.tCloseness(rows.toDF("g", "v"), Seq("g"), "v", t = 0.15)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      // brute force: per class, EMD = sum |cum(p - q)| / (m - 1)
      val all = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val dom = all.keys.toSeq.sorted
      val n = rows.size.toDouble
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val cnt = rs.groupBy(_._2).view.mapValues(_.size).toMap
        val sz = rs.size.toDouble
        var cum = 0.0
        var s = 0.0
        dom.foreach { v =>
          cum += cnt.getOrElse(v, 0) / sz - all(v) / n
          s += math.abs(cum)
        }
        val want = if (dom.size > 1) pround(s / (dom.size - 1), 6) else 0.0
        val (gotN, gotE) = got(g)
        assert(gotN == rs.size, s"case $case_/$g size")
        // the engine computes |N·cumC − size·cumG|/(size·N) exactly; the
        // double mirror accumulates rounding — compare at 1e-9
        assert(math.abs(gotE - want) < 1e-6 + 1e-9,
          s"case $case_/$g: got $gotE, brute $want")
      }
    }
  }

  test("conformalCoverage fuzz: q-hat is the literal order statistic on 15 random score sets") {
    val rnd = new java.util.Random(99L)
    for (case_ <- 0 until 15) {
      val n = 40 + rnd.nextInt(200)
      val rows = (1 to n).map(i => (i.toLong, rnd.nextInt(20) / 20.0, rnd.nextInt(2)))
      val df = rows.toDF("id", "conf", "label")
      val got = Stats.conformalCoverage(df, "conf", "label", "id").collect().head
      val withSplit = df.select(col("id"),
        graft.functions.Portable.pround(abs(col("conf") - col("label")), 6).as("r"),
        (Sampling.sampleHash(col("id"), "conformal") < lit(Sampling.threshold(0.8))).as("cal"))
        .collect().map(r => (r.getDouble(1), r.getBoolean(2)))
      val calR  = withSplit.filter(_._2).map(_._1).sorted
      val evalR = withSplit.filterNot(_._2).map(_._1)
      val k = math.ceil((calR.length + 1) * (1.0 - 0.1)).toInt
      val qhat = if (k <= calR.length) calR(k - 1) else Double.PositiveInfinity
      assert(got.getLong(0) == calR.length && got.getLong(1) == evalR.length, s"case $case_ sizes")
      assert(got.getDouble(2) == qhat, s"case $case_: qhat ${got.getDouble(2)} != $qhat")
      if (evalR.nonEmpty) {
        val cov = pround(evalR.count(_ <= qhat).toDouble / evalR.length, 4)
        assert(got.getDouble(4) == cov, s"case $case_: coverage ${got.getDouble(4)} != $cov")
      }
    }
  }

  test("gainsTable fuzz: == the sort-and-slice lift chart, 15 random scored sets") {
    val rnd = new java.util.Random(4242L)
    for (case_ <- 0 until 15) {
      val n = 30 + rnd.nextInt(150)
      // coarse score domain → slice-boundary ties are the norm
      val rows = (0 until n).map { _ =>
        ((rnd.nextInt(21) - 5) / 10.0, if (rnd.nextInt(3) == 0) 1 else 0)
      }
      val got = Stats.gainsTable(rows.toDF("s", "y"), "s", "y", buckets = 10, chunkWidth = 0.3)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getDouble(7))).toMap
      // brute force: strictly-above counts, integer slice, running sums
      val above = rows.map(_._1).distinct.map { s =>
        s -> rows.count(_._1 > s).toLong
      }.toMap
      val byDec = rows.groupBy { case (s, _) => 10L * above(s) / n + 1 }
      val np = rows.count(_._2 == 1).toLong
      val decs = byDec.keys.toSeq.sorted
      decs.foreach { d =>
        val slice = byDec(d)
        val cumRows = decs.filter(_ <= d).flatMap(byDec)
        val (cn, cp) = (cumRows.size.toLong, cumRows.count(_._2 == 1).toLong)
        val lift =
          if (np > 0) pround((cp.toDouble / cn) / (np.toDouble / n), 4) else Double.NaN
        assert(got(d) == ((slice.size.toLong, slice.count(_._2 == 1).toLong, cn, cp, lift)),
          s"case $case_ decile $d: ${got(d)}")
      }
      assert(got.keySet == decs.toSet, s"case $case_: slices ${got.keySet} vs $decs")
    }
  }

  test("hillTail: mirror of the top-k log-ratio sum; flat top reads NULL") {
    val counts = Seq(("a", 8L), ("b", 4L), ("c", 4L), ("d", 2L), ("e", 1L), ("f", 1L))
    val got = Stats.hillTail(counts.toDF("g", "c"), "c", "g", k = 3).collect().head
    // top-4 = 8,4,4,2 → xk1 = 2; Σ ln = ln4 + ln2 + ln2 + ln1
    val want = pround(3.0 / (math.log(4.0) + math.log(2.0) + math.log(2.0)), 6)
    assert(got.getLong(0) == 3L && got.getDouble(1) == 2.0, s"k/xk1: $got")
    assert(got.getDouble(2) == want, s"alpha ${got.getDouble(2)} vs $want")
    val flat = Stats.hillTail(Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L))
      .toDF("g", "c"), "c", "g", k = 3).collect().head
    assert(flat.isNullAt(2), "a flat top has no measurable tail")
  }

  test("kruskalWallis fuzz: == the sort-everything rank ANOVA, 20 random tie-heavy tables") {
    val rnd = new java.util.Random(1414L)
    for (case_ <- 0 until 20) {
      val nGroups = 2 + rnd.nextInt(4)
      val domain  = 2 + rnd.nextInt(8) // tiny domain → heavy ties
      val rows = (0 until (20 + rnd.nextInt(120))).map { _ =>
        (s"g${rnd.nextInt(nGroups)}", rnd.nextInt(domain).toDouble)
      }
      val got = Stats.kruskalWallis(rows.toDF("g", "v"), "g", "v", chunkWidth = 2.0)
        .collect().head
      // brute force: pooled average ranks by sorting everything
      val n = rows.size
      val sorted = rows.map(_._2).sorted
      val rank = sorted.distinct.map { v =>
        val below = sorted.count(_ < v); val c = sorted.count(_ == v)
        v -> (below + (c + 1) / 2.0)
      }.toMap
      val byG = rows.groupBy(_._1)
      val sr = byG.values.map { rs =>
        val rg = rs.map(r => rank(r._2)).sum
        rg * rg / rs.size.toDouble
      }.sum
      val h = 12.0 / (n.toDouble * (n + 1).toDouble) * sr - 3.0 * (n + 1).toDouble
      val t = sorted.distinct.map { v =>
        val c = sorted.count(_ == v).toLong; c * c * c - c
      }.sum
      assert(got.getLong(0) == n && got.getLong(1) == byG.size, s"case $case_: n/k")
      assert(math.abs(got.getDouble(2) - pround(h, 6)) <= 2e-6,
        s"case $case_: h ${got.getDouble(2)} vs $h")
      if (t < n.toLong * n * n - n) {
        val hc = got.getDouble(2) / (1.0 - t.toDouble / (n.toDouble * n * n - n))
        assert(math.abs(got.getDouble(3) - pround(hc, 6)) <= 2e-6,
          s"case $case_: h_tie ${got.getDouble(3)} vs $hc")
      } else assert(got.isNullAt(3), s"case $case_: all-tied must read NULL")
    }
  }

  test("mannKendall fuzz: == the pairwise sign loop with tie-corrected variance, 20 random series") {
    val rnd = new java.util.Random(277L)
    for (case_ <- 0 until 20) {
      val nGroups = 1 + rnd.nextInt(3)
      val series = (0 until nGroups).map { g =>
        val m = 2 + rnd.nextInt(20)
        // small value domain → sign ties and tie-corrected variance
        s"g$g" -> (0 until m).map(t => (t.toLong, rnd.nextInt(5).toDouble))
      }.toMap
      val rows = series.toSeq.flatMap { case (g, s) => s.map { case (t, x) => (g, t, x) } }
      val got = Stats.mannKendall(rows.toDF("g", "t", "x"), "g", "t", "x")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      series.foreach { case (g, s) =>
        val m = s.size
        val sStat = (for (i <- s.indices; j <- i + 1 until m)
          yield math.signum(s(j)._2 - s(i)._2).toLong).sum
        val tt = s.groupBy(_._2).values.map(_.size.toLong)
          .map(c => c * (c - 1) * (2 * c + 5)).sum
        val vr = (m.toDouble * (m - 1).toDouble * (2 * m + 5).toDouble - tt.toDouble) / 18.0
        val (gn, gs, gz) = got(g)
        assert(gn == m && gs == sStat, s"case $case_/$g: n/s")
        if (vr > 0.0) {
          val z = if (sStat > 0) (sStat - 1).toDouble / math.sqrt(vr)
            else if (sStat < 0) (sStat + 1).toDouble / math.sqrt(vr) else 0.0
          assert(gz.contains(pround(z, 6)), s"case $case_/$g: z $gz vs $z")
        } else assert(gz.isEmpty, s"case $case_/$g: zero variance must read NULL")
      }
    }
  }

  test("theilSen fuzz: == the sorted-slope midpoint median, 20 random series") {
    val rnd = new java.util.Random(399L)
    for (case_ <- 0 until 20) {
      val nGroups = 1 + rnd.nextInt(3)
      val series = (0 until nGroups).map { g =>
        val m = 2 + rnd.nextInt(16)
        // duplicate x values → duplicate (incl. zero) slopes
        s"g$g" -> (0 until m).map(t => (t.toLong, rnd.nextInt(6).toDouble))
      }.toMap
      val rows = series.toSeq.flatMap { case (g, s) => s.map { case (t, x) => (g, t, x) } }
      val got = Stats.theilSen(rows.toDF("g", "t", "x"), "g", "t", "x")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      series.foreach { case (g, s) =>
        val slopes = (for (i <- s.indices; j <- i + 1 until s.size)
          yield (s(j)._2 - s(i)._2) / (s(j)._1 - s(i)._1).toDouble).sorted
        val m = slopes.size
        val med = if (m % 2 == 1) slopes(m / 2)
          else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
        val (gn, gp, gs) = got(g)
        assert(gn == s.size && gp == m, s"case $case_/$g: n/n_pairs")
        assert(gs == pround(med, 6), s"case $case_/$g: slope $gs vs $med")
      }
    }
  }
}
