package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** [[Stats.welchTTest]] and [[Stats.jsDivergence]]: textbook values on
  * hand-computed inputs, plus the identity / disjoint-support edges.
  */
class DriftStatsSpec extends SparkSpec {
  import spark.implicits._

  test("welchTTest reproduces the hand-computed unequal-variance example") {
    // A=[1,2,3]: m=2, v=1; B=[2,4,6,8]: m=5, v=20/3
    // se = 1/3 + 5/3 = 2 → t = −3/√2 = −2.1213…; Welch df = 4.0755 → 4.08
    val df = (Seq(("A", 1L), ("A", 2L), ("A", 3L)) ++
      Seq(("B", 2L), ("B", 4L), ("B", 6L), ("B", 8L))).toDF("g", "x")
    val r = Stats.welchTTest(df, "g", "x").collect().head
    assert(r.getAs[String]("g1") == "A" && r.getAs[String]("g2") == "B")
    assert(r.getAs[Long]("n1") == 3 && r.getAs[Long]("n2") == 4)
    assert(r.getAs[Double]("diff_r") == -3.0)
    assert(r.getAs[Double]("t_r") == -2.1213, s"t: ${r.getAs[Double]("t_r")}")
    assert(r.getAs[Double]("df_r") == 4.08, s"df: ${r.getAs[Double]("df_r")}")
  }

  test("welchTTest: identical groups give t = 0") {
    val df = (1 to 10).flatMap(i => Seq(("A", i.toLong), ("B", i.toLong))).toDF("g", "x")
    val r = Stats.welchTTest(df, "g", "x").collect().head
    assert(r.getAs[Double]("t_r") == 0.0 && r.getAs[Double]("diff_r") == 0.0)
  }

  test("jsDivergence: identical distributions → 0; disjoint vocabularies → ln 2") {
    val same = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")).toDF("g", "word")
    val r1 = Stats.jsDivergence(same, "g").collect().head
    assert(r1.getAs[Double]("jsd_r") == 0.0 && r1.getAs[Long]("n_shared") == 2)

    val disjoint = Seq(("A", "x"), ("A", "y"), ("B", "u"), ("B", "v")).toDF("g", "word")
    val r2 = Stats.jsDivergence(disjoint, "g").collect().head
    assert(r2.getAs[Long]("n_shared") == 0)
    assert(r2.getAs[Double]("jsd_r") == 0.693147, s"ln2: ${r2.getAs[Double]("jsd_r")}")
  }

  test("psi: identical halves read 0; a planted +50 shift trips the 0.25 drift bar") {
    val ref = (0 until 200).map(i => i % 100).toDF("v")
    val same = Stats.psi(ref, ref, "v", bins = 10).collect()
    assert(same.length == 10, "one row per bin")
    assert(same.head.getAs[Double]("psi_r") == 0.0, "identical → 0")
    assert(same.map(_.getAs[Int]("bin")).sorted.toSeq == (0 until 10))

    val cur = (0 until 200).map(i => i % 100 + 50).toDF("v")
    val drift = Stats.psi(ref, cur, "v", bins = 10).collect().head.getAs[Double]("psi_r")
    assert(drift > 0.25, s"a half-range shift must read as major drift, got $drift")
  }

  test("psi: a bin empty on one side stays finite via the Laplace smoothing") {
    val ref = (0 until 100).toDF("v")
    val cur = (0 until 100).map(_ => 1).toDF("v") // everything in the lowest bin
    val rows = Stats.psi(ref, cur, "v", bins = 10).collect()
    assert(rows.forall(r => !r.getAs[Double]("term_r").isNaN
      && !r.getAs[Double]("term_r").isInfinite), "no NaN/Inf terms")
    assert(rows.head.getAs[Double]("psi_r") > 1.0, "total collapse is extreme drift")
  }

  test("tokenEntropy: uniform four types → ln 4 / ppl 4; single type → 0 / 1") {
    val toks = (Seq("a", "b", "c", "d").flatMap(w => Seq(("u", w), ("u", w)))
      ++ Seq.fill(5)(("m", "x"))).toDF("source", "word")
    val got = Stats.tokenEntropy(toks, "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got("u") == (8L, 4L, 1.386294, 4.0), s"got $got")
    assert(got("m") == (5L, 1L, 0.0, 1.0), s"got $got")
  }

  test("dpNoisyCounts: deterministic replay, 1/eps noise scale, zero clamp") {
    val df = (Seq.fill(100)("big") ++ Seq.fill(1)("tiny")).toDF("g")
    val a = Stats.dpNoisyCounts(df, "g", eps = 1.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    val b = Stats.dpNoisyCounts(df, "g", eps = 1.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(a == b, "same salt → identical release (the rerun/oracle property)")
    assert(a.forall(_._4 >= 0.0), "released counts clamp at zero")
    // a different salt draws different noise; smaller eps scales it 1/eps
    val c = Stats.dpNoisyCounts(df, "g", eps = 1.0, salt = "other")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val a2 = a.map(t => t._1 -> t._3).toMap
    assert(c != a2, "salt changes the draw")
    val wide = Stats.dpNoisyCounts(df, "g", eps = 0.1)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    a2.foreach { case (g, n1) =>
      assert(math.abs(wide(g) - 10.0 * n1) < 1e-3, s"noise scales by 1/eps: $n1 vs ${wide(g)}")
    }
  }

  test("spearman: monotone-but-nonlinear reads 1, reversed reads -1, ties share mean ranks") {
    val mono = (1 to 50).map(i => (i.toDouble, math.exp(i / 10.0))).toDF("x", "y")
    assert(Stats.spearman(mono, "x", "y").collect().head.getDouble(1) == 1.0,
      "any monotone relation is rho 1 — the property Pearson lacks")
    val rev = (1 to 50).map(i => (i.toDouble, -i.toDouble)).toDF("x", "y")
    assert(Stats.spearman(rev, "x", "y").collect().head.getDouble(1) == -1.0)
    // tie block: x [1,2,2,3] / y [10,20,20,30] — tied pairs share mean
    // ranks on both axes, still a perfect monotone association
    val ties = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 30.0)).toDF("x", "y")
    val r = Stats.spearman(ties, "x", "y").collect().head
    assert(r.getLong(0) == 4 && r.getDouble(1) == 1.0, s"got $r")
  }

  test("spearman: NULL in either column drops the PAIR; ranks come from the paired subset") {
    // x has a null, y has a null on a different row — both rows must be
    // excluded before EITHER column is ranked, so the result equals
    // spearman over the pre-filtered pairs (the r12 form ranked each
    // column over all its non-null rows, so a row dropped by the OTHER
    // column still shifted every rank)
    val raw = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 5.0), (2.0, null), (null, 7.0), (3.0, 9.0), (4.0, 11.0), (5.0, 20.0))
      .toDF("x", "y")
    val filtered = raw.where(col("x").isNotNull && col("y").isNotNull)
    val got  = Stats.spearman(raw, "x", "y").collect().head
    val want = Stats.spearman(filtered, "x", "y").collect().head
    assert(got.getLong(0) == 4, s"4 complete pairs, got ${got.getLong(0)}")
    assert(got == want, s"nullable input must rank over the paired subset: $got vs $want")
    assert(got.getDouble(1) == 1.0, "the complete pairs are monotone")
  }

  test("welchTTest: singleton groups are dropped, never poisoning pairs with NaN variance") {
    val df = ((1 to 5).map(i => ("a", 10L + i)) ++ (1 to 5).map(i => ("b", 20L + 2 * i))
      ++ Seq(("solo", 99L))).toDF("g", "x")
    val rows = Stats.welchTTest(df, "g", "x").collect()
    val groups = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).toSet
    assert(!groups.contains("solo"), "an n=1 group has no sample variance and must be dropped")
    assert(rows.length == 1, s"only (a, b) survives: ${rows.mkString(", ")}")
    rows.foreach { r =>
      assert(!r.getDouble(5).isNaN && !r.getDouble(6).isNaN, s"t/df must be finite: $r")
    }
  }

  test("degenerate inputs don't crash under ANSI mode: constant groups / constant columns") {
    // two constant groups: se1+se2 = 0, t's denominator is 0 — under
    // ANSI the raw division THROWS; the pair must be dropped instead
    val const = (Seq.fill(4)(("a", 10L)) ++ Seq.fill(4)(("b", 20L)) ++
      (1 to 4).map(i => ("c", 30L + i))).toDF("g", "x")
    val pairs = Stats.welchTTest(const, "g", "x").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(!pairs.contains(("a", "b")), "zero-combined-variance pair must be dropped")
    assert(pairs == Set(("a", "c"), ("b", "c")), s"variance-carrying pairs survive: $pairs")
    // constant column: zero rank variance, rho undefined — NULL, not a throw
    val flat = (1 to 20).map(i => (5.0, i.toDouble)).toDF("x", "y")
    val r = Stats.spearman(flat, "x", "y").collect().head
    assert(r.getLong(0) == 20 && r.isNullAt(1), s"rho must be NULL on a constant column: $r")
  }

  test("conformalCoverage == the literal k-th order statistic recomputed from the same split") {
    import graft.operators.Sampling
    val scored = (1 to 300).map(i => (i.toLong, (i % 100) / 100.0, if (i % 3 == 0) 1 else 0))
      .toDF("id", "conf", "label")
    val got = Stats.conformalCoverage(scored, "conf", "label", "id").collect().head
    // independent replay: same hash split, residuals sorted, k-th smallest
    val withR = scored.select(col("id"),
      graft.functions.Portable.pround(abs(col("conf") - col("label")), 6).as("r"),
      (Sampling.sampleHash(col("id"), "conformal") < lit(Sampling.threshold(0.8))).as("cal"))
      .collect().map(r => (r.getDouble(1), r.getBoolean(2)))
    val calR  = withR.filter(_._2).map(_._1).sorted
    val evalR = withR.filterNot(_._2).map(_._1)
    val k     = math.ceil((calR.length + 1) * (1.0 - 0.1)).toInt
    val qhat  = calR(k - 1)
    val cov   = math.floor(evalR.count(_ <= qhat).toDouble / evalR.length * 1e4 + 0.5) / 1e4
    assert(got.getLong(0) == calR.length && got.getLong(1) == evalR.length)
    assert(got.getDouble(2) == qhat, s"qhat: got ${got.getDouble(2)}, want $qhat")
    assert(got.getDouble(4) == cov, s"coverage: got ${got.getDouble(4)}, want $cov")
    assert(got.getDouble(3) == 0.9 && got.getDouble(4) >= 0.8,
      "coverage should sit near the 1-alpha target")
  }

  test("bootstrapMeanCi: rerun-identical, constant group collapses to a zero-width interval") {
    val df = ((1 to 100).map(i => (i.toLong, "var", (i % 37).toLong))
      ++ (101 to 140).map(i => (i.toLong, "const", 7L))).toDF("id", "g", "v")
    def run() = Stats.bootstrapMeanCi(df, "g", "v", "id", b = 32)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val a = run(); val bb = run()
    assert(a == bb, "deterministic draws: identical intervals on rerun")
    val (n, m, lo, hi) = a("const")
    assert(n == 40 && m == 7.0 && lo == 7.0 && hi == 7.0,
      s"constant values: every replica mean is 7 -> zero-width CI, got ${a("const")}")
    val (nv, mv, lov, hiv) = a("var")
    assert(lov <= mv && mv <= hiv && lov < hiv,
      s"variable group: mean inside a positive-width interval, got ${a("var")}")
  }

  test("diffInDiff: hand-built parallel-trends case isolates exactly the treatment bump") {
    // control: 10 -> 14 (trend +4); treated: 20 -> 29 (trend +4, bump +5)
    // naive before/after on treated reads +9; DiD reads the bump: +5
    val rows =
      Seq.fill(3)((0, 0, 10.0)) ++ Seq.fill(5)((0, 1, 14.0)) ++
        Seq.fill(4)((1, 0, 20.0)) ++ Seq.fill(2)((1, 1, 29.0))
    val r = Stats.diffInDiff(rows.toDF("treated", "post", "v"), "treated", "post", "v")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == (3L, 5L, 4L, 2L))
    assert(r.getAs[Double]("m_11_r") == 29.0 && r.getAs[Double]("m_00_r") == 10.0)
    assert(r.getAs[Double]("did_r") == 5.0, s"got ${r.getAs[Double]("did_r")}")
  }

  test("cupedAdjust: perfect covariate removes all variance; independent one removes none") {
    // y = 2x + 3 exactly: rho^2 = 1 -> var_adj 0, reduction 1, theta 2
    val perfect = (1 to 20).map(i => (i.toDouble, 2.0 * i + 3.0)).toDF("x", "y")
    val p = Stats.cupedAdjust(perfect, "x", "y").collect().head
    assert(p.getAs[Double]("theta_r") == 2.0 && p.getAs[Double]("var_adj_r") == 0.0
      && p.getAs[Double]("reduction_r") == 1.0, s"got $p")
    // constant covariate: theta 0, adjusted variance == raw variance
    val flat = (1 to 20).map(i => (5.0, i.toDouble)).toDF("x", "y")
    val f = Stats.cupedAdjust(flat, "x", "y").collect().head
    assert(f.getAs[Double]("theta_r") == 0.0
      && f.getAs[Double]("var_adj_r") == f.getAs[Double]("var_y_r")
      && f.getAs[Double]("reduction_r") == 0.0, s"got $f")
  }

  test("minDetectableEffect: hand-computed MDE; bigger groups detect smaller effects") {
    // group a: 1..9 -> n=9, mean 5, var 7.5; mde = 2.8016*sqrt(15/9)
    val df = ((1 to 9).map(i => ("a", i.toLong))
      ++ (1 to 36).map(i => ("b", (i % 9 + 1).toLong))).toDF("g", "x")
    val got = Stats.minDetectableEffect(df, "g", "x")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val z = 1.959963984540054 + 0.8416212335729142
    val wantA = math.floor(z * math.sqrt(2.0 * 7.5 / 9) * 1e4 + 0.5) / 1e4
    assert(got("a") == (9L, 5.0, 7.5, wantA), s"got ${got("a")}, want mde $wantA")
    // 4x the rows (same distribution): MDE halves
    assert(got("b")._4 < got("a")._4 / 1.9, s"got $got")
  }

  test("qqDrift: identical snapshots read zero delta; a +50 shift reads +50 everywhere") {
    val ref = (0 to 100).toDF("v")
    val same = Stats.qqDrift(ref, ref, "v").collect()
    assert(same.length == 9 && same.forall(_.getDouble(3) == 0.0))
    assert(same.find(_.getInt(0) == 5).get.getDouble(1) == 50.0, "median of 0..100")
    val cur = (0 to 100).map(_ + 50).toDF("v")
    val shift = Stats.qqDrift(ref, cur, "v").collect()
    assert(shift.forall(_.getDouble(3) == 50.0), "uniform shift moves every decile by 50")
  }

  test("benford: digits via integer string math, shares vs the law, chi2 rides rows") {
    val df = Seq(1.00, 1.50, 2.00, 9.99, 0.005, 123.45).toDF("v") // 0.005 → below 0.01 cutoff? no: |0.005|<0.01 dropped
    val rows = Stats.benford(df, "v").collect()
    val byDigit = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit == Map(1 -> 3L, 2 -> 1L, 9 -> 1L), s"got $byDigit") // 1.00,1.50,123.45 → 1
    assert(rows.map(_.getDouble(2)).sum == 1.0, "shares sum to 1")
    assert(rows.map(_.getDouble(4)).distinct.length == 1, "chi2 constant across rows")
    val exp1 = rows.find(_.getInt(0) == 1).get.getDouble(3)
    assert(exp1 == 0.30103, s"expected share of digit 1: $exp1") // log10(2) rounded 6dp
  }

  test("fdCheck and inclusionCheck: hand-built hold/violate cases") {
    val fd = Seq((1, "a"), (1, "a"), (2, "b"), (2, "c")).toDF("l", "r")
    val f = Stats.fdCheck(fd, "l", "r").collect().head
    assert(f.getString(0) == "l -> r" && f.getLong(1) == 2 && f.getLong(2) == 1
      && f.getInt(3) == 0, s"got $f")
    val ok = Stats.fdCheck(Seq((1, "a"), (2, "b")).toDF("l", "r"), "l", "r").collect().head
    assert(ok.getInt(3) == 1)

    val a = Seq(1, 2, 3).toDF("x"); val b = Seq(1, 2).toDF("y")
    val i = Stats.inclusionCheck(a, "x", b, "y").collect().head
    assert(i.getString(0) == "x <= y" && i.getLong(1) == 3 && i.getLong(2) == 1
      && i.getInt(3) == 0, s"got $i")
    val j = Stats.inclusionCheck(b, "y", a, "x").collect().head
    assert(j.getLong(2) == 0 && j.getInt(3) == 1)
  }

  test("jsDivergence: hand-computed half-overlap value") {
    // p = {x: 1/2, y: 1/2}, q = {x: 1/2, z: 1/2}
    // shared x: p=q → term 0; y,z each contribute ½·½·ln2 → jsd = ½ln2
    val df = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "z")).toDF("g", "word")
    val r = Stats.jsDivergence(df, "g").collect().head
    assert(r.getAs[Long]("n_shared") == 1)
    assert(r.getAs[Double]("jsd_r") == 0.346574, s"½ln2: ${r.getAs[Double]("jsd_r")}")
  }

  test("mcnemar: hand-computed discordant cells and continuity-corrected chi2; no discordance reads NULL") {
    // 4 A-only-right rows, 1 B-only-right, 1 both-right, 1 both-wrong:
    //   b=4, c=1 → χ² = (|4−1|−1)²/5 = 0.8; acc_a = 5/7, acc_b = 2/7
    val rows = (Seq.fill(4)((1, 0, 1)) ++ Seq((0, 1, 1), (1, 1, 1), (0, 0, 1)))
      .toDF("pa", "pb", "y")
    val got = Stats.mcnemar(rows, "pa", "pb", "y").collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((7L, 4L, 1L)), s"cells: $got")
    assert(got.getDouble(3) == 0.7143 && got.getDouble(4) == 0.2857, s"accs: $got")
    assert(got.getDouble(5) == 0.8, s"chi2: $got")
    // identical predictions: zero discordant pairs, test undefined
    val same = Seq((1, 1, 1), (0, 0, 1), (1, 1, 0)).toDF("pa", "pb", "y")
    assert(Stats.mcnemar(same, "pa", "pb", "y").collect().head.isNullAt(5))
  }

  test("randomizedResponse: deterministic replay, mass conserved, p→1 collapses to the truth") {
    val rows = ((0 until 120).map(i => (i.toLong, "en"))
      ++ (120 until 180).map(i => (i.toLong, "fr"))
      ++ (180 until 200).map(i => (i.toLong, "de"))).toDF("id", "lang")
    val a = Stats.randomizedResponse(rows, "id", "lang", p = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    val b = Stats.randomizedResponse(rows, "id", "lang", p = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    assert(a == b, "md5 coins must replay identically")
    assert(a.map(_._2).sum == 200L && a.map(_._3).sum == 200L,
      "both the true and released tables partition the corpus")
    assert(a.exists(r => r._2 != r._3),
      "p=0.5 must actually perturb this skewed corpus")
    // Σπ̂ telescopes to 1 exactly in rationals; only rounding remains
    assert(math.abs(a.map(_._5).sum - 1.0) < 1e-5, s"estimates sum to 1: $a")
    // near-certain keep: released == truth, estimate == true share
    val tight = Stats.randomizedResponse(rows, "id", "lang", p = 0.9999)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(tight.forall(r => r._2 == r._3), "p=0.9999 keeps every row on this corpus")
    tight.foreach(r => assert(math.abs(r._5 - r._4) < 1e-3,
      s"de-bias must collapse to the true share: $r"))
  }

  test("wilcoxonSignedRank: distinct-rank hand case") {
    // d = [1,−2,3,−4,5,6]: ranks 1..6, W+ = 1+3+5+6 = 15
    // μ = 10.5, σ² = 6·7·13/24 = 22.75 → z = 4.5/√22.75 = 0.9435
    val df = Seq(1L, -2L, 3L, -4L, 5L, 6L).toDF("d")
    val r = Stats.wilcoxonSignedRank(df, "d").collect().head
    assert(r.getLong(0) == 6 && r.getLong(1) == 0, s"counts: $r")
    assert(r.getDouble(2) == 15.0, s"w_plus: $r")
    assert(r.getDouble(3) == 0.9435, s"z: $r")
  }

  test("wilcoxonSignedRank: zeros dropped, ties get average ranks and the variance correction") {
    // d = [0, 2, −2, 3, 3]: n=4, |2|-block avg rank 1.5, |3|-block 3.5
    // W+ = 1.5 + 3.5 + 3.5 = 8.5; Σ(t³−t) = 12 → σ² = 7.5 − 0.25 = 7.25
    // z = 3.5/√7.25 = 1.2999
    val df = Seq(0L, 2L, -2L, 3L, 3L).toDF("d")
    val r = Stats.wilcoxonSignedRank(df, "d").collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 1, s"counts: $r")
    assert(r.getDouble(2) == 8.5, s"w_plus: $r")
    assert(r.getDouble(3) == 1.2999, s"z: $r")
    // chunk boundaries must not change ranks: force one value per chunk
    val narrow = Stats.wilcoxonSignedRank(df, "d", chunkWidth = 1.0).collect().head
    assert(narrow == r, s"chunking changed the statistic: $narrow vs $r")
  }

  test("targetEncodeLoo: each row sees only the OTHER rows' mean, shrunk to the prior") {
    // X=[1,3], Y=[10], m=1 → prior=14/3; enc(X,1)=(4−1+14/3)/2,
    // enc(X,3)=(4−3+14/3)/2, enc(Y,10)=(10−10+14/3)/1 = prior exactly
    val df = Seq((1L, "X", 1L), (2L, "X", 3L), (3L, "Y", 10L)).toDF("id", "cat", "x")
    val got = Stats.targetEncodeLoo(df, "cat", "x", smoothing = 1.0)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("enc_r")))
    val prior = 14.0 / 3.0
    def p6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got.toSeq == Seq(
      (1L, p6((4.0 - 1.0 + 1.0 * prior) / (2.0 - 1.0 + 1.0))),
      (2L, p6((4.0 - 3.0 + 1.0 * prior) / (2.0 - 1.0 + 1.0))),
      (3L, p6((10.0 - 10.0 + 1.0 * prior) / (1.0 - 1.0 + 1.0)))), s"${got.toSeq}")
    // a lone row in its category reads exactly the prior: no self-leak
    assert(got(2)._2 == p6(prior), "singleton category must read the prior")
  }

  test("woeIv: ln3 hand table; a zero cell reads NULL for both WOE and IV") {
    // bin0: 3 good/1 bad, bin1: 1 good/3 bad, G=B=4 → woe = ±ln3,
    // iv = (3/4−1/4)·ln3 both bins
    val df = Seq((0L, true), (0L, true), (0L, true), (0L, false),
      (1L, true), (1L, false), (1L, false), (1L, false)).toDF("bin", "good")
    def p6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = Stats.woeIv(df, "bin", "good").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val ln3 = p6(math.log(3.0 * 4.0 / (1.0 * 4.0)))
    assert(got.toSeq == Seq(
      (0L, 4L, 3L, 1L, ln3, p6((3.0 / 4.0 - 1.0 / 4.0) * ln3)),
      (1L, 4L, 1L, 3L, p6(math.log(1.0 * 4.0 / (3.0 * 4.0))),
        p6((1.0 / 4.0 - 3.0 / 4.0) * p6(math.log(1.0 * 4.0 / (3.0 * 4.0)))))),
      s"${got.toSeq}")
    val zc = Stats.woeIv(Seq((0L, true), (0L, true), (1L, true), (1L, false))
      .toDF("bin", "good"), "bin", "good").orderBy("bin").collect()
    assert(zc(0).isNullAt(4) && zc(0).isNullAt(5), s"zero-cell bin: ${zc.toSeq}")
    assert(!zc(1).isNullAt(4), s"clean bin unaffected: ${zc.toSeq}")
  }

  test("kendallTau: monotone reads ±1; ties hit the tau-b denominator; all-tied NULL") {
    def p6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val mono = (1 to 4).map(i => ("g", i.toLong, i.toLong, i.toLong)).toDF("g", "k", "x", "y")
    val up = Stats.kendallTau(mono, "g", "k", "x", "y").collect().head
    assert((up.getLong(1), up.getLong(2), up.getLong(3), up.getDouble(4))
      == ((4L, 6L, 0L, 1.0)), s"monotone: $up")
    val anti = (1 to 4).map(i => ("g", i.toLong, i.toLong, (5 - i).toLong)).toDF("g", "k", "x", "y")
    assert(Stats.kendallTau(anti, "g", "k", "x", "y").collect().head.getDouble(4) == -1.0)
    // x=[1,1,2] vs y=[1,2,3]: C=2, tx=1 → τ = 2/√6
    val tied = Seq(("g", 1L, 1L, 1L), ("g", 2L, 1L, 2L), ("g", 3L, 2L, 3L))
      .toDF("g", "k", "x", "y")
    val t = Stats.kendallTau(tied, "g", "k", "x", "y").collect().head
    assert(t.getDouble(4) == p6(2.0 / math.sqrt((3.0 - 1.0) * (3.0 - 0.0))), s"tied: $t")
    val flat = Seq(("g", 1L, 5L, 1L), ("g", 2L, 5L, 2L)).toDF("g", "k", "x", "y")
    assert(Stats.kendallTau(flat, "g", "k", "x", "y").collect().head.isNullAt(4))
  }

  test("theilDecomposition: hand two-group split; decomposition identity holds") {
    def p6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // A=[1,1], B=[2]: within terms are all ln(1)=0; between carries it all
    val df = Seq(("A", 1L), ("A", 1L), ("B", 2L)).toDF("g", "x")
    val got = Stats.theilDecomposition(df, "g", "x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("A", 2L, 0.5, 0.0, p6(0.5 * math.log(2.0 * 3.0 / (4.0 * 2.0)))),
      ("B", 1L, 0.5, 0.0, p6(0.5 * math.log(2.0 * 3.0 / (4.0 * 1.0))))),
      s"${got.toSeq}")
    // identity: Σ share·T_g + Σ between == direct T (to rounding)
    val direct = 2.0 * (0.25 * math.log(1.0 * 3.0 / 4.0)) + 0.5 * math.log(2.0 * 3.0 / 4.0)
    val recon = got.map(r => r._3 * r._4 + r._5).sum
    assert(math.abs(recon - direct) < 1e-5, s"identity: $recon vs $direct")
    // zero-valued units are excluded, not ln(0)
    val withZero = df.unionAll(Seq(("A", 0L)).toDF("g", "x"))
    assert(Stats.theilDecomposition(withZero, "g", "x").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("A", 2L), ("B", 1L)))
  }

  test("mutualInformation: perfect predictor reads MI = H = ln2, nmi 1; independence reads 0") {
    def p6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val perfect = (Seq.fill(5)(("p", true)) ++ Seq.fill(5)(("q", false))).toDF("f", "y")
    val g1 = Stats.mutualInformation(perfect, Seq("f"), "y").collect().head
    assert((g1.getString(0), g1.getLong(1)) == (("f", 2L)), s"$g1")
    assert(g1.getDouble(2) == p6(math.log(2.0)) && g1.getDouble(3) == 1.0, s"$g1")
    val indep = (for { x <- Seq("p", "q"); y <- Seq(true, false); _ <- 1 to 3 }
      yield (x, y)).toDF("f", "y")
    val g2 = Stats.mutualInformation(indep, Seq("f"), "y").collect().head
    assert(g2.getDouble(2) == 0.0 && g2.getDouble(3) == 0.0, s"independent: $g2")
    // constant label: nothing to explain — nmi NULL, MI 0
    val const = Seq(("p", true), ("q", true)).toDF("f", "y")
    val g3 = Stats.mutualInformation(const, Seq("f"), "y").collect().head
    assert(g3.getDouble(2) == 0.0 && g3.isNullAt(3), s"constant: $g3")
  }

  test("srmCheck: balanced split passes, a broken assignment trips the tripwire") {
    val balanced = (0 until 100).map(i => Tuple1(i.toLong % 4)).toDF("b")
    val ok = Stats.srmCheck(balanced, "b", k = 4).collect().head
    assert(ok.getLong(1) == 100 && ok.getDouble(2) == 0.0 && !ok.getBoolean(4),
      s"balanced: $ok")
    // all mass in bucket 0 (buckets 1-3 spined in as zeros):
    // χ² = 225 + 3·25 = 300
    val broken = (0 until 100).map(_ => Tuple1(0L)).toDF("b")
    val bad = Stats.srmCheck(broken, "b", k = 4).collect().head
    assert(bad.getDouble(2) == 300.0, s"chi2: $bad")
    val c1 = 1.0 - 2.0 / (9.0 * 3.0)
    val c2 = math.sqrt(2.0 / (9.0 * 3.0))
    val zExp = math.floor((math.cbrt(300.0 / 3.0) - c1) / c2 * 1e4 + 0.5) / 1e4
    assert(bad.getDouble(3) == zExp && bad.getBoolean(4), s"z: $bad vs $zExp")
  }

  test("bestSplit: clean separation reads gain 0.5; gain ties break to the smaller threshold") {
    // x=[1,1,2,2], y=[1,1,0,0]: split at 1 is pure → gain = 0.5 (max
    // value 2 is excluded — empty right side)
    val clean = Seq((1L, true), (1L, true), (2L, false), (2L, false)).toDF("x", "y")
    val c = Stats.bestSplit(clean, "x", "y").collect().head
    assert((c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3), c.getDouble(4))
      == ((4L, 1L, 2L, 2L, 0.5)), s"clean: $c")
    // x=[1,1,2,2,3,3], y=[1,1,1,0,0,0]: v=1 and v=2 both gain 0.25 →
    // threshold tiebreak picks 1
    val tie = Seq((1L, true), (1L, true), (2L, true), (2L, false),
      (3L, false), (3L, false)).toDF("x", "y")
    val t = Stats.bestSplit(tie, "x", "y").collect().head
    assert((t.getLong(1), t.getDouble(4)) == ((1L, 0.25)), s"tie: $t")
    // chunk boundaries must not change the winner
    val narrow = Stats.bestSplit(tie, "x", "y", chunkWidth = 1.0).collect().head
    assert(narrow == t, s"chunking changed the split: $narrow vs $t")
  }

  test("friedman: textbook chi2=4; ties use average ranks; incomplete blocks drop") {
    // two identical blocks ranking A<B<C: χ² = 12/(2·3·4)·56 − 24 = 4
    val noTies = Seq(
      ("b1", "A", 1L), ("b1", "B", 2L), ("b1", "C", 3L),
      ("b2", "A", 1L), ("b2", "B", 2L), ("b2", "C", 3L)).toDF("blk", "trt", "x")
    val r = Stats.friedman(noTies, "blk", "trt", "x").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 3L, 4.0)), s"$r")
    // block2 ties B=C at rank 2.5: A−C = 3.5, Σdev² = 6.5 → χ² = 13/3.5
    val ties = Seq(
      ("b1", "A", 1L), ("b1", "B", 2L), ("b1", "C", 3L),
      ("b2", "A", 1L), ("b2", "B", 5L), ("b2", "C", 5L)).toDF("blk", "trt", "x")
    val rt = Stats.friedman(ties, "blk", "trt", "x").collect().head
    assert(rt.getDouble(2) == math.floor(2.0 * 6.5 / 3.5 * 1e4 + 0.5) / 1e4, s"ties: $rt")
    // an incomplete block (missing C) must not perturb the statistic
    val extra = ties.unionAll(Seq(("b3", "A", 9L), ("b3", "B", 1L)).toDF("blk", "trt", "x"))
    val re = Stats.friedman(extra, "blk", "trt", "x").collect().head
    assert(re == rt, s"incomplete block leaked in: $re vs $rt")
  }

  test("normTwoSidedP: A&S tail matches the textbook quantiles; p(0)=1 to 6 figures") {
    val z = Seq(0.0, 1.959964, 2.575829, 1.0).toDF("z")
      .select(col("z"), graft.functions.Portable.normTwoSidedP(col("z")).as("p"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(math.abs(z(0.0) - 1.0) < 1e-6, s"p(0): ${z(0.0)}")
    assert(math.abs(z(1.959964) - 0.05) < 1e-5, s"p(1.96): ${z(1.959964)}")
    assert(math.abs(z(2.575829) - 0.01) < 1e-5, s"p(2.58): ${z(2.575829)}")
    assert(math.abs(z(1.0) - 0.317311) < 1e-5, s"p(1): ${z(1.0)}")
  }

  test("twoProportionZ: symmetric two-group hand case") {
    // A: 8/10, B: 2/10 → pooled 0.5, se = √0.05, z_A = 0.6/√0.05
    val df = (Seq.fill(8)(("A", true)) ++ Seq.fill(2)(("A", false))
      ++ Seq.fill(2)(("B", true)) ++ Seq.fill(8)(("B", false))).toDF("g", "ok")
    val got = Stats.twoProportionZ(df, "g", "ok").orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val zExp = math.floor((0.8 - 0.2) / math.sqrt(0.5 * 0.5 * (0.1 + 0.1)) * 1e6 + 0.5) / 1e6
    assert(got.toSeq == Seq(("A", 10L, 8L, zExp), ("B", 10L, 2L, -zExp)), s"${got.toSeq}")
  }

  test("bhAdjust: step-up rescues a locally-failing p when a later rank passes") {
    // q=0.1, m=3: crits [0.0333, 0.0667, 0.1]; p=[0.01, 0.09, 0.1] —
    // rank 2 fails ITS criterion but rank 3 passes, so ALL are rejected
    val up = Seq(("a", 0.01), ("b", 0.09), ("c", 0.1)).toDF("g", "p")
    val got = Stats.bhAdjust(up, "p", "g", q = 0.1).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("rank"), r.getAs[Boolean]("rejected")))
    assert(got.toSeq == Seq(("a", 1, true), ("b", 2, true), ("c", 3, true)), s"${got.toSeq}")
    // kmax=2 case: [0.01, 0.02, 0.2, 0.9] at q=0.1 rejects exactly 2
    val mid = Seq(("a", 0.01), ("b", 0.02), ("c", 0.2), ("d", 0.9)).toDF("g", "p")
    val g2 = Stats.bhAdjust(mid, "p", "g", q = 0.1).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Boolean]("rejected")))
    assert(g2.toSeq == Seq(("a", true), ("b", true), ("c", false), ("d", false)),
      s"${g2.toSeq}")
    // nothing passes: rejected is all-false, not NULL
    val none = Stats.bhAdjust(Seq(("a", 0.5), ("b", 0.9)).toDF("g", "p"), "p", "g", q = 0.1)
      .collect().map(_.getAs[Boolean]("rejected"))
    assert(none.toSeq == Seq(false, false), s"${none.toSeq}")
  }

  test("cramersV: perfect association reads 1, independence reads 0, 1×c reads NULL") {
    val perfect = (Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("y", "q"))).toDF("a", "b")
    val p = Stats.cramersV(perfect, "a", "b").collect().head
    assert((p.getLong(0), p.getLong(1), p.getLong(2)) == ((10L, 2L, 2L)), s"$p")
    assert(p.getDouble(3) == 10.0 && p.getDouble(4) == 1.0, s"perfect: $p")
    val indep = (for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 3 }
      yield (a, b)).toDF("a", "b")
    val i = Stats.cramersV(indep, "a", "b").collect().head
    assert(i.getDouble(3) == 0.0 && i.getDouble(4) == 0.0, s"independent: $i")
    val flat = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val f = Stats.cramersV(flat, "a", "b").collect().head
    assert(f.isNullAt(4) && f.getDouble(3) == 0.0, s"1xc: $f")
  }

  test("anovaOneWay: textbook two-group F; degenerate inputs read NULL") {
    // A=[1,2,3], B=[4,5,6]: SSB=13.5, SSW=4 → F = 13.5/(4/4) = 13.5,
    // η² = 13.5/17.5 = 0.7714
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("B", 4L), ("B", 5L), ("B", 6L))
      .toDF("g", "x")
    val r = Stats.anovaOneWay(df, "g", "x").collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 6, s"sizes: $r")
    assert(r.getDouble(2) == 13.5, s"F: $r")
    assert(r.getDouble(3) == 0.7714, s"eta2: $r")
    // one group: F undefined, zero between-group mass; zero within-group
    // variance: F undefined, η²=1
    val one = Stats.anovaOneWay(Seq(("A", 1L), ("A", 2L)).toDF("g", "x"), "g", "x")
      .collect().head
    assert(one.isNullAt(2) && one.getDouble(3) == 0.0, s"single group: $one")
    val sep = Stats.anovaOneWay(Seq(("A", 1L), ("A", 1L), ("B", 2L), ("B", 2L))
      .toDF("g", "x"), "g", "x").collect().head
    assert(sep.isNullAt(2) && sep.getDouble(3) == 1.0, s"separated: $sep")
  }

  test("olsDiagnostics: == plain-Scala mirror; alternating residuals push DW above 2") {
    val pts = Seq((1L, 10.0), (2L, 13.0), (3L, 12.0), (4L, 17.0), (5L, 14.0), (6L, 19.0))
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val got = Stats.olsDiagnostics(df, "g", "x", "y").collect().head
    // mirror with the exact op order and rounding ladder
    def r(v: Double, n: Int): Double = { val f = math.pow(10, n); math.floor(v * f + 0.5) / f }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val dxx = n * sxx - sx * sx
    val b = r((n * sxy - sx * sy) / dxx, 6)
    val a = r((sy - b * sx) / n, 6)
    val es = pts.map { case (x, y) => r(y - (a + b * x.toDouble), 6) }
    val eis = es.map(e => math.floor(e * 1e6 + 0.5).toLong)
    val sd = eis.sliding(2).map { case Seq(p, c) => (c - p) * (c - p) }.sum
    val se2 = eis.map(ei => ei * ei).sum
    val dw = r(sd.toDouble / se2.toDouble, 4)
    val s2 = se2.toDouble / 1e12 / (n - 2.0)
    val cooks = pts.zip(es).map { case ((x, _), e) =>
      val h = 1.0 / n + (x.toDouble - sx / n) * (x.toDouble - sx / n) / (sxx - sx * (sx / n))
      (r(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6), x)
    }
    val (cm, cx) = cooks.max
    assert(got.getLong(1) == 6L && got.getDouble(2) == b, got.toString)
    assert(got.getDouble(3) == dw && dw > 2.0, s"DW: $got vs $dw")
    assert(got.getDouble(4) == cm && got.getLong(5) == cx, s"cook: $got vs ($cm, $cx)")
  }

  test("cmhTest: crafted Simpson reversal — both strata flip vs the aggregate; mirror ==") {
    // S1: x 2/8 vs nx 1/8; S2: x 4/5 vs nx 19/27 — x better in BOTH
    // strata, worse in the collapsed table (6/13 vs 20/35)
    val tab = Seq(
      ("S1", true, true, 2), ("S1", true, false, 6), ("S1", false, true, 1), ("S1", false, false, 7),
      ("S2", true, true, 4), ("S2", true, false, 1), ("S2", false, true, 19), ("S2", false, false, 8))
    val df = tab.flatMap { case (s, x, y, n) => Seq.fill(n)((s, x, y)) }.toDF("s", "x", "y")
    val got = Stats.cmhTest(df, "s", "x", "y").collect().head
    def r(v: Double, n: Int): Double = { val f = math.pow(10, n); math.floor(v * f + 0.5) / f }
    def i6(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong
    val strata = tab.groupBy(_._1).view.mapValues { g =>
      def cnt(x: Boolean, y: Boolean) = g.find(t => t._2 == x && t._3 == y).get._4.toLong
      (cnt(true, true), cnt(true, false), cnt(false, true), cnt(false, false))
    }.toMap
    var (se, sv, son, sod) = (0L, 0L, 0L, 0L)
    strata.values.foreach { case (a, b, c, d) =>
      val (n1, n0, m1, m0) = ((a + b).toDouble, (c + d).toDouble, (a + c).toDouble, (b + d).toDouble)
      val td = (a + b + c + d).toDouble
      se += i6(n1 * m1 / td)
      sv += i6(n1 * n0 * m1 * m0 / (td * td * (td - 1.0)))
      son += i6(a.toDouble * d.toDouble / td)
      sod += i6(b.toDouble * c.toDouble / td)
    }
    val at = strata.values.map(_._1).sum
    val num = at.toDouble - se.toDouble / 1e6
    val chi2 = r(num * num / (sv.toDouble / 1e6), 4)
    val or = r((son.toDouble / 1e6) / (sod.toDouble / 1e6), 4)
    assert(got.getLong(0) == 2 && got.getLong(1) == 48 && got.getLong(2) == at, got.toString)
    assert(got.getDouble(3) == chi2, s"chi2: $got vs $chi2")
    assert(got.getDouble(4) == or, s"or: $got vs $or")
    assert(got.getDouble(5) < 0.0, s"aggregate says x worse: $got")
    assert(got.getLong(6) == 2L, s"both strata flip: $got")
  }

  test("brownForsythe: hand-computed F on w = 2|x - median|; degenerate inputs NULL") {
    // A=[1,2,3,10] medA=2.5 -> w=[3,1,1,15]; B=[4,5,6] medB=5 -> w=[2,0,2]
    // ANOVA on w: t1=24 t2=244 bg=100+16/3 -> F = 0.831 (4dp)
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 10L),
      ("B", 4L), ("B", 5L), ("B", 6L)).toDF("g", "x")
    val r = Stats.brownForsythe(df, "g", "x").collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 7, s"sizes: $r")
    assert(r.getDouble(2) == 0.831, s"F: $r")
    // one group: F undefined
    val one = Stats.brownForsythe(Seq(("A", 1L), ("A", 5L)).toDF("g", "x"), "g", "x")
      .collect().head
    assert(one.isNullAt(2), s"single group: $one")
    // all deviations zero (constant groups): SSW=0 and SSB=0 -> NULL
    val const = Stats.brownForsythe(Seq(("A", 1L), ("A", 1L), ("B", 9L), ("B", 9L))
      .toDF("g", "x"), "g", "x").collect().head
    assert(const.isNullAt(2), s"constant groups: $const")
    // mirrored deviation patterns: group z-means equal -> F = 0 exactly
    val same = Stats.brownForsythe(
      Seq(("A", 0L), ("A", 2L), ("A", 3L), ("B", 10L), ("B", 12L), ("B", 13L))
        .toDF("g", "x"), "g", "x").collect().head
    assert(same.getDouble(2) == 0.0, s"equal spread: $same")
  }

  test("yulesK: hand fof profile; a no-repeat vocabulary reads exactly 0") {
    val tok = (Seq.fill(3)(("A", "a")) ++ Seq(("A", "b")) ++
      Seq(("B", "x"), ("B", "y"), ("B", "z"))).toDF("source", "word")
    val got = Stats.yulesK(tok, "source")
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // A: f = {a:3, b:1} -> N=4, S2=10, K = 1e4*(10-4)/16 = 3750
    // B: all hapax -> S2 = N -> K = 0 exactly
    assert(got.toSeq == Seq(("A", 4L, 2L, 1L, 3750.0), ("B", 3L, 3L, 3L, 0.0)),
      s"got: ${got.toSeq}")
  }

  test("jarqueBera: == exact BigInt anchored-moment mirror; symmetric data reads skew 0") {
    val rnd = new java.util.Random(20260815L)
    def mirror(xs: Seq[Long]): (Double, Double, Double, Double) = {
      def r(v: Double, n: Int): Double = { val f = math.pow(10, n); math.floor(v * f + 0.5) / f }
      val n = xs.size
      val mu = math.floor(xs.map(BigInt(_)).sum.toDouble / n + 0.5).toLong
      def m(k: Int) = xs.map(x => BigInt(x - mu).pow(k)).sum.toDouble / n
      val (c, r2, r3, r4) = (m(1), m(2), m(3), m(4))
      val m2 = r2 - c * c
      val m3 = r3 - 3.0 * c * r2 + 2.0 * c * c * c
      val m4 = r4 - 4.0 * c * r3 + 6.0 * c * c * r2 - 3.0 * c * c * c * c
      val sk = r(m3 / (m2 * math.sqrt(m2)), 6)
      val ku = r(m4 / (m2 * m2), 6)
      val jb = r(n / 6.0 * (sk * sk + (ku - 3.0) * (ku - 3.0) / 4.0), 4)
      (sk, ku, jb, r(math.exp(-jb / 2.0), 6))
    }
    for (case_ <- 0 until 15) {
      val n = 8 + rnd.nextInt(60)
      // lognormal-ish skew with occasional spikes
      val xs = (0 until n).map(_ =>
        (math.exp(rnd.nextGaussian() * 1.5 + 4) + rnd.nextInt(3)).toLong)
      val got = Stats.jarqueBera(xs.map(("G", _)).toDF("g", "x"), "g", "x").collect().head
      val (sk, ku, jb, p) = mirror(xs)
      assert(got.getDouble(2) == sk && got.getDouble(3) == ku,
        s"case $case_: got $got, mirror ($sk, $ku)")
      assert(got.getDouble(4) == jb && got.getDouble(5) == p,
        s"case $case_: got $got, mirror jb=$jb p=$p")
    }
    // exactly symmetric around an integer mean: m3 = 0 -> skew 0.0
    val sym = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 1L, 7L, 2L, 6L)
    val s = Stats.jarqueBera(sym.map(("G", _)).toDF("g", "x"), "g", "x").collect().head
    assert(s.getDouble(2) == 0.0, s"symmetric skew: $s")
    // constant group (m2 = 0) and tiny group (n < 8) read NULL stats
    val degen = Stats.jarqueBera(
      (Seq.fill(10)(("C", 5L)) ++ Seq(("T", 1L), ("T", 9L))).toDF("g", "x"), "g", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(degen("C").isNullAt(2) && degen("C").isNullAt(5), s"constant: ${degen("C")}")
    assert(degen("T").isNullAt(2), s"n<8: ${degen("T")}")
  }

  test("randomizationTest: == md5-replay mirror; a planted separation reads the floor p") {
    def u(salt: String, rep: Int, id: Long): Double = {
      // four 8-hex uniforms per digest: reps 4m..4m+3 read the four
      // disjoint 8-hex windows of md5(salt:m:id) — the operator's
      // quad-draw scheme (r16: was 2 × 13 hex)
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s"$salt:${rep / 4}:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.slice((rep % 4) * 8, (rep % 4) * 8 + 8), 16)
        .toDouble / 4294967296.0
    }
    def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
    val rnd = new java.util.Random(99L)
    val rows = (0L until 120L).map(i => (i, rnd.nextBoolean(), rnd.nextInt(1000).toLong))
    val got = Stats.randomizationTest(
      rows.toDF("id", "t", "x"), "t", "x", "id", b = 16, salt = "sp").collect().head
    // in-memory mirror of the whole pipeline
    val n = rows.size
    val nt = rows.count(_._2)
    val dObs = r6(rows.filter(_._2).map(_._3).sum.toDouble / nt
      - rows.filterNot(_._2).map(_._3).sum.toDouble / (n - nt))
    val frac = nt.toDouble / n
    val diffs = (0 until 16).flatMap { rep =>
      val (tr, ct) = rows.partition(row => u("sp", rep, row._1) < frac)
      if (tr.isEmpty || ct.isEmpty) None
      else Some(r6(tr.map(_._3).sum.toDouble / tr.size - ct.map(_._3).sum.toDouble / ct.size))
    }
    val nExt = diffs.count(d => math.abs(d) >= math.abs(dObs))
    assert(got.getLong(0) == n && got.getLong(1) == nt, s"sizes: $got")
    assert(got.getDouble(2) == dObs, s"diff_obs: $got vs $dObs")
    assert(got.getLong(3) == diffs.size && got.getLong(4) == nExt, s"replicas: $got vs $nExt")
    assert(got.getDouble(5) == r6((nExt + 1).toDouble / (diffs.size + 1)), s"p: $got")
    // planted separation: treated 1000s vs control 0s — no Bernoulli
    // relabeling reproduces the gap, p sits at the 1/(b+1) floor
    val sep = (0L until 100L).map(i => (i, i < 50, if (i < 50) 1000L else 0L))
    val gotSep = Stats.randomizationTest(
      sep.toDF("id", "t", "x"), "t", "x", "id", b = 32, salt = "sp").collect().head
    assert(gotSep.getDouble(2) == 1000.0, s"planted gap: $gotSep")
    assert(gotSep.getLong(4) == 0L &&
      gotSep.getDouble(5) == r6(1.0 / (gotSep.getLong(3) + 1).toDouble),
      s"floor p: $gotSep")
  }

  test("randomizationTest: a single-arm observed sample fails fast") {
    // n_treat = n and n_treat = 0 both raise at execution — there is no
    // label shuffle on one arm, and a silent null diff would read as a
    // meaningless p
    for (allTreated <- Seq(true, false)) {
      val rows = (0L until 20L).map(i => (i, allTreated, i * 10L)).toDF("id", "t", "x")
      val ex = intercept[Exception] {
        Stats.randomizationTest(rows, "t", "x", "id", b = 8, salt = "sp").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("one arm is empty")),
        s"allTreated=$allTreated: ${msgs(ex)}")
    }
  }

  test("postStratifiedAte: hand confounded strata — adjustment recovers the true effect") {
    // stratum A: treat-heavy with high base outcome, stratum B the
    // reverse; within EACH stratum the treatment adds exactly +10, but
    // the raw diff is inflated by the composition imbalance
    val rows =
      (1 to 3).map(_ => (true, 110L, "A")) ++ Seq((false, 100L, "A")) ++
        Seq((true, 20L, "B")) ++ (1 to 3).map(_ => (false, 10L, "B"))
    val got = Stats.postStratifiedAte(rows.toDF("t", "x", "g"), "t", "x", "g")
      .collect().head
    // raw: treated mean (330+20)/4 = 87.5, control (100+30)/4 = 32.5 -> 55
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getDouble(3), got.getDouble(4))
      == ((8L, 2L, 2L, 55.0, 10.0)), s"$got")
  }

  test("postStratifiedAte: single-arm strata drop and weights renormalize; all-single-arm reads NULL") {
    // stratum C has no control: it must not contribute; A/B weights
    // renormalize over the remaining 8 rows
    val rows =
      (1 to 3).map(_ => (true, 110L, "A")) ++ Seq((false, 100L, "A")) ++
        Seq((true, 20L, "B")) ++ (1 to 3).map(_ => (false, 10L, "B")) ++
        Seq((true, 999L, "C"), (true, 888L, "C"))
    val got = Stats.postStratifiedAte(rows.toDF("t", "x", "g"), "t", "x", "g")
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getDouble(4))
      == ((10L, 3L, 2L, 10.0)), s"$got")
    // every stratum single-arm: ate NULL, raw diff still defined
    val degen = Stats.postStratifiedAte(
      Seq((true, 5L, "A"), (false, 3L, "B")).toDF("t", "x", "g"), "t", "x", "g")
      .collect().head
    assert(degen.getLong(2) == 0L && degen.isNullAt(4) && degen.getDouble(3) == 2.0,
      s"degen: $degen")
  }

  test("ebShrinkRates: small groups shrink toward the grand rate, big groups barely move") {
    def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
    // rates 0.2/0.4/0.6 at n=100 plus a 1/1 = 100% singleton: the
    // singleton must move far toward the prior mean, the n=100 groups
    // barely
    val rows =
      (1 to 100).map(i => ("a", if (i <= 20) 1L else 0L)) ++
        (1 to 100).map(i => ("b", if (i <= 40) 1L else 0L)) ++
        (1 to 100).map(i => ("c", if (i <= 60) 1L else 0L)) ++
        Seq(("d", 1L))
    val got = Stats.ebShrinkRates(rows.toDF("g", "y"), "g", "y")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // mirror: p6 = 200000, 400000, 600000, 1000000
    val p6 = Seq(200000L, 400000L, 600000L, 1000000L)
    val gn = 4.0
    val m = p6.sum.toDouble / (gn * 1e6)
    val v = (p6.map(p => p.toDouble * p).sum / 1e12
      - (p6.sum / 1e6) * (p6.sum / 1e6) / gn) / (gn - 1.0)
    val ab = m * (1 - m) / v - 1.0
    val (a, b) = (r6(m * ab), r6((1 - m) * ab))
    def shrunk(k: Long, n: Long) = r6((k + a) / (n + a + b))
    assert(got.toSeq == Seq(
      ("a", 100L, 20L, 0.2, shrunk(20, 100)),
      ("b", 100L, 40L, 0.4, shrunk(40, 100)),
      ("c", 100L, 60L, 0.6, shrunk(60, 100)),
      ("d", 1L, 1L, 1.0, shrunk(1, 1))), s"got: ${got.toSeq}")
    // qualitative shrinkage geometry
    val byG = got.map(r => r._1 -> r).toMap
    assert(math.abs(byG("d")._5 - m) < math.abs(1.0 - m) * 0.6,
      s"singleton must shrink far toward m=$m: ${byG("d")}")
    assert(math.abs(byG("a")._5 - 0.2) < 0.05, s"n=100 group barely moves: ${byG("a")}")
  }

  test("ebShrinkRates: zero across-group variance reads NULL prior, shrunk == raw") {
    val rows = (1 to 10).flatMap(_ => Seq(("a", 1L), ("a", 0L), ("b", 1L), ("b", 0L)))
    val got = Stats.ebShrinkRates(rows.toDF("g", "y"), "g", "y")
      .orderBy("g").collect()
    got.foreach { r =>
      assert(r.isNullAt(5) && r.isNullAt(6) && r.getDouble(3) == 0.5
        && r.getDouble(4) == 0.5, s"$r")
    }
  }

  test("sprtBernoulli: a planted high-rate stream crosses A at the exact hand-computed hour") {
    def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
    // 10 successes per 20-event hour (rate .5) vs p0=.1, p1=.3:
    // per-hour LLR increment = 10·ln3 + 10·ln(7/9) > 0 -> crosses fast
    val c1 = math.log(0.3 / 0.1); val c0 = math.log(0.7 / 0.9)
    val perHour = r6(10 * c1 + 10 * c0)
    val bndA = r6(math.log(0.95 / 0.05))
    val crossHour = Iterator.from(1).find(h => r6(10.0 * h * c1 + 10.0 * h * c0) >= bndA).get
    val rows = (0 until 6).flatMap { h =>
      (0 until 20).map(i => (if (i < 10) 1L else 0L,
        new java.sql.Timestamp((100000L + h) * 3600000L + i * 1000L)))
    }
    val got = Stats.sprtBernoulli(rows.toDF("y", "ts"), "y", "ts", p0 = 0.1, p1 = 0.3)
      .collect().head
    assert(got.getLong(0) == 120L && got.getLong(1) == 60L, s"$got")
    assert(got.getString(3) == "accept_h1", s"$got")
    assert(got.getLong(4) == 100000L + crossHour - 1 &&
      got.getLong(5) == 20L * crossHour, s"cross at $crossHour: $got")
    assert(got.getDouble(2) == r6(60 * c1 + 60 * c0), s"final llr: $got")
    // a stream matching H0 exactly drifts down and accepts H0
    val nullRows = (0 until 40).flatMap { h =>
      (0 until 10).map(i => (if (i < 1) 1L else 0L,
        new java.sql.Timestamp((200000L + h) * 3600000L + i * 1000L)))
    }
    val nul = Stats.sprtBernoulli(nullRows.toDF("y", "ts"), "y", "ts", p0 = 0.1, p1 = 0.3)
      .collect().head
    assert(nul.getString(3) == "accept_h0", s"null stream: $nul")
    // too little evidence: continue with NULL crossing
    val tiny = Stats.sprtBernoulli(
      Seq((1L, new java.sql.Timestamp(0L)), (0L, new java.sql.Timestamp(1000L)))
        .toDF("y", "ts"), "y", "ts", p0 = 0.1, p1 = 0.3).collect().head
    assert(tiny.getString(3) == "continue" && tiny.isNullAt(4) && tiny.isNullAt(5),
      s"tiny: $tiny")
  }

  test("sprtBernoulli fuzz: == the plain-Scala hourly-look mirror on random streams") {
    def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
    val rnd = new scala.util.Random(3015L)
    val (p0, p1) = (0.2, 0.4)
    val (c1, c0) = (math.log(p1 / p0), math.log((1 - p1) / (1 - p0)))
    val (bndA, bndB) = (r6(math.log(0.95 / 0.05)), r6(math.log(0.05 / 0.95)))
    for (c <- 0 until 8) {
      val p = 0.1 + rnd.nextDouble() * 0.5
      val hours = 3 + rnd.nextInt(20)
      val perHour = 5 + rnd.nextInt(15)
      val stream = (0 until hours).map { h =>
        h -> (0 until perHour).map(_ => if (rnd.nextDouble() < p) 1L else 0L)
      }
      val rows = stream.flatMap { case (h, ys) =>
        ys.zipWithIndex.map { case (y, i) =>
          (y, new java.sql.Timestamp((500000L + h) * 3600000L + i * 1000L))
        }
      }
      val got = Stats.sprtBernoulli(rows.toDF("y", "ts"), "y", "ts", p0, p1)
        .collect().head
      // mirror: cumulative hourly looks, first crossing wins
      var (cn, ck) = (0L, 0L)
      var cross: Option[(String, Long, Long)] = None
      var lastLlr = 0.0
      stream.foreach { case (h, ys) =>
        cn += ys.size; ck += ys.sum
        lastLlr = r6(ck * c1 + (cn - ck) * c0)
        if (cross.isEmpty && (lastLlr >= bndA || lastLlr <= bndB))
          cross = Some((if (lastLlr >= bndA) "accept_h1" else "accept_h0", 500000L + h, cn))
      }
      assert((got.getLong(0), got.getLong(1), got.getDouble(2)) == ((cn, ck, lastLlr)),
        s"case $c totals: $got vs ($cn, $ck, $lastLlr)")
      cross match {
        case Some((d, h, n)) =>
          assert((got.getString(3), got.getLong(4), got.getLong(5)) == ((d, h, n)),
            s"case $c crossing: $got vs ($d, $h, $n)")
        case None =>
          assert(got.getString(3) == "continue" && got.isNullAt(4), s"case $c: $got")
      }
    }
  }

  test("postStratifiedAte fuzz: == the plain-Scala weighted-gap mirror") {
    def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
    val rnd = new scala.util.Random(4015L)
    for (c <- 0 until 8) {
      val strata = (0 until 2 + rnd.nextInt(4)).map(i => s"s$i")
      val rows = (0 until 50 + rnd.nextInt(150)).map { _ =>
        (rnd.nextBoolean(), rnd.nextInt(1000).toLong, strata(rnd.nextInt(strata.size)))
      }
      val got = Stats.postStratifiedAte(rows.toDF("t", "x", "g"), "t", "x", "g")
        .collect().head
      val byG = rows.groupBy(_._3)
      val d6 = byG.map { case (g, rs) =>
        val (t, ct) = rs.partition(_._1)
        g -> (if (t.nonEmpty && ct.nonEmpty)
          Some(math.floor((t.map(_._2).sum.toDouble / t.size
            - ct.map(_._2).sum.toDouble / ct.size) * 1e6 + 0.5).toLong)
        else None)
      }
      val used = byG.filter { case (g, _) => d6(g).isDefined }
      val nu = used.values.map(_.size).sum
      val ate = if (nu > 0)
        r6(used.map { case (g, rs) => rs.size.toDouble * d6(g).get }.sum / (nu * 1e6))
      else Double.NaN
      val (tr, cr) = rows.partition(_._1)
      val raw = r6(tr.map(_._2).sum.toDouble / tr.size - cr.map(_._2).sum.toDouble / cr.size)
      assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getDouble(3))
        == ((rows.size.toLong, byG.size.toLong, used.size.toLong, raw)), s"case $c: $got")
      if (nu > 0) assert(got.getDouble(4) == ate, s"case $c ate: $got vs $ate")
      else assert(got.isNullAt(4), s"case $c: $got")
    }
  }
}
