package graft

import graft.operators.Stats

/** [[Stats.reliability]] (ECE) and [[Stats.cohenKappa]]: textbook values
  * on hand-built confusions, zero ECE when calibrated, bin-edge handling.
  */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("cohenKappa reproduces the textbook 2x2 example") {
    // n11=20 n10=5 n01=10 n00=15 → po=0.7, pe=0.5, kappa=0.4
    val df = (Seq.fill(20)((1, 1)) ++ Seq.fill(5)((1, 0)) ++
      Seq.fill(10)((0, 1)) ++ Seq.fill(15)((0, 0))).toDF("r1", "r2")
    val r = Stats.cohenKappa(df, "r1", "r2").collect().head
    assert(r.getAs[Long]("n") == 50 && r.getAs[Long]("n11") == 20)
    assert(r.getAs[Double]("po_r") == 0.7)
    assert(r.getAs[Double]("pe_r") == 0.5)
    assert(r.getAs[Double]("kappa_r") == 0.4)
  }

  test("perfect agreement gives kappa 1, independent-looking raters give ~0") {
    val perfect = Seq.fill(30)((1, 1)) ++ Seq.fill(30)((0, 0))
    assert(Stats.cohenKappa(perfect.toDF("r1", "r2"), "r1", "r2")
      .collect().head.getAs[Double]("kappa_r") == 1.0)
    // exactly proportional cells: po == pe → kappa == 0
    val indep = Seq.fill(16)((1, 1)) ++ Seq.fill(24)((1, 0)) ++
      Seq.fill(24)((0, 1)) ++ Seq.fill(36)((0, 0))
    assert(Stats.cohenKappa(indep.toDF("r1", "r2"), "r1", "r2")
      .collect().head.getAs[Double]("kappa_r") == 0.0)
  }

  test("a perfectly calibrated scorer has ECE 0; a confidently wrong one does not") {
    // bin [0.7,0.8): 10 rows at conf 0.75, 7.5 can't be hit exactly —
    // use conf 0.7 with 7/10 positive and conf 0.2 with 2/10 positive
    val calibrated =
      (Seq.fill(7)((0.7, 1)) ++ Seq.fill(3)((0.7, 0)) ++
        Seq.fill(2)((0.2, 1)) ++ Seq.fill(8)((0.2, 0))).toDF("conf", "label")
    val e1 = Stats.reliability(calibrated, "conf", "label")
      .collect().head.getAs[Double]("ece_r")
    assert(e1 == 0.0, s"calibrated scorer must have ECE 0, got $e1")

    val wrong = Seq.fill(10)((0.95, 0)).toDF("conf", "label")
    val e2 = Stats.reliability(wrong, "conf", "label")
      .collect().head.getAs[Double]("ece_r")
    assert(e2 == 0.95, s"confidently wrong scorer: ECE 0.95, got $e2")
  }

  test("brierDecomposition: REL-RES+UNC reproduces the exact Brier score on constant-conf bins") {
    // calibrated scorer (conf == acc per bin): REL = 0,
    // RES = Σ n(acc-ō)²/N = 0.0625, UNC = 0.45·0.55 = 0.2475,
    // brier = 0.185 — equals the direct mean (conf−label)² because conf
    // is constant within each bin
    val calibrated =
      (Seq.fill(7)((0.7, 1)) ++ Seq.fill(3)((0.7, 0)) ++
        Seq.fill(2)((0.2, 1)) ++ Seq.fill(8)((0.2, 0))).toDF("conf", "label")
    val r = Stats.brierDecomposition(calibrated, "conf", "label").collect().head
    assert(r.getAs[Long]("n") == 20)
    assert(r.getAs[Double]("obar_r") == 0.45)
    assert(r.getAs[Double]("rel_r") == 0.0, "calibrated -> zero reliability term")
    assert(r.getAs[Double]("res_r") == 0.0625)
    assert(r.getAs[Double]("unc_r") == 0.2475)
    assert(r.getAs[Double]("brier_r") == 0.185)
    // confidently wrong: all reliability, no resolution, no uncertainty
    val wrong = Seq.fill(10)((0.95, 0)).toDF("conf", "label")
    val w = Stats.brierDecomposition(wrong, "conf", "label").collect().head
    assert(w.getAs[Double]("rel_r") == 0.9025 && w.getAs[Double]("res_r") == 0.0
      && w.getAs[Double]("unc_r") == 0.0 && w.getAs[Double]("brier_r") == 0.9025)
  }

  test("rocAuc: separation reads 1, anti-separation 0, ties half-credit, hand case 0.875") {
    def auc(rows: Seq[(Double, Int)]): Double =
      Stats.rocAuc(rows.toDF("score", "label"), "score", "label")
        .collect().head.getDouble(2)
    assert(auc(Seq((0.8, 1), (0.9, 1), (0.1, 0), (0.2, 0))) == 1.0)
    assert(auc(Seq((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0))) == 0.0)
    assert(auc(Seq((0.5, 1), (0.5, 1), (0.5, 0))) == 0.5, "all-tie scores read exactly 1/2")
    // pairs: .9>.5, .9>.7, .7>.5 and one .7/.7 tie -> 3.5/4
    assert(auc(Seq((0.9, 1), (0.7, 1), (0.5, 0), (0.7, 0))) == 0.875)
  }

  test("conf exactly 1.0 lands in the top bin, not an overflow bin") {
    val df = Seq((1.0, 1), (0.05, 0)).toDF("conf", "label")
    val bins = Stats.reliability(df, "conf", "label")
      .collect().map(r => r.getAs[Int]("bin")).toSet
    assert(bins == Set(0, 9), s"got bins $bins")
  }

  test("isotonicCalibration: hand violator pools to the weighted average; flanks untouched") {
    // bin rates 0.2, 0.8, 0.4, 0.9 (weights 5,5,5,10): the middle pair
    // violates monotonicity, PAV pools it to (4+2)/10 = 0.6; flanks keep
    // their raw rates
    def mk(bin: Int, pos: Int, neg: Int) =
      (1 to pos).map(_ => (bin / 10.0 + 0.05, 1)) ++ (1 to neg).map(_ => (bin / 10.0 + 0.05, 0))
    val df = (mk(1, 1, 4) ++ mk(3, 4, 1) ++ mk(5, 2, 3) ++ mk(7, 9, 1))
      .toDF("conf", "label")
    val got = Stats.isotonicCalibration(df, "conf", "label")
      .orderBy("bin")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1, 5L, 0.2, 0.2),
      (3, 5L, 0.8, 0.6),
      (5, 5L, 0.4, 0.6),
      (7, 10L, 0.9, 0.9)), s"got: ${got.toSeq}")
  }

  test("isotonicCalibration fuzz: monotone, pool-preserving, == sequential PAV") {
    val rnd = new scala.util.Random(1525L)
    for (c <- 0 until 10) {
      val rows = (0 until 200 + rnd.nextInt(200)).map { _ =>
        (rnd.nextDouble(), if (rnd.nextDouble() < 0.5) 1 else 0)
      }
      val got = Stats.isotonicCalibration(rows.toDF("conf", "label"), "conf", "label", bins = 8)
        .orderBy("bin")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
      // monotone non-decreasing by construction of the minimax lattice
      assert(got.map(_._3).sliding(2).forall(p => p.size < 2 || p(0) <= p(1)),
        s"case $c not monotone: ${got.toSeq}")
      // sequential weighted PAV on the same bin aggregates (exact, then
      // compared within the range-average rounding granularity)
      val binned = rows.groupBy(r => math.min((r._1 * 8).toInt, 7)).toSeq.sortBy(_._1)
        .map { case (b, rs) => (b, rs.size.toLong, rs.map(_._2).sum.toDouble) }
      val stack = scala.collection.mutable.ArrayBuffer[(Double, Double)]() // (sumY, n)
      binned.foreach { case (_, n, sy) =>
        stack += ((sy, n.toDouble))
        while (stack.size >= 2 &&
          stack(stack.size - 2)._1 / stack(stack.size - 2)._2
            >= stack.last._1 / stack.last._2) {
          val a = stack.remove(stack.size - 1); val b2 = stack.remove(stack.size - 1)
          stack += ((a._1 + b2._1, a._2 + b2._2))
        }
      }
      val pav = stack.flatMap { case (sy, n) =>
        Seq.fill(n.toInt)(sy / n) // per-row fit; regroup per bin below
      }
      val perBinPav = {
        var off = 0
        binned.map { case (b, n, _) =>
          val v = pav(off); off += n.toInt; (b, v)
        }
      }
      got.zip(perBinPav).foreach { case ((b1, _, iso), (b2, exact)) =>
        assert(b1 == b2 && math.abs(iso - exact) <= 2e-6,
          s"case $c bin $b1: iso $iso vs PAV $exact")
      }
    }
  }
}
