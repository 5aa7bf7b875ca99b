package graft

import graft.operators.Recommend

/** [[Recommend.alsRank1]]: the quantized half-step schedule must equal an
  * exact BigInt mirror bit for bit (the whole point of the scaled-long
  * factor discipline), and hand-traceable shapes must read their known
  * fixpoints.
  */
class RecommendSpec extends SparkSpec {
  import spark.implicits._

  private def quant(n: BigInt, d: BigInt): Long =
    if (d > 0) math.floor(n.toDouble * 1e6 / d.toDouble * 1e6 + 0.5).toLong else 0L

  /** Exact integer mirror of the quantized ALS rounds. */
  private def refAls(cells: Seq[(Int, Int, Long)], iters: Int): Map[Int, Double] = {
    var v: Map[Int, Long] = cells.map(_._2).distinct.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val u = cells.groupBy(_._1).map { case (usr, cs) =>
        usr -> quant(
          cs.map { case (_, i, r) => BigInt(r) * v(i) }.sum,
          cs.map { case (_, i, _) => BigInt(v(i)) * v(i) }.sum)
      }
      v = cells.groupBy(_._2).map { case (it, cs) =>
        it -> quant(
          cs.map { case (uu, _, r) => BigInt(r) * u(uu) }.sum,
          cs.map { case (uu, _, _) => BigInt(u(uu)) * u(uu) }.sum)
      }
    }
    v.map { case (i, f6) => i -> math.floor(f6.toDouble / 1e6 * 1e6 + 0.5) / 1e6 }
  }

  test("single-user matrix: item factors settle proportional to the ratings (hand fixpoint)") {
    // one user, items rated 4 and 1: u solves to the projection 2.5, and
    // v to (1.6, 0.4) — exactly proportional to the ratings; a second
    // round reproduces the same pair (fixpoint), traced by hand
    val ratings = Seq((1, 10, 4L), (1, 20, 1L)).toDF("u", "i", "r")
    val got = Recommend.alsRank1(ratings, "u", "i", "r", iters = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map(10 -> (1L, 1.6), 20 -> (1L, 0.4)), s"got $got")
  }

  test("alsRank1 fuzz: == the exact BigInt mirror on 15 random implicit matrices") {
    val rnd = new java.util.Random(808L)
    for (case_ <- 0 until 15) {
      val nU = 2 + rnd.nextInt(8); val nI = 2 + rnd.nextInt(8)
      val cells = (for {
        u <- 0 until nU; i <- 0 until nI
        if rnd.nextInt(3) > 0 // ~2/3 observed density
      } yield (u, i, 1L + rnd.nextInt(50))).toSeq
      if (cells.nonEmpty) {
        val iters = 1 + rnd.nextInt(3)
        val got = Recommend.alsRank1(cells.toDF("u", "i", "r"), "u", "i", "r", iters)
          .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
        val want = refAls(cells, iters)
        assert(got == want, s"case $case_ (iters=$iters): $got vs $want")
        val users = cells.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
        val gotN = Recommend.alsRank1(cells.toDF("u", "i", "r"), "u", "i", "r", 1)
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        assert(gotN == users, s"case $case_: n_users")
      }
    }
  }

  private def pround(x: Double, dp: Int): Double = {
    val m = math.pow(10, dp)
    math.floor(x * m + 0.5) / m
  }

  test("itemItemCosine: hand-computed cosines, minCo floor, per-item rank with neighbor tiebreak") {
    // baskets: {A,B}, {A,B}, {A,B,C}, {C} → n_A=n_B=3, n_C=2;
    // co(A,B)=3 → cos 1.0; co(A,C)=co(B,C)=1 → cos 1/√6
    val li = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (3L, "C"), (4L, "C"))
      .toDF("l_orderkey", "l_partkey")
    val strict = Recommend.itemItemCosine(li, minCo = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    assert(strict.toSeq == Seq(("A", "B", 3L, 1.0, 1), ("B", "A", 3L, 1.0, 1)),
      s"minCo=2: ${strict.toSeq}")
    val c6 = pround(1.0 / math.sqrt(3.0 * 2.0), 6)
    val loose = Recommend.itemItemCosine(li, minCo = 1, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    assert(loose.toSeq == Seq(
      ("A", "B", 3L, 1.0, 1), ("A", "C", 1L, c6, 2),
      ("B", "A", 3L, 1.0, 1), ("B", "C", 1L, c6, 2),
      ("C", "A", 1L, c6, 1), ("C", "B", 1L, c6, 2)),
      s"minCo=1: ${loose.toSeq}")
  }

  test("hitRateEval: CF predicts the co-occurring held-out item; popularity baseline misses") {
    // c1 trains on {A,B}, holds out {C}; c2 trains on {B,C}, holds {A};
    // c3 trains on {B,C}, holds {D}. (B,C) co-occurs twice -> the only
    // sim edge; CF recommends C to c1 (hit). Popularity top-1 is B,
    // which everyone already has -> zero baseline hits.
    val orders = Seq(
      (1L, 10L, 1), (1L, 11L, 2),
      (2L, 20L, 1), (2L, 21L, 2),
      (3L, 30L, 1), (3L, 31L, 2))
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
    val li = Seq(
      (10L, 101L), (10L, 102L), (11L, 103L),
      (20L, 102L), (20L, 103L), (21L, 101L),
      (30L, 102L), (30L, 103L), (31L, 104L))
      .toDF("l_orderkey", "l_partkey")
    val got = Recommend.hitRateEval(orders, li, k = 1, minCo = 2, simK = 3)
      .orderBy("method")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("itemcf", 3L, 1L, pround(1.0 / 3.0, 6)),
      ("popularity", 3L, 0L, 0.0)),
      s"got: ${got.toSeq}")
    // single-order customers are ineligible: adding one must not move
    // either row
    val plus = Recommend.hitRateEval(
      orders.unionAll(Seq((9L, 90L, 1)).toDF("o_custkey", "o_orderkey", "o_orderdate")),
      li.unionAll(Seq((90L, 103L)).toDF("l_orderkey", "l_partkey")),
      k = 1, minCo = 2, simK = 3)
      .orderBy("method")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(plus.toSeq == got.toSeq, s"ineligible user leaked in: ${plus.toSeq}")
  }
}
