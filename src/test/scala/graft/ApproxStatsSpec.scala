package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** The `exact = false` scale path of the percentile-based operators
  * (winsorizedMean, equiDepthHistogram, groupPercentiles): exact
  * `percentile` is an ImperativeAggregate whose buffer holds EVERY value
  * of a group — correct at test scale, OOM at 100 TB with few hot groups.
  * `percentile_approx` (GK sketch, rank error <= 1/accuracy, mergeable
  * partials) is the swap; these specs pin how far the approx results may
  * drift from the exact ones on real testdata, so the parameter is a
  * verified contract rather than a docstring promise. Spark's sketch is
  * deterministic for a given input, so the bounds are hard assertions.
  */
class ApproxStatsSpec extends SparkSpec {

  private lazy val lineitem = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
  private lazy val orders   = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")

  test("winsorizedMean approx path: n and raw_mean identical, wins_mean within 1%") {
    val key = (r: org.apache.spark.sql.Row) => r.getString(0)
    val exact = Stats.winsorizedMean(lineitem, "l_returnflag", "l_extendedprice")
      .collect().map(r => key(r) -> r).toMap
    val approx = Stats.winsorizedMean(lineitem, "l_returnflag", "l_extendedprice",
      exact = false, accuracy = 10000)
      .collect().map(r => key(r) -> r).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (g, e) =>
      val a = approx(g)
      // the clip set changes only for values between the exact and approx
      // boundaries — rank error 1e-4 of the group, so the mean moves well
      // under 1% on this data
      assert(a.getLong(1) == e.getLong(1), s"group $g: n differs")
      assert(a.getDouble(2) == e.getDouble(2), s"group $g: raw_mean differs")
      val (we, wa) = (e.getDouble(3), a.getDouble(3))
      assert(math.abs(wa - we) / math.abs(we) <= 0.01,
        s"group $g: wins_mean exact $we vs approx $wa")
    }
  }

  test("equiDepthHistogram approx path: same buckets, depths within 2x rank error") {
    val n = orders.count()
    val buckets = 8
    val exact = Stats.equiDepthHistogram(orders, "o_totalprice", buckets)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val approx = Stats.equiDepthHistogram(orders, "o_totalprice", buckets,
      exact = false, accuracy = 10000)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet, "bucket ids differ")
    // each boundary may move by rank error n/accuracy plus the
    // non-interpolated snap to a data value — allow 2x rank error + 1
    // rows of drift per bucket (each bucket has two boundaries)
    val tol = 2.0 * n / 10000 + 1
    exact.foreach { case (b, ne) =>
      val na = approx(b)
      assert(math.abs(na - ne) <= 2 * tol,
        s"bucket $b: exact depth $ne vs approx $na (tol ${2 * tol})")
    }
  }

  test("robustOutliers approx path: n identical, outlier counts within a hair") {
    val exact = graft.operators.Stats
      .robustOutliers(orders, "o_orderpriority", "o_totalprice")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val approx = graft.operators.Stats
      .robustOutliers(orders, "o_orderpriority", "o_totalprice",
        exact = false, accuracy = 10000)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (g, (n, out)) =>
      val (na, outa) = approx(g)
      assert(na == n, s"group $g: n differs")
      // med/MAD each move by <=1e-4 rank error; only values within that
      // sliver of the 3.5 threshold can flip
      assert(math.abs(outa - out) <= math.max(1L, n / 1000),
        s"group $g: outliers exact $out vs approx $outa")
    }
  }

  test("tableStats approx path: all measures identical except NDV, NDV within rsd bounds") {
    val cols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val key = (r: org.apache.spark.sql.Row) => r.getString(0)
    val exact = Stats.tableStats(lineitem, cols)
      .collect().map(r => key(r) -> r).toMap
    val approx = Stats.tableStats(lineitem, cols, exact = false, rsd = 0.05)
      .collect().map(r => key(r) -> r).toMap
    assert(exact.keySet == approx.keySet)
    // the approx path plans WITHOUT the Expand the exact multi-column
    // countDistinct needs — the whole point of the swap
    val approxPlan = Stats.tableStats(lineitem, cols, exact = false)
      .queryExecution.executedPlan.toString
    val exactPlan = Stats.tableStats(lineitem, cols)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), "approx NDV must not plan an Expand")
    assert(exactPlan.contains("Expand"), "exact multi-col NDV plans via Expand")
    exact.foreach { case (c, e) =>
      val a = approx(c)
      // everything except NDV rides the same plain aggregates
      assert(a.getLong(1) == e.getLong(1), s"col $c: n_rows differs")
      assert(a.getLong(2) == e.getLong(2), s"col $c: n_null differs")
      assert(a.getDouble(4) == e.getDouble(4), s"col $c: min differs")
      assert(a.getDouble(5) == e.getDouble(5), s"col $c: max differs")
      assert(a.getDouble(6) == e.getDouble(6), s"col $c: avg differs")
      // HLL++ with rsd 0.05: allow 3 sigma
      val (ne, na) = (e.getLong(3).toDouble, a.getLong(3).toDouble)
      assert(math.abs(na - ne) / ne <= 0.15,
        s"col $c: ndv exact $ne vs approx $na beyond 3x rsd")
    }
  }

  test("groupPercentiles approx path: p50/p90 within one adjacent-value step") {
    val exact = Stats.groupPercentiles(lineitem, "l_returnflag", "l_quantity")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val approx = Stats.groupPercentiles(lineitem, "l_returnflag", "l_quantity",
      exact = false, accuracy = 10000)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(exact.keySet == approx.keySet)
    // l_quantity is integer-valued 1..50: exact interpolates, approx snaps
    // to a data value — they may differ by at most one unit step
    exact.foreach { case (g, (p50e, p90e)) =>
      val (p50a, p90a) = approx(g)
      assert(math.abs(p50a - p50e) <= 1.0, s"group $g p50: $p50e vs $p50a")
      assert(math.abs(p90a - p90e) <= 1.0, s"group $g p90: $p90e vs $p90a")
    }
  }
}
