package graft

import org.apache.spark.sql.functions._

/** Approximate (sketch) aggregates — the 100 TB answer when exactness isn't
  * required: HLL++ (`approx_count_distinct`) and KLL-style quantiles
  * (`percentile_approx`) run in bounded memory per group with one pass and
  * mergeable partial states. Sketch internals differ per engine, so no
  * DuckDB oracle is possible; instead these specs pin accuracy against the
  * EXACT aggregates on the same data. Spark's sketches are deterministic
  * for a given input (hash-based, merge-order-independent), so the bounds
  * can be tight assertions, not flaky tolerances.
  */
class SketchSpec extends SparkSpec {

  private lazy val docs   = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
  private lazy val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")

  test("approx_count_distinct (HLL++) within 5% of exact on two cardinality regimes") {
    val toks = graft.operators.Tokenize.tokens(docs, "text", Seq("doc_id"))
    // rsd 0.01 → a 2^14-register sketch; the default 5% rsd measured 6.7%
    // error on the 1.5k-custkey regime, so size the sketch for the bound
    val (approxW, exactW) = (
      toks.agg(approx_count_distinct(col("word"), 0.01).as("a")).head().getLong(0),
      toks.agg(countDistinct(col("word")).as("e")).head().getLong(0))
    assert(math.abs(approxW - exactW).toDouble / exactW <= 0.05,
      s"words: approx $approxW vs exact $exactW")
    val (approxC, exactC) = (
      orders.agg(approx_count_distinct(col("o_custkey"), 0.01).as("a")).head().getLong(0),
      orders.agg(countDistinct(col("o_custkey")).as("e")).head().getLong(0))
    assert(math.abs(approxC - exactC).toDouble / exactC <= 0.05,
      s"custkeys: approx $approxC vs exact $exactC")
  }

  test("percentile_approx within one quantile step of the exact percentile") {
    val exact = orders
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"), expr("percentile(o_totalprice, 0.9)").as("p90"))
      .head()
    val approx = orders
      .agg(
        expr("percentile_approx(o_totalprice, 0.5, 1000)").as("p50"),
        expr("percentile_approx(o_totalprice, 0.9, 1000)").as("p90"))
      .head()
    // accuracy 1000 → rank error ≤ n/1000; translate to a value tolerance
    // via the observed spread rather than assuming a distribution
    val spread = orders.agg((max(col("o_totalprice")) - min(col("o_totalprice"))).as("s")).head().getDouble(0)
    Seq(0, 1).foreach { i =>
      val (e, a) = (exact.getDouble(i), approx.getDouble(i))
      assert(math.abs(e - a) <= spread * 0.02, s"q$i: approx $a vs exact $e (spread $spread)")
    }
  }

  test("count_min_sketch heavy hitters: estimates overcount-only within eps*N") {
    val toks = graft.operators.Tokenize.tokens(docs, "text", Seq("doc_id"))
    // one mergeable sketch over the token stream (eps 0.1% of stream mass,
    // 99.9% confidence), probed for every word — the heavy-hitter path a
    // 100 TB frequency query takes when the exact groupBy is too hot
    val skBytes = toks
      .agg(count_min_sketch(col("word"), lit(0.001), lit(0.999), lit(42)).as("sk"))
      .head().getAs[Array[Byte]](0)
    val sk = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val exact = toks.groupBy(col("word")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val n = exact.map(_._2).sum
    for ((w, e) <- exact) {
      val est = sk.estimateCount(w)
      assert(est >= e, s"CMS must never undercount: '$w' est $est < exact $e")
      assert(est <= e + (0.001 * n).toLong + 1,
        s"CMS overcount beyond eps*N for '$w': est $est, exact $e, N $n")
    }
  }
}
