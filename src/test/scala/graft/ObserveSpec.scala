package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Tokenize}

/** The production pair generators' NO-SILENT-CAPS audit trail: when a
  * bucket saturates `maxBucket`, [[Dedup.simhashPairs]] /
  * [[Dedup.prefixJaccardJoin]] must report the cut — dropped buckets,
  * dropped member mass, retained pair bound — as observe() metrics from
  * the very run that produced the pairs, and those numbers must MATCH
  * what ScaleBench computes from the separate `*BucketSizes` diagnostic
  * pass (same definitions: dropped = buckets with n > cap, retained
  * bound = Σ n·(n−1)/2 over 2 ≤ n ≤ cap).
  */
class ObserveSpec extends SparkSpec {
  import spark.implicits._

  // ScaleBench.bucketStats, verbatim semantics
  private def diagStats(sizes: org.apache.spark.sql.DataFrame, cap: Int): (Long, Long, Long) = {
    val r = sizes.agg(
      sum(when(col("n") > cap, 1L).otherwise(0L)),
      sum(when(col("n") > cap, col("n")).otherwise(0L)),
      sum(when(col("n").between(2, cap), expr("n * (n - 1) DIV 2")).otherwise(0L))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def metrics(o: Observation): (Long, Long, Long) = {
    val m = o.get
    (m("dropped_buckets").asInstanceOf[Long],
      m("dropped_members").asInstanceOf[Long],
      m("retained_pair_bound").asInstanceOf[Long])
  }

  // 30 identical docs (one planted hot signature bucket in EVERY band) +
  // 20 distinct docs for background mass + one SURVIVING near-dup pair
  // (a bucket of 2 below the cap) so the pair result is non-empty — an
  // all-empty result lets AQE propagate an empty relation over the
  // CollectMetrics node and the observation completes with no metrics
  private lazy val planted = {
    val hot  = (0 until 30).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
    val cold = (0 until 20).map(i =>
      (100L + i, s"unique document number $i carrying words w${i}a w${i}b w${i}c w${i}d w${i}e"))
    val pair = Seq(
      (200L, "reusable boilerplate paragraph shared by exactly two documents here"),
      (201L, "reusable boilerplate paragraph shared by exactly two documents here"))
    (hot ++ cold ++ pair).toDF("doc_id", "text").localCheckpoint(true)
  }

  test("simhashPairs reports its cap cut via observe(), matching the diagnostic pass") {
    val cap  = 8
    val sigs = Dedup.simhash(Tokenize.tokens(planted, "text", Seq("doc_id")), bits = 60)
      .localCheckpoint(true)
    val o = Observation("simhash_drop_audit")
    val pairs = Dedup.simhashPairs(sigs, maxDist = 3, bands = 6, sigBits = 60,
      maxBucket = cap, dropAudit = Some(o))
    pairs.collect() // run the production query; metrics ride this job
    val got  = metrics(o)
    val want = diagStats(Dedup.simhashBucketSizes(sigs), cap)
    assert(want._1 >= 6, s"the 30-copy plant must saturate every band's bucket: $want")
    assert(got == want, s"operator metrics $got != diagnostic pass $want")
  }

  test("prefixJaccardJoin reports its cap cut via observe(), matching the diagnostic pass") {
    val cap = 8
    val o = Observation("setsim_drop_audit")
    val pairs = Dedup.prefixJaccardJoin(planted, threshold = 0.5, shingleK = 3,
      maxBucket = cap, dropAudit = Some(o))
    pairs.collect()
    val got  = metrics(o)
    val want = diagStats(Dedup.setsimBucketSizes(planted, threshold = 0.5, shingleK = 3), cap)
    assert(want._1 >= 1, s"the 30-copy plant must saturate its prefix bucket: $want")
    assert(got == want, s"operator metrics $got != diagnostic pass $want")
  }

  test("prefixJaccardJoin dfCap mode reports the stop-shingle cut via observe()") {
    val cap = 8
    val o = Observation("setsim_stop_audit")
    val pairs = Dedup.prefixJaccardJoin(planted, threshold = 0.5, shingleK = 3,
      dfCap = cap, stopAudit = Some(o))
    assert(pairs.count() >= 1, "the surviving boilerplate pair must still match under the cap")
    val m = o.get
    // diagnostic recount with the same definitions: df over the distinct
    // per-doc shingle relation
    val ex = graft.functions.TextAnalysis
      .withShingles(planted.select("doc_id", "text"), "text", 3, "__sh")
      .select(col("doc_id"), explode(col("__sh")).as("g"))
    val dfreq = ex.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val want = dfreq.agg(
      sum(when(col("n") > cap, 1L).otherwise(0L)),
      sum(when(col("n") > cap, col("n")).otherwise(0L)),
      count(lit(1)), max(col("n"))).head()
    assert(m("n_stop_shingles") == want.getLong(0),
      s"stopped-shingle count ${m("n_stop_shingles")} != diagnostic ${want.getLong(0)}")
    assert(m("n_dropped_occurrences") == want.getLong(1),
      s"dropped occurrence mass ${m("n_dropped_occurrences")} != diagnostic ${want.getLong(1)}")
    assert(m("n_distinct_shingles") == want.getLong(2))
    assert(m("max_df") == want.getLong(3))
    // the 30-copy plant guarantees the cut is non-trivial here
    assert(want.getLong(0) >= 1, s"planted hot shingles must exceed the cap: $want")
  }

  test("EXACT-mode setsim declares its pair-density ceiling via retained_pair_bound") {
    // the one deliberately-superlinear sweep line (q_setsim_join at
    // duplicate-dense 50×) must announce its quadratic candidate ceiling
    // inside the run itself: with no dfCap, every shingle is retained and
    // retained_pair_bound == Σ df·(df−1)/2 over the full df relation — on
    // the 30-copy plant that is ≥ 30·29/2 from the planted shingles alone
    val o = Observation("setsim_exact_bound_audit")
    Dedup.prefixJaccardJoin(planted, threshold = 0.5, shingleK = 3,
      stopAudit = Some(o)).collect()
    val m = o.get
    val ex = graft.functions.TextAnalysis
      .withShingles(planted.select("doc_id", "text"), "text", 3, "__sh")
      .select(col("doc_id"), explode(col("__sh")).as("g"))
    val want = ex.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) DIV 2"))).head().getLong(0)
    assert(m("retained_pair_bound") == want,
      s"exact-mode bound ${m("retained_pair_bound")} != diagnostic $want")
    assert(want >= 30L * 29 / 2, s"plant must make the ceiling non-trivial: $want")
    assert(m("n_stop_shingles") == 0L && m("n_dropped_occurrences") == 0L,
      s"exact mode cuts nothing: $m")
  }

  test("no saturation -> zero dropped, and the audit costs no extra plan nodes") {
    val cap  = 4096
    val sigs = Dedup.simhash(Tokenize.tokens(planted, "text", Seq("doc_id")), bits = 60)
      .localCheckpoint(true)
    val o = Observation("simhash_no_drop")
    val audited = Dedup.simhashPairs(sigs, maxBucket = cap, dropAudit = Some(o))
    val n = audited.count()
    val (d, dm, bound) = metrics(o)
    assert(d == 0L && dm == 0L, s"nothing may drop under a roomy cap: ($d, $dm)")
    assert(bound >= n, s"retained pair bound ($bound) must bound emitted pairs ($n)")
    // audit adds a CollectMetrics node, never an exchange: shuffle count
    // must equal the unaudited operator's
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "(?<!Broadcast)Exchange ".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    val bare = Dedup.simhashPairs(sigs, maxBucket = cap)
    assert(exchanges(audited) == exchanges(bare),
      "dropAudit must not change the shuffle structure")
  }

  test("coSupplierEdges reports the hub-degree cut via observe()") {
    import graft.operators.Graph
    // hand bipartite graph as raw tables is heavy — drive the projection
    // through its public signature on the sf0.001 tables: maxDeg=2 must
    // drop every supplier with degree > 2 and report the pair mass the
    // cut avoided (d(d-1)/2 per dropped supplier)
    val dir = "/root/testdata/sf0.001"
    def t(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val bip = Graph.sameNationEdges(t("orders"), t("lineitem"), t("customer"), t("supplier"))
    val degs = bip.groupBy(col("dst")).agg(count(lit(1)).as("n"))
      .select(col("n")).as[Long].collect()
    // cap at the median so BOTH sides are populated: a cap dropping every
    // supplier leaves an empty projection, and AQE's empty-relation
    // propagation skips the CollectMetrics node entirely (the
    // all-empty-result caveat documented on `planted` above)
    val cap = degs.sorted.apply(degs.length / 2).toInt
    val wantDropped = degs.count(_ > cap).toLong
    val wantPairs = degs.filter(_ > cap).map(d => d * (d - 1) / 2).sum
    assert(wantDropped > 0 && degs.exists(_ <= cap),
      s"fixture must have hubs above AND suppliers below deg $cap")
    val o = Observation("cosupplier_drop")
    val proj = Graph.coSupplierEdges(t("orders"), t("lineitem"), t("customer"), t("supplier"),
      maxDeg = cap, dropAudit = Some(o))
    val n = proj.count()
    val m = o.get
    assert(m("n_suppliers_dropped").asInstanceOf[Long] == wantDropped
      && m("n_pairs_dropped").asInstanceOf[Long] == wantPairs,
      s"audit $m vs ($wantDropped, $wantPairs)")
    // kept suppliers each mint at most cap·(cap−1)/2 pairs
    assert(n <= degs.count(_ <= cap).toLong * cap * (cap - 1) / 2,
      s"capped projection too large: $n")
  }
}
