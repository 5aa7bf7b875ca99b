package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling}

class SamplingSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("deterministic sample: rerun-identical, nested across fractions, rate ≈ fraction") {
    import spark.implicits._
    val s1 = Sampling.deterministicSample(docs, "doc_id", 0.25).select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(docs, "doc_id", 0.25).select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "same salt+fraction must select identical rows")
    // nesting: a smaller fraction with the same salt is a subset of a larger
    val s50 = Sampling.deterministicSample(docs, "doc_id", 0.5).select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(s50), "0.25 sample must nest inside the 0.5 sample")
    // different salts decorrelate (not equal, overlap ≈ product of rates)
    val other = Sampling.deterministicSample(docs, "doc_id", 0.25, salt = "other").select("doc_id").as[Long].collect().toSet
    assert(s1 != other)
    val n = docs.count().toDouble
    assert(math.abs(s1.size / n - 0.25) < 0.1, s"rate ${s1.size / n} far from 0.25")
  }

  test("resampling with replacement: rerun-identical, expected copies per stratum") {
    import spark.implicits._
    val r = Sampling.resampleByWeight(docs, "lang", "doc_id",
      weights = Map("en" -> 0.5, "zh" -> 2.5), defaultWeight = 1.0)
    val rows  = r.select("doc_id", "copy").as[(Long, Long)].collect().toSeq.sorted
    val again = Sampling.resampleByWeight(docs, "lang", "doc_id",
      weights = Map("en" -> 0.5, "zh" -> 2.5), defaultWeight = 1.0)
      .select("doc_id", "copy").as[(Long, Long)].collect().toSeq.sorted
    assert(rows == again, "resampling must be rerun-identical")
    // weight >= 1 keeps every row at least once; copy indexes are dense 0..n-1
    val zh = docs.where(col("lang") === "zh").count()
    val zhCopies = r.where(col("lang") === "zh").count()
    assert(zhCopies >= 2 * zh && zhCopies <= 3 * zh, s"zh at weight 2.5: got $zhCopies copies of $zh docs")
    val en = docs.where(col("lang") === "en").count().toDouble
    val enCopies = r.where(col("lang") === "en").count().toDouble
    assert(math.abs(enCopies / en - 0.5) < 0.15, s"en at weight 0.5: rate ${enCopies / en}")
    val perDoc = r.groupBy("doc_id").agg(count(lit(1)).as("n"), max(col("copy")).as("mx")).collect()
    assert(perDoc.forall(row => row.getLong(2) == row.getLong(1) - 1), "copy must be dense 0..n-1")
  }

  test("stratified sample applies per-stratum rates; plan is a pure scan filter") {
    val sampled = Sampling.stratifiedSample(docs, "lang", "doc_id",
      fractions = Map("en" -> 0.1, "zh" -> 0.9), defaultFraction = 0.5)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en").toDouble / totals("en") < 0.25, "en must be down-sampled")
    assert(byLang("zh").toDouble / totals("zh") > 0.7, "zh must be kept nearly whole")
    // map-side: no exchange anywhere in the plan
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }
}

class DedupGroupsSpec extends SparkSpec {

  test("duplicateGroups matches a local union-find over the same pairs") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L), (2L, 3L),          // chain: {1,2,3}
      (10L, 11L),                  // pair: {10,11}
      (20L, 21L), (21L, 22L), (20L, 22L), // triangle: {20,21,22}
      (30L, 31L), (32L, 31L), (33L, 34L), (34L, 30L) // chain via 30..34
    ).toDF("doc1", "doc2")
    val got = Dedup.duplicateGroups(pairs).as[(Long, Long)].collect().toMap
    // local union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    def union(a: Long, b: Long): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra max rb) = ra min rb }
    Seq((1L,2L),(2L,3L),(10L,11L),(20L,21L),(21L,22L),(20L,22L),(30L,31L),(32L,31L),(33L,34L),(34L,30L))
      .foreach { case (a, b) => union(a, b) }
    val want = parent.keys.map(v => v -> find(v)).toMap
    assert(got == want, s"got $got\nwant $want")
    // keepers are their own group
    assert(got.values.toSet.forall(g => got(g) == g))
  }
}

class WeightedSampleSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("hashSplit: exactly one split per row, growth-stable, fractions approximate") {
    import spark.implicits._
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val full = Sampling.hashSplit(docs, "doc_id", splits)
      .select(col("doc_id").as[Long], col("split").as[String]).collect().toMap
    assert(full.size == docs.count(), "every row gets exactly one split")
    // growth stability: splitting HALF the corpus assigns the same splits
    val half = Sampling.hashSplit(docs.where(col("doc_id") % 2 === 0), "doc_id", splits)
      .select(col("doc_id").as[Long], col("split").as[String]).collect().toMap
    assert(half.forall { case (id, s) => full(id) == s },
      "adding documents must never move an existing document between splits")
    val frac = full.values.groupBy(identity).view.mapValues(_.size.toDouble / full.size).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08 && math.abs(frac("val") - 0.1) < 0.05)
  }

  test("tokenBudgetSample: == single-window form; budgets respected; rerun-stable") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // independent single-window formulation of the same rule
    val rk = conv(substring(md5(concat(lit("tb:"), col("doc_id").cast("string"))), 1, 13), 16, 10)
      .cast("long")
    val w = Window.partitionBy(col("lang")).orderBy(col("__rk"), col("doc_id"))
    val naive = docs
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), "\\s+")).cast("bigint").as("n_tok"))
      .withColumn("__rk", rk)
      .withColumn("cb", sum(col("n_tok")).over(w) - col("n_tok"))
      .where(col("cb") < 2000)
      .select(col("lang"), col("doc_id"), col("n_tok"), col("__rk").as("rk"))
      .collect().map(_.toSeq).toSet
    val got = Sampling.tokenBudgetSample(docs, "lang", budget = 2000)
    assert(got.collect().map(_.toSeq).toSet == naive,
      "hash-prefix-chunked prefix sum must equal the single-window rule")
    // each group's kept tokens reach the budget only through its last doc
    val sums = got.groupBy("lang").agg(sum("n_tok").as[Long], max("n_tok").as[Long])
      .collect()
    sums.foreach { r =>
      val (total, biggest) = (r.getLong(1), r.getLong(2))
      assert(total >= 2000, s"budget must be filled (boundary doc kept): $r")
      assert(total - biggest < 2000, s"removing the boundary doc must drop below budget: $r")
    }
    assert(got.collect().map(_.toSeq).toSet ==
      Sampling.tokenBudgetSample(docs, "lang", budget = 2000).collect().map(_.toSeq).toSet)
  }

  test("epochShards: each epoch a full permutation, rerun-stable, epochs decorrelated, shards balanced") {
    import spark.implicits._
    val n = docs.count()
    val es = Sampling.epochShards(docs.select("doc_id"), "doc_id", epochs = 2, nShards = 8)
    val rows = es.select("epoch", "shard", "seq", "doc_id")
      .as[(Int, Long, Int, Long)].collect().toSeq
    // every doc appears exactly once per epoch — nothing lost, nothing doubled
    (0 to 1).foreach { e =>
      val ids = rows.filter(_._1 == e).map(_._4)
      assert(ids.length == n && ids.distinct.length == n, s"epoch $e is not a permutation")
    }
    // seq is contiguous 1..|shard| within every loader shard
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, ms) =>
      assert(ms.map(_._3).sorted == (1 to ms.length), s"shard $k seq not contiguous")
    }
    // rerun-identical (pure function of salt/epoch/id), epochs differ
    val rows2 = Sampling.epochShards(docs.select("doc_id"), "doc_id", epochs = 2, nShards = 8)
      .select("epoch", "shard", "seq", "doc_id").as[(Int, Long, Int, Long)].collect().toSeq
    assert(rows.sorted == rows2.sorted, "the schedule must be rerun-identical")
    def schedule(e: Int) = rows.filter(_._1 == e).sortBy(r => (r._2, r._3)).map(r => (r._2, r._4))
    assert(schedule(0) != schedule(1), "epochs must reshuffle, not repeat")
    // binomial balance: every shard within 2x of the expected n/8
    val sizes = rows.filter(_._1 == 0).groupBy(_._2).view.mapValues(_.size).values.toSeq
    val avg = n.toDouble / 8
    assert(sizes.size == 8 && sizes.forall(s => s > avg / 2 && s < avg * 2),
      s"shard sizes $sizes stray far from the binomial mean $avg")
  }

  test("weightedSample == independent in-memory A-ES mirror; zero weights excluded") {
    import spark.implicits._
    val rows = docs.select(col("doc_id").as[Long], col("n_chars").as[Long]).collect()
    // independent mirror of the md5 draw + ln(u)/w key + top-k
    val digest = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = digest.digest(s"wsample:$id".getBytes("UTF-8"))
        .take(7).map(b => f"${b & 0xff}%02x").mkString.take(13)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 4503599627370496.0
      math.floor(math.log(u) / w.toDouble * 1e12 + 0.5) / 1e12
    }
    val want = rows.filter(_._2 > 0)
      .map { case (id, w) => (id, key(id, w)) }
      .sortBy { case (id, k) => (-k, id) }
      .take(100).map(_._1).toSet
    val got = Sampling.weightedSample(docs, "doc_id", "n_chars", k = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    // zero-weight rows can never appear
    val withZero = docs.withColumn("w0", when(col("doc_id") < 50, lit(0L)).otherwise(col("n_chars")))
    val z = Sampling.weightedSample(withZero, "doc_id", "w0", k = 100)
      .select("doc_id").as[Long].collect()
    assert(z.forall(_ >= 50))
  }

  test("mixtureInterleave: prefix proportions track weights within 1/source; chunked rank == window rank") {
    import spark.implicits._
    val rows = (1 to 900).map(i => (i.toLong, if (i <= 600) "a" else "b"))
    val df = rows.toDF("doc_id", "lang")
    val sched = Sampling.mixtureInterleave(df, "lang", Map("a" -> 3.0, "b" -> 1.0))
      .orderBy("sched_key", "lang", "doc_id")
    val prefix = sched.limit(400).select("lang").as[String].collect()
    val nA = prefix.count(_ == "a")
    // stride scheduling: 3:1 weights -> 300 a / 100 b in any 400-prefix,
    // within one tick per source
    assert(math.abs(nA - 300) <= 2, s"prefix share drifted: $nA a of 400")
    // the chunked-prefix rank must equal the plain window row_number
    import org.apache.spark.sql.expressions.Window
    val rk = conv(substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 13), 16, 10)
      .cast("long")
    val mirror = df.withColumn("__rk", rk)
      .withColumn("r", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("__rk"), col("doc_id"))) - 1)
      .select(col("doc_id"), col("r")).as[(Long, Int)].collect().toMap
    val got = Sampling.mixtureInterleave(df, "lang", Map("a" -> 3.0, "b" -> 1.0))
      .select(col("doc_id"), col("rank_in_group")).as[(Long, Long)].collect().toMap
    assert(got.forall { case (id, rnk) => rnk == mirror(id).toLong }, "chunked rank != window rank")
    // rerun-identical schedule
    val again = Sampling.mixtureInterleave(df, "lang", Map("a" -> 3.0, "b" -> 1.0))
      .orderBy("sched_key", "lang", "doc_id").limit(400).select("doc_id").as[Long].collect()
    assert(sched.limit(400).select("doc_id").as[Long].collect().toSeq == again.toSeq)
  }

  test("gumbelTopK == independent in-memory Gumbel-max mirror; rerun-stable; weights tilt") {
    import spark.implicits._
    val lw = docs.select(col("doc_id"), (col("n_chars").cast("double") / 1000.0).as("logw"))
    // independent mirror of the md5 Gumbel draw + logw + top-k
    val digest = java.security.MessageDigest.getInstance("MD5")
    def gkey(id: Long, logw: Double): Double = {
      val hex = digest.digest(s"gmirror:$id".getBytes("UTF-8"))
        .take(7).map(b => f"${b & 0xff}%02x").mkString.take(13)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4503599627370496.0
      math.floor((logw - math.log(-math.log(u))) * 1e9 + 0.5) / 1e9
    }
    val rows = lw.as[(Long, Double)].collect()
    val want = rows.map { case (id, w) => (id, gkey(id, w)) }
      .sortBy { case (id, k) => (-k, id) }.take(50).map(_._1).toSet
    val got = Sampling.gumbelTopK(lw, "doc_id", "logw", k = 50, salt = "gmirror")
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    val again = Sampling.gumbelTopK(lw, "doc_id", "logw", k = 50, salt = "gmirror")
      .select("doc_id").as[Long].collect().toSet
    assert(got == again, "selection must be rerun-identical")
    // a +5 log-weight tilt (e^5 ~ 148x) on a subset must dominate the sample
    val tilted = docs.select(col("doc_id"),
      when(col("doc_id") % 10 === 0, lit(5.0)).otherwise(lit(0.0)).as("logw"))
    val sel = Sampling.gumbelTopK(tilted, "doc_id", "logw", k = 50, salt = "tilt")
      .select("doc_id").as[Long].collect()
    val boosted = sel.count(_ % 10 == 0)
    assert(boosted > 40, s"148x-weighted subset should dominate the top-50, got $boosted")
  }

  test("neymanAllocation: hand strata — volatile stratum takes the budget, constant gets none") {
    import spark.implicits._
    val rows = Seq(("A", 0L), ("A", 10L), ("B", 5L), ("B", 5L),
      ("C", 0L), ("C", 0L), ("C", 20L), ("C", 20L)).toDF("g", "x")
    val got = Sampling.neymanAllocation(rows, "g", "x", budget = 100L)
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    def r(v: Double, n: Int) = { val f = math.pow(10, n); math.floor(v * f + 0.5) / f }
    // mirror: exact-sum sample sds, 1e6-scaled integer weights
    val sdA = math.sqrt(50.0)
    val sdC = math.sqrt(400.0 / 3.0)
    val wA = math.floor(2 * sdA * 1e6 + 0.5).toLong
    val wC = math.floor(4 * sdC * 1e6 + 0.5).toLong
    val tw = wA + wC
    val (shA, shC) = (wA.toDouble / tw, wC.toDouble / tw)
    val (idA, idC) = (r(shA * 100, 6), r(shC * 100, 6))
    // base 23 + 0 + 76 = 99, one remainder unit -> C's larger fraction wins
    assert(got.toSeq == Seq(
      ("A", 2L, r(sdA, 4), r(shA, 6), idA, math.floor(idA).toLong),
      ("B", 2L, 0.0, 0.0, 0.0, 0L),
      ("C", 4L, r(sdC, 4), r(shC, 6), idC, math.floor(idC).toLong + 1)),
      s"got: ${got.toSeq}")
    assert(got.map(_._6).sum == 100L, "allocations must sum to the budget exactly")
  }

  test("neymanAllocation: all-zero-weight strata fall back to proportional, sum == budget") {
    import spark.implicits._
    // every stratum constant or singleton -> every Neyman weight is 0;
    // the old reading handed out only min(budget, #strata) remainder
    // units. The fallback allocates by n_rows share.
    val rows = Seq(("A", 7L), ("A", 7L), ("A", 7L), ("B", 3L), ("C", 9L), ("C", 9L))
      .toDF("g", "x")
    val got = Sampling.neymanAllocation(rows, "g", "x", budget = 12L)
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(5)))
    // shares 3/6, 1/6, 2/6 -> ideals 6, 2, 4 exactly
    assert(got.toSeq == Seq(("A", 3L, 0.5, 6L), ("B", 1L, r6(1.0 / 6), 2L),
      ("C", 2L, r6(2.0 / 6), 4L)), s"got: ${got.toSeq}")
    assert(got.map(_._4).sum == 12L, "degenerate case must still sum to the budget")
  }

  private def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6

  test("doremiWeights: the domain the mixture LM underserves gets the largest alpha") {
    import spark.implicits._
    // domains A and B share a vocabulary, domain C is disjoint: the
    // corpus-mixture LM serves A/B nearly as well as their own LMs
    // (low excess) but pays a big penalty on C relative to C's own LM
    val docs = Seq(
      (1L, "the cat sat on the mat the cat", "A"),
      (2L, "the dog sat on the mat the dog", "A"),
      (3L, "the cat ran on the mat the cat", "B"),
      (4L, "the dog ran on the mat the dog", "B"),
      (5L, "zorp blik qua zorp blik qua zorp blik", "C"),
      (6L, "blik qua zorp blik qua zorp blik qua", "C"))
      .toDF("doc_id", "text", "lang")
    def run() = graft.operators.Sampling.doremiWeights(docs)
      .orderBy("lang")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4), r.getDouble(5)))
      .toSeq
    val got = run()
    assert(got == run(), "reweighting must replay identically")
    val byDom = got.map(t => t._1 -> t).toMap
    assert(byDom("C")._3 > byDom("A")._3 && byDom("C")._3 > byDom("B")._3,
      s"disjoint-vocab domain must have the largest excess CE: $got")
    assert(byDom("C")._4 > byDom("A")._4 && byDom("C")._4 > byDom("B")._4,
      s"and therefore the largest alpha: $got")
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-5,
      s"alphas must normalize: ${got.map(_._4).sum}")
  }

  test("doremiWeights: symmetric domains get exactly uniform alphas") {
    import spark.implicits._
    // A and B are relabelings of the same text -> identical excess ->
    // alpha = (1-c)*(1/2) + c*(1/2) = 0.5 exactly at 6 dp
    val docs = Seq(
      (1L, "aa bb cc dd", "A"), (2L, "aa bb cc dd", "B"))
      .toDF("doc_id", "text", "lang")
    val a = graft.operators.Sampling.doremiWeights(docs)
      .orderBy("lang").collect().map(_.getDouble(5)).toSeq
    assert(a == Seq(0.5, 0.5), s"got $a")
  }
}
