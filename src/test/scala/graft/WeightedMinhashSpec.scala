package graft

import graft.operators.Dedup

/** ICWS weighted-minhash candidates (Dedup.weightedMinhashCandidates):
  * recall vs EXACT idf-weighted Jaccard on planted pairs, and the idf
  * motivation itself — boilerplate-only overlap that fools unweighted
  * MinHash must NOT band under the weighted sampler.
  *
  * Corpus design: every doc opens with the same 24-token "chrome" block
  * (df = N ⇒ idf ≈ ln((N+1)/N), near-zero weight); planted pairs
  * (2i, 2i+1) then share a 20-token distinctive snippet (df = 2 ⇒ high
  * idf) plus 3 unique filler tokens each; control docs carry chrome +
  * filler only. Exact weighted Jaccard (computed in plain Scala below):
  * planted pairs ≈ 0.7+, boilerplate-only pairs ≈ 0.02 — the unweighted
  * shingle Jaccard of a boilerplate-only pair is ~0.6, which is exactly
  * the trap the idf weighting exists to avoid.
  */
class WeightedMinhashSpec extends SparkSpec {
  import spark.implicits._

  // digits don't survive CleanToken — encode every id in letters, or the
  // "distinct" tokens silently collapse to one and every doc aliases
  private def alpha(n: Int): String = n.toString.map(c => ('a' + (c - '0')).toChar)
  private val chrome = (1 to 24).map(i => s"chrome${alpha(i)}").mkString(" ")
  private def filler(d: Int) = (1 to 3).map(i => s"fill${alpha(d)}x${alpha(i)}").mkString(" ")
  private def snippet(p: Int) = (1 to 20).map(i => s"topic${alpha(p)}w${alpha(i)}").mkString(" ")

  // 10 planted pairs (docs 0..19) + 10 boilerplate-only controls (20..29)
  private def corpus: Seq[(Long, String)] =
    (0 until 20).map { d =>
      (d.toLong, s"$chrome ${snippet(d / 2)} ${filler(d)}")
    } ++ (20 until 30).map { d =>
      (d.toLong, s"$chrome ${filler(d)}")
    }

  /** Exact idf-weighted Jaccard over k=3 shingle sets — the ground truth
    * the ICWS collision probability estimates.
    */
  private def exactWJ(docs: Seq[(Long, String)], k: Int): Map[(Long, Long), Double] = {
    def toks(t: String) = t.split("\\s+").map(_.toLowerCase.filter(c => c >= 'a' && c <= 'z'))
      .filter(_.nonEmpty).toSeq
    def sh(t: String): Set[String] = {
      val ts = toks(t)
      if (ts.isEmpty) Set.empty
      else if (ts.size >= k) ts.sliding(k).map(_.mkString(" ")).toSet
      else Set(ts.mkString(" "))
    }
    val shs = docs.map { case (id, t) => id -> sh(t) }.toMap
    val n = shs.count(_._2.nonEmpty)
    val df = shs.values.toSeq.flatten.groupBy(identity).map { case (s, v) => s -> v.size }
    def idf(s: String) = math.max(
      math.floor(math.log((n + 1.0) / df(s)) * 1e6 + 0.5) / 1e6, 1e-6)
    (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
    } yield {
      val (sa, sb) = (shs(a), shs(b))
      val inter = (sa & sb).toSeq.map(idf).sum
      val union = (sa | sb).toSeq.map(idf).sum
      (a, b) -> (if (union == 0) 0.0 else inter / union)
    }).toMap
  }

  test("planted high-WJ pairs band; boilerplate-only overlap does not") {
    val docs = corpus.toDF("doc_id", "text")
    val wj = exactWJ(corpus, k = 3)
    val planted = (0 until 10).map(p => (2L * p, 2L * p + 1)).toSet
    // sanity on the corpus design itself: the planted pairs really are
    // high-WJ and the controls really are near-zero-WJ despite sharing
    // the whole chrome block
    planted.foreach { pr => assert(wj(pr) > 0.5, s"planted $pr WJ ${wj(pr)} too low") }
    val boiler = (for (a <- 20L until 30L; b <- (a + 1) until 30L) yield (a, b)).toSet
    boiler.foreach { pr => assert(wj(pr) < 0.1, s"control $pr WJ ${wj(pr)} too high") }

    val got = Dedup.weightedMinhashCandidates(docs, numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = planted.count(got.contains).toDouble / planted.size
    assert(recall >= 0.8, s"weighted recall $recall < 0.8 on WJ>0.5 planted pairs (got $got)")
    // LSH is probabilistic: per-seed collision p = WJ ≈ 0.02-0.05 gives an
    // expected ~0.1-0.5 stray band hits over 45 control pairs × 8 bands of
    // 2 — a couple of deterministic strays are the method, not a bug; the
    // unweighted path banding 20+ of the same pairs is the contrast pinned
    // by the next test
    val boilerHits = boiler.count(got.contains)
    assert(boilerHits <= 2,
      s"$boilerHits boilerplate-only pairs banded under idf weighting " +
        s"(expected ~0, allowed <= 2: per-seed collision p ~= WJ < 0.1)")
  }

  test("the same boilerplate-only pairs DO fool unweighted minhash (the contrast)") {
    val docs = corpus.toDF("doc_id", "text")
    val un = Dedup.minhashCandidates(docs, shingleK = 3, numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val boiler = (for (a <- 20L until 30L; b <- (a + 1) until 30L) yield (a, b)).toSet
    val fooled = boiler.count(un.contains)
    assert(fooled >= boiler.size / 2,
      s"corpus no longer demonstrates the trap: only $fooled/${boiler.size} " +
        "boilerplate-only pairs band under unweighted minhash")
  }

  test("MinStringAgg == declarative min(string) on random grouped data, plans ObjectHashAggregate") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftBridge
    val rnd = new scala.util.Random(31L)
    val rows = (0 until 4000).map { i =>
      (s"g${i % 37}", if (rnd.nextInt(20) == 0) null else rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
    }
    val df = rows.toDF("g", "v").repartition(8)
    def minStr(c: org.apache.spark.sql.Column) = GraftBridge.column(
      graft.plans.MinStringAgg(GraftBridge.expression(c)).toAggregateExpression())
    val typed = df.groupBy("g").agg(minStr(col("v")).as("m"))
    val want = df.groupBy("g").agg(min(col("v")).as("m"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val got = typed.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == want, "typed min must equal declarative min incl. null groups")
    assert(typed.queryExecution.executedPlan.toString.contains("ObjectHashAggregate"),
      "min_str must plan as ObjectHashAggregate (the whole point)")
  }

  test("deterministic: two runs emit identical candidates") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run() = Dedup.weightedMinhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run() == run(), "md5-deterministic draws must replay identically")
  }
}
