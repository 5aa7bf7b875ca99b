package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Pins [[Dedup.prefixJaccardJoin]]'s exactness claim: prefix-filtered
  * candidate generation plus exact verification must equal brute-force
  * all-pairs Jaccard — recall 1.0 is a theorem of the prefix rule, and
  * this spec is the executable proof on real data. The DuckDB oracle
  * (q_setsim_join) re-proves it cross-engine at sf0.01.
  */
class SetSimSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force truth: every doc pair's exact shingle Jaccard, no
    * filtering of any kind (O(N²) — test-scale only).
    */
  private def bruteForce(docs: org.apache.spark.sql.DataFrame, thr: Double, k: Int) = {
    val sets = TextAnalysis
      .withShingles(docs, "text", k, "__sh")
      .select(col("doc_id").as("id"), col("__sh").as("set"))
      .where(size(col("set")) > 0)
    sets.as("a")
      .join(sets.as("b"), col("a.id") < col("b.id"))
      .select(
        col("a.id").as("doc1"),
        col("b.id").as("doc2"),
        (size(array_intersect(col("a.set"), col("b.set"))).cast("double") /
          (size(col("a.set")) + size(col("b.set")) -
            size(array_intersect(col("a.set"), col("b.set")))).cast("double")).as("j"))
      .where(col("j") >= thr)
      .select(col("doc1"), col("doc2"),
        graft.functions.Portable.pround(col("j"), 4).as("jaccard"))
  }

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  test("prefix-filtered join == brute-force all-pairs (exactness on real data)") {
    for (thr <- Seq(0.3, 0.5, 0.8)) {
      val got  = Dedup.prefixJaccardJoin(docs, thr).collect().toSet.map((r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val want = bruteForce(docs, thr, 2).collect().toSet.map((r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got == want, s"threshold $thr: prefix join diverged from brute force")
      assert(want.nonEmpty || thr > 0.5, s"threshold $thr found no pairs — corpus not exercising the operator")
    }
  }

  test("planted near-duplicate pair is found with the exact similarity") {
    val planted = Seq(
      (9001L, "alpha beta gamma delta epsilon zeta"),
      (9002L, "alpha beta gamma delta epsilon eta"),   // 4/6 bigram overlap
      (9003L, "totally unrelated content right here")
    ).toDF("doc_id", "text")
    val got = Dedup
      .prefixJaccardJoin(docs.unionByName(planted), threshold = 0.5)
      .where(col("doc1") === 9001L || col("doc2") === 9001L)
      .collect()
    // shingles k=2: {alpha beta, beta gamma, gamma delta, delta epsilon, epsilon zeta/eta}
    // intersection 4, union 6 → jaccard 0.6667
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((9001L, 9002L)))
    assert(got.head.getDouble(2) == 0.6667)
  }

  test("maxBucket cap binds BEFORE pair expansion: saturated prefix bucket emits no pairs") {
    // every doc's only shingle is identical → one bucket of size 6 > cap 4
    val degenerate = (1L to 6L).map(i => (i, "same same")).toDF("doc_id", "text")
    val capped = Dedup.prefixJaccardJoin(degenerate, threshold = 0.5, maxBucket = 4)
    assert(capped.count() == 0)
    // uncapped, the same corpus yields all 15 identical pairs at jaccard 1.0
    val full = Dedup.prefixJaccardJoin(degenerate, threshold = 0.5)
    assert(full.count() == 15 && full.agg(min("jaccard")).head.getDouble(0) == 1.0)
  }

  test("randomized corpora: prefix join == in-memory brute force (seeded fuzz)") {
    // the exactness theorem, fuzzed: random corpora from a small vocab so
    // shingle collisions and boundary similarities actually occur
    val vocab = Seq("ape", "bee", "cat", "dog", "eel", "fox", "gnu", "hen")
    def bruteLocal(corpus: Seq[(Long, String)], thr: Double): Set[(Long, Long)] = {
      def shingles(text: String): Set[String] = {
        val toks = text.split("\\s+").map(_.toLowerCase.replaceAll("[^a-z]", "")).filter(_.nonEmpty)
        if (toks.isEmpty) Set.empty
        else if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).toSet
        else Set(toks.mkString(" "))
      }
      val sets = corpus.map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)
      (for {
        (i1, s1) <- sets; (i2, s2) <- sets if i1 < i2
        inter = (s1 & s2).size
        if inter.toDouble / (s1.size + s2.size - inter) >= thr
      } yield (i1, i2)).toSet
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6; thr <- Seq(0.4, 0.7)) {
      val corpus = (1L to 12L).map { id =>
        id -> Seq.fill(2 + rnd.nextInt(7))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val got = Dedup
        .prefixJaccardJoin(corpus.toDF("doc_id", "text"), thr)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = bruteLocal(corpus, thr)
      assert(got == want, s"trial $trial thr $thr: $got != $want\ncorpus $corpus")
    }
  }

  test("dfCap stop-shingle mode == brute force over the df-filtered sets") {
    // brute-force mirror of the capped semantics: per-shingle df over the
    // distinct per-doc shingle relation, sets filtered to df <= cap, docs
    // with empty filtered sets dropped, exact Jaccard over what remains
    def bruteCapped(d: org.apache.spark.sql.DataFrame, thr: Double, k: Int, cap: Int) = {
      val ex = TextAnalysis.withShingles(d, "text", k, "__sh")
        .select(col("doc_id").as("id"), explode(col("__sh")).as("g"))
      val dfreq = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val sets = ex.join(dfreq, Seq("g")).where(col("df") <= cap)
        .groupBy(col("id")).agg(sort_array(collect_set(col("g"))).as("set"))
      sets.as("a").join(sets.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("doc1"), col("b.id").as("doc2"),
          (size(array_intersect(col("a.set"), col("b.set"))).cast("double") /
            (size(col("a.set")) + size(col("b.set")) -
              size(array_intersect(col("a.set"), col("b.set")))).cast("double")).as("j"))
        .where(col("j") >= thr)
        .select(col("doc1"), col("doc2"),
          graft.functions.Portable.pround(col("j"), 4).as("jaccard"))
    }
    // plant a hot boilerplate shingle shared by 5 docs so cap=3 cuts it
    val hot = (9100L until 9105L).map(i =>
      (i, s"shared boilerplate trigram here plus unique u${i}a u${i}b")).toDF("doc_id", "text")
    val corpus = docs.unionByName(hot)
    for (cap <- Seq(2, 3)) {
      val got = Dedup.prefixJaccardJoin(corpus, threshold = 0.3, shingleK = 3, dfCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = bruteCapped(corpus, 0.3, 3, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, s"cap $cap: capped join diverged from filtered brute force")
    }
    // and the cap genuinely changes the result on this corpus (the hot
    // shingles ARE the planted docs' overlap)
    val uncapped = Dedup.prefixJaccardJoin(corpus, threshold = 0.3, shingleK = 3)
      .where(col("doc1") >= 9100L).count()
    val capped = Dedup.prefixJaccardJoin(corpus, threshold = 0.3, shingleK = 3, dfCap = 3)
      .where(col("doc1") >= 9100L).count()
    assert(uncapped > capped,
      s"planted hot-shingle pairs must drop under the cap ($uncapped -> $capped)")
  }

  test("token-less docs are excluded, not matched to each other") {
    val empties = Seq((8001L, "123 456 !!!"), (8002L, "789 ... ???")).toDF("doc_id", "text")
    val got = Dedup
      .prefixJaccardJoin(empties, threshold = 0.5)
      .collect()
    assert(got.isEmpty, "numeric/punctuation-only docs must not become duplicates of each other")
  }

  test("containmentPairs: planted quote hits 1.0 where its Jaccard is invisible") {
    val page = (1 to 60).map(i => s"w${('a' + i / 26).toChar}${('a' + i % 26).toChar}").mkString(" ")
    val corpus = Seq(
      (1L, page),
      (2L, "completely different words entirely unrelated content here")
    ).toDF("doc_id", "text")
    val quote = page.split(" ").slice(10, 20).mkString(" ") // 10 tokens from doc 1
    val queries = Seq(
      (100L, quote),
      (101L, "nothing shared with any corpus doc at all honestly")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(corpus, queries, shingleK = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((100L, 1L, 1.0)),
      s"only the planted quote→source pair, at containment 1.0: ${got.toSeq}")
    // and the point of the operator: the same pair's symmetric Jaccard is
    // tiny (8 quote shingles vs 58 page shingles), far below any dedup bar
    val jac = 8.0 / 58.0
    assert(jac < 0.15, "sanity: the quote is invisible to Jaccard at this size ratio")
  }

  test("containmentPairs: partial overlap below threshold is dropped, above is kept") {
    val corpus = Seq((1L, "aa bb cc dd ee ff gg hh ii jj")).toDF("doc_id", "text")
    // 6-token query, 4 shingles: 2 inside doc 1 ("cc dd ee", "dd ee ff"), 2 not
    val half = Seq((200L, "cc dd ee ff zz yy")).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(corpus, half, 3, threshold = 0.9).collect().isEmpty,
      "containment 0.5 must not clear a 0.9 bar")
    val got = Dedup.containmentPairs(corpus, half, 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((200L, 1L, 0.5)), s"exact ratio at the 0.5 bar: ${got.toSeq}")
  }

  test("threshold sweep bands: the q_dedup_threshold_sweep composition on hand pairs") {
    import spark.implicits._
    // pair (1,2): identical → jaccard 1.0, band 9
    // pair (3,4): shingles {abc,bcd,cde} vs {abc,bcd,cdf} → 2/4 = 0.5, band 5
    val docs = Seq(
      (1L, "aa bb cc dd"), (2L, "aa bb cc dd"),
      (3L, "a b c d e"), (4L, "a b c d f")
    ).toDF("doc_id", "text")
    val banded = Dedup.prefixJaccardJoin(docs, threshold = 0.5, shingleK = 3)
      .withColumn("band", least(floor(col("jaccard") * 10), lit(9.0)).cast("int"))
      .groupBy(col("band")).agg(count(lit(1)).as("n_pairs"))
      .localCheckpoint(true)
    val got = banded
      .join(banded.select(col("band").as("b2"), col("n_pairs").as("n2")),
        col("b2") >= col("band"))
      .groupBy(col("band"))
      .agg(first(col("n_pairs")).as("n"), sum(col("n2")).as("cum"))
      .orderBy("band")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List((5, 1L, 2L), (9, 1L, 1L)),
      s"band rows + at-or-above cumulation: $got")
  }
}
