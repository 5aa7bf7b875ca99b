package graft

import graft.operators.{InvertedIndex, Search, Tokenize}

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val postings = InvertedIndex.postings(
    Tokenize.tokens(
      Seq(
        (1L, "spark runs fast queries"),
        (2L, "spark joins tables"),
        (3L, "ducks swim"),
        (4L, "Spark! spark SPARK joins")).toDF("doc_id", "text"),
      "text", Seq("doc_id")))

  test("AND query requires every term") {
    val got = Search.andQuery(postings, Seq("spark", "joins")).as[Long].collect().toSeq
    assert(got == Seq(2L, 4L))
  }

  test("OR query ranks by distinct terms matched") {
    val got = Search
      .orQuery(postings, Seq("spark", "swim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("facetCounts: per-facet counts equal direct counts over the AND hit set") {
    val meta = Seq(
      (1L, "en", "web"), (2L, "en", "book"), (3L, "de", "web"), (4L, "en", "web"))
      .toDF("doc_id", "lang", "source")
    val got = Search
      .facetCounts(postings, Seq("spark", "joins"), meta, Seq("lang", "source"))
      .orderBy("facet", "value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // AND hits = {2, 4} -> lang en:2; source book:1 (doc 2), web:1 (doc 4)
    assert(got == Seq(("lang", "en", 2L), ("source", "book", 1L), ("source", "web", 1L)),
      s"got $got")
  }

  test("spellSuggest: exact term self-suggests at dist 0, rank is dist then frequency") {
    val toks = Tokenize.tokens(Seq(
      (1L, "spark spark spark sparks stark shark park"),
      (2L, "spark sparks")).toDF("doc_id", "text"), "text", Seq("doc_id"))
    val got = Search.spellSuggest(toks, Seq("spark", "sprak"), maxDist = 2, k = 3)
      .orderBy("qterm", "dist", "suggestion")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    val bySpark = got.filter(_._1 == "spark")
    assert(bySpark.head == ("spark", "spark", 0), s"exact self-suggest first: $bySpark")
    // 'sprak' -> spark (dist 2 transposition as 2 edits... levenshtein('sprak','spark') = 2)
    val bySprak = got.filter(_._1 == "sprak")
    assert(bySprak.nonEmpty && bySprak.forall(_._3 <= 2), s"in-budget suggestions: $bySprak")
    assert(bySprak.map(_._2).contains("spark"), s"the intended word is suggested: $bySprak")
  }

  test("autocomplete: frequency-ranked completions per prefix, k-capped, no cross-prefix leaks") {
    val toks = Tokenize.tokens(Seq(
      (1L, "spark spark spark stream stream stark batch big"),
      (2L, "spark stream sort batch")).toDF("doc_id", "text"), "text", Seq("doc_id"))
    val got = Search.autocomplete(toks, Seq("s", "b"), k = 2)
      .orderBy("prefix", "rn")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSeq
    // s-vocab: spark 4, stream 3, stark 1, sort 1 -> top-2 = spark, stream
    assert(got.filter(_._1 == "s") == Seq(("s", "spark", 4L, 1), ("s", "stream", 3L, 2)), s"got $got")
    // b-vocab: batch 2, big 1
    assert(got.filter(_._1 == "b") == Seq(("b", "batch", 2L, 1), ("b", "big", 1L, 2)), s"got $got")
    // every completion actually extends its prefix
    got.foreach { case (p, c, _, _) => assert(c.startsWith(p)) }
  }

  test("keywords: per-doc tf-idf top-k, ubiquitous terms score zero and sink") {
    val toks = Tokenize.tokens(Seq(
      (1L, "the apple apple banana"),
      (2L, "the banana cherry"),
      (3L, "the cherry date date date")).toDF("doc_id", "text"), "text", Seq("doc_id"))
    val got = Search.keywords(toks, k = 2)
      .orderBy("doc_id", "rn")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    // doc 3: date tf=3 df=1 -> 3*ln(3)=3.2958; cherry tf=1 df=2 -> ln(1.5)=0.4055
    val d3 = got.filter(_._1 == 3L)
    assert(d3.map(_._2) == Seq("date", "cherry"), s"doc-3 rank: $d3")
    assert(d3.head._4 == 3.2958 && d3(1)._4 == 0.4055, s"doc-3 scores: $d3")
    // 'the' appears in every doc: ln(N/df)=0, so it can never beat a
    // distinctive term — absent from every top-2 here
    assert(!got.exists(_._2 == "the"), s"ubiquitous term must not surface: $got")
  }

  test("retrievalEval: recall@k and MRR@k hand-checked; no-relevant queries emit no row") {
    val toks = Tokenize.tokens(Seq(
      (1L, "spark query spark"),
      (2L, "spark query"),
      (3L, "spark alone here"),
      (4L, "unrelated words only")).toDF("doc_id", "text"), "text", Seq("doc_id"))
    val qs = Seq(1 -> Seq("spark", "query"), 2 -> Seq("absentword"))
    // k=10: both relevant docs {1,2} surface -> recall 1.0, first rank 1 -> mrr 1.0
    val at10 = Search.retrievalEval(toks, qs, k = 10)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(at10.keySet == Set(1), "query with no relevant docs must emit no row")
    assert(at10(1) == ((2L, 2L, 1.0, 1.0)), s"full recall at k=10: ${at10(1)}")
    // k=1: only one of two relevant docs fits -> recall 0.5, mrr still 1.0
    val at1 = Search.retrievalEval(toks, Seq(1 -> Seq("spark", "query")), k = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).head
    assert(at1 == ((2L, 1L, 0.5, 1.0)), s"k=1 truncation: $at1")
  }

  test("avgPrecisionEval: front-loaded relevance reads 1.0; interleaving matches the metric mirror") {
    val toks = Tokenize.tokens(Seq(
      (1L, "spark query spark"),
      (2L, "spark query"),
      (3L, "spark alone here"),
      (4L, "unrelated words only")).toDF("doc_id", "text"), "text", Seq("doc_id"))
    val qs = Seq(1 -> Seq("spark", "query"), 2 -> Seq("absentword"))
    val got = Search.avgPrecisionEval(toks, qs, k = 10)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(1), "empty truth set emits no row")
    // both relevant docs lead the ranking: AP = (1/1 + 2/2)/2 = 1.0
    assert(got(1) == ((2L, 2L, 1.0)), s"got ${got(1)}")

    // interleaved case: the long both-term doc sinks below a one-term
    // doc under length normalization; AP must equal the metric applied
    // by hand to the engine's OWN ranking and the independent truth set
    val longDoc = "spark query " + Seq.fill(40)("filler").mkString(" ")
    val corpus = Seq(
      (1L, "spark query"), (2L, "spark spark spark"),
      (3L, longDoc), (4L, "none of these"))
    val toks2 = Tokenize.tokens(corpus.toDF("doc_id", "text"), "text", Seq("doc_id"))
    val q2 = Seq(5 -> Seq("spark", "query"))
    val gotAp = Search.avgPrecisionEval(toks2, q2, k = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).head
    val ranked = Search.bm25Query(toks2, Seq("spark", "query"))
      .orderBy(org.apache.spark.sql.functions.desc("score"),
        org.apache.spark.sql.functions.asc("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val rel = corpus.filter { case (_, t) =>
      t.split(" ").toSet.intersect(Set("spark", "query")).size == 2
    }.map(_._1).toSet
    var hits = 0
    val terms = ranked.zipWithIndex.collect { case (d, i) if rel(d) =>
      hits += 1; hits.toDouble / (i + 1)
    }
    val want = math.floor(terms.sum / math.min(rel.size, 10) * 1e4 + 0.5) / 1e4
    assert(gotAp == ((rel.size.toLong, want)), s"got $gotAp, mirror $want over ranking $ranked")
    assert(want < 1.0, "the fixture must actually interleave")
  }

  test("ndcgEval: uniform grades score 1.0; graded misordering matches the metric mirror") {
    // single-term query: every relevant doc has grade 1, so ANY order is
    // ideal -> nDCG is exactly 1.0
    val toks = Tokenize.tokens(Seq(
      (1L, "apple pear"),
      (2L, "apple apple plum"),
      (3L, "grape only")).toDF("doc_id", "text"), "text", Seq("doc_id"))
    val uni = Search.ndcgEval(toks, Seq(1 -> Seq("apple")), k = 10)
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3))).head
    assert(uni._3 == 1.0 && uni._1 == uni._2, s"uniform grades are order-free: $uni")

    // graded query where BM25 ranks a grade-1 doc above the grade-2 doc
    // (the grade-2 doc is LONG, so length normalization sinks it): nDCG
    // must equal the independent metric mirror computed from the
    // engine's OWN ranking, and be < 1
    val longDoc = "apple banana " + Seq.fill(40)("filler").mkString(" ")
    val toks2 = Tokenize.tokens(Seq(
      (1L, "apple apple apple"),       // grade 1, short -> big length boost
      (2L, longDoc),                   // grade 2, 42 words -> normalized down
      (3L, "banana other"),            // grade 1
      (4L, "none of these")).toDF("doc_id", "text"), "text", Seq("doc_id"))
    val q = Seq(7 -> Seq("apple", "banana"))
    val got = Search.ndcgEval(toks2, q, k = 10)
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3))).head
    // mirror: take the engine's BM25 ranking, apply the metric by hand
    val ranked = Search.bm25Query(toks2, Seq("apple", "banana"))
      .orderBy(org.apache.spark.sql.functions.desc("score"), org.apache.spark.sql.functions.asc("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val rel = Map(1L -> 1, 2L -> 2, 3L -> 1)
    def gain(r: Int) = math.pow(2.0, r) - 1.0
    val dcg = ranked.zipWithIndex.map { case (id, i) =>
      gain(rel.getOrElse(id, 0)) / (math.log(i + 2.0) / math.log(2.0)) }.sum
    val ideal = rel.values.toSeq.sorted.reverse
    val idcg = ideal.zipWithIndex.map { case (r, i) =>
      gain(r) / (math.log(i + 2.0) / math.log(2.0)) }.sum
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(got == ((r4(dcg), r4(idcg), r4(dcg / idcg))), s"got $got vs mirror ${(r4(dcg), r4(idcg), r4(dcg / idcg))}")
    assert(got._3 < 1.0, s"misordered graded ranking must lose nDCG: $got")
  }

  test("suffixQuery: reversed-prefix serving == direct ends_with semantics") {
    val toks = Tokenize.tokens(Seq(
      (1L, "running swimming ran walk"),
      (2L, "running talking walked"),
      (3L, "sing thing wing")).toDF("doc_id", "text"), "text", Seq("doc_id"))
    val postings = InvertedIndex.postings(toks)
    val got = Search.suffixQuery(postings, "ing", k = 10)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    // direct semantic mirror: vocabulary terms ending in "ing"
    val want = postings.where(org.apache.spark.sql.functions.col("word").endsWith("ing"))
      .select("word", "df")
      .orderBy(org.apache.spark.sql.functions.desc("df"), org.apache.spark.sql.functions.asc("word"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == want && got.nonEmpty, s"got $got")
    assert(got.head == (("running", 2)), s"df-ranked first: ${got.head}")
    assert(!got.exists(_._1 == "walk") && !got.exists(_._1 == "walked"))
  }

  test("snippets: window clamps at doc start, all matched terms uppercase") {
    val docs = Seq(
      (1L, "spark leads the doc and more words follow here"),
      (2L, "one two three four five spark six seven"),
      (3L, "nothing to see")).toDF("doc_id", "text")
    val arr = Search.snippets(docs, Seq("spark"), window = 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(arr.map(_._1).toSeq == Seq(1L, 2L), "only matching docs emit")
    assert(arr(0)._2 == "SPARK leads the doc", s"clamped-at-start snippet: ${arr(0)._2}")
    assert(arr(1)._2 == "three four five SPARK six seven", s"centered snippet: ${arr(1)._2}")
  }

  test("prunedTfPostings equals window-based top-n selection exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = Tokenize.tokens(docs, "text", Seq("doc_id"))
    val pruned = InvertedIndex.prunedTfPostings(toks, n = 3)
      .orderBy("word", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val tfp = toks.groupBy(col("word"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("word")).orderBy(desc("tf"), asc("doc_id"))
    val mirror = tfp
      .withColumn("df_full", count(lit(1)).over(Window.partitionBy(col("word"))))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("word"), col("doc_id"), col("tf"), col("df_full"))
      .orderBy("word", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(pruned == mirror, s"pruned ${pruned.take(5)}... vs mirror ${mirror.take(5)}...")
  }

  test("index-served BM25 equals token-stream BM25 exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = Tokenize.tokens(docs, "text", Seq("doc_id"))
    val terms = Seq("spark", "vector", "window")
    // compare at the query surface's 4-dp rounding: the per-term weights
    // are bit-identical, but sum()'s accumulation ORDER is plan-dependent,
    // so raw doubles differ in the last ulp between the two plans — the
    // same reason every score-bearing query rounds before the oracle
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    val fromStream = Search.bm25Query(toks, terms)
      .collect().map(r => (r.getLong(0), r4(r.getDouble(1)))).toMap
    val fromIndex = Search.bm25Indexed(
      InvertedIndex.tfPostings(toks),
      InvertedIndex.docLengths(toks), terms)
      .collect().map(r => (r.getLong(0), r4(r.getDouble(1)))).toMap
    assert(fromIndex.nonEmpty)
    assert(fromIndex == fromStream)
  }

  test("index-served TF-IDF equals token-stream TF-IDF exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = Tokenize.tokens(docs, "text", Seq("doc_id"))
    val terms = Seq("spark", "vector", "window")
    // 4-dp query-surface compare for the same accumulation-order reason as
    // the BM25 twin above
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    val fromStream = Search.tfidfQuery(toks, terms)
      .collect().map(r => (r.getLong(0), r4(r.getDouble(1)))).toMap
    val fromIndex = Search.tfidfIndexed(
      InvertedIndex.tfPostings(toks),
      InvertedIndex.docLengths(toks), terms)
      .collect().map(r => (r.getLong(0), r4(r.getDouble(1)))).toMap
    assert(fromIndex.nonEmpty)
    assert(fromIndex == fromStream)
  }

  test("rrfFuse: both-list docs beat single-list; absent list contributes zero") {
    import spark.implicits._
    val l1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val l2 = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val got = Search.rrfFuse(Seq(l1, l2), k = 10, c = 60)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // doc 20: 1/62 + 1/61 tops everything; singles follow by their one rank
    assert(got.head._1 == 20L && got.head._2 == 2)
    assert(math.abs(got.head._3 - math.floor((1.0 / 62 + 1.0 / 61) * 1e8 + 0.5) / 1e8) < 1e-12)
    val singles = got.tail
    assert(singles.map(_._1).toSeq == Seq(10L, 40L, 30L),
      s"singles rank by their own list position: ${singles.toSeq}")
    assert(singles.forall(_._2 == 1))
  }

  test("nearQuery: minimal span exact; window excludes far co-occurrence; AND-like prune") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "spark joins tables fast"),               // spark..tables span 2
      (2L, "spark a b c d e f g h i j k tables"),    // span 12 — outside window 5
      (3L, "tables only here"),                      // missing 'spark'
      (4L, "tables spark")                           // reversed order, span 1
    ).toDF("doc_id", "text")
    val got = Search.nearQuery(corpus, Seq("spark", "tables"), window = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == Seq((1L, 2), (4L, 1)), s"got ${got.toSeq}")
    // widening the window admits doc 2 with its exact span
    val wide = Search.nearQuery(corpus, Seq("spark", "tables"), window = 12)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(wide(2L) == 12)
  }

  test("moreLikeThis: near-copy ranks first, disjoint-vocab doc absent, self excluded") {
    val corpus = Seq(
      (1L, "spark runs fast distributed queries on tables"),
      (2L, "spark runs fast distributed queries on tables today"), // near-copy of 1
      (3L, "spark joins two tables"),                              // partial overlap
      (4L, "ducks swim in ponds")                                  // disjoint vocab
    ).toDF("doc_id", "text")
    val got = Search
      .moreLikeThis(Tokenize.tokens(corpus, "text", Seq("doc_id")), queryId = 1L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(!got.map(_._1).contains(1L), "query doc must not match itself")
    assert(!got.map(_._1).contains(4L), "no shared terms -> no candidate row")
    assert(got.head._1 == 2L, s"near-copy should rank first, got ${got.toSeq}")
    assert(got.forall(t => t._2 > 0.0 && t._2 <= 1.0001), "cosine in (0, 1]")
    assert(got.map(_._2).sorted.reverse.toSeq == got.map(_._2).toSeq, "descending order")
  }

  test("prfExpand: an expansion-only doc invisible to base BM25 enters the expanded results") {
    // 'cluster' co-occurs with 'spark' in every feedback doc, so PRF must
    // lift it — and doc 10, which says only 'cluster', scores ZERO under
    // the base query but must appear after expansion. Filler docs keep
    // the corpus idf meaningful.
    val corpus = (Seq(
      (1L, "spark cluster cluster runs the job"),
      (2L, "spark cluster cluster scales out"),
      (3L, "spark cluster cluster schedules work"),
      (10L, "cluster cluster cluster maintenance notes")
    ) ++ (20L to 29L).map(i => (i, s"filler document number about topic$i words"))).toDF("doc_id", "text")
    val toks = Tokenize.tokens(corpus, "text", Seq("doc_id"))
    val base = Search.bm25Query(toks, Seq("spark")).collect().map(_.getLong(0)).toSet
    assert(!base.contains(10L), "doc 10 has no base term")
    val got = Search.prfExpand(toks, Seq("spark"), fbDocs = 3, expandTerms = 1, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).contains(10L),
      s"expansion must surface the cluster-only doc: ${got.toSeq}")
    assert(got.map(_._1).toSet.intersect(Set(1L, 2L, 3L)) == Set(1L, 2L, 3L),
      "feedback docs still rank")
    // deterministic: same result on a re-run over a different partitioning
    val again = Search.prfExpand(Tokenize.tokens(corpus.repartition(7), "text", Seq("doc_id")),
      Seq("spark"), fbDocs = 3, expandTerms = 1, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == again.toSeq, "PRF must be partitioning-independent")
  }

  test("query terms go through the reference tokenizer (case, punctuation)") {
    val got = Search.andQuery(postings, Seq("SPARK!", "jo-ins")).as[Long].collect().toSeq
    assert(got == Seq(2L, 4L))
    // a term that cleans to empty is dropped, not impossible-to-match
    val gotEmptyTerm = Search.andQuery(postings, Seq("spark", "42")).as[Long].collect().toSeq
    assert(gotEmptyTerm == Seq(1L, 2L, 4L))
  }

  test("qldQuery: hand-computed Dirichlet likelihoods; absent terms pay smoothing mass") {
    // d1 = [a a b], d2 = [b c]; query (a, c), μ=2: ctot=5, ctf(a)=2, ctf(c)=1
    val toks = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "b"), (2L, "c"))
      .toDF("doc_id", "word")
    val got = Search.qldQuery(toks, Seq("a", "c"), mu = 2.0)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    def term(tf: Double, ctf: Double, dl: Double) =
      math.log((tf + 2.0 * (ctf / 5.0)) / (dl + 2.0))
    val s1 = term(2.0, 2.0, 3.0) + term(0.0, 1.0, 3.0)
    val s2 = term(0.0, 2.0, 2.0) + term(1.0, 1.0, 2.0)
    assert(got.length == 2, s"both docs are candidates: ${got.toSeq}")
    assert(math.abs(got(0)._2 - s1) < 1e-12 && math.abs(got(1)._2 - s2) < 1e-12,
      s"scores: ${got.toSeq} vs ($s1, $s2)")
    // a doc with NO query term is not a candidate
    val toks3 = toks.unionAll(Seq((3L, "z")).toDF("doc_id", "word"))
    assert(Search.qldQuery(toks3, Seq("a", "c"), mu = 2.0).count() == 2)
    // a query term absent from the corpus drops out instead of -inf
    val gotDrop = Search.qldQuery(toks, Seq("a", "zzz"), mu = 2.0)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(gotDrop.toSeq == Seq((1L, term(2.0, 2.0, 3.0))), s"${gotDrop.toSeq}")
  }

  test("wilsonCi: bounds stay inside [0,1] at the edges and bracket p-hat") {
    import graft.operators.Stats
    val df = (Seq.fill(3)(("zero", false)) ++ Seq.fill(3)(("one", true))
      ++ Seq.fill(1)(("mid", true)) ++ Seq.fill(3)(("mid", false)))
      .toDF("g", "ok")
    val got = Stats.wilsonCi(df, "g", "ok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    val byG = got.map(t => t._1 -> t).toMap
    val (z, n) = (1.959964, 4.0)
    // mid: p=1/4 — verify the closed form verbatim
    val p = 1.0 / 4.0
    val denom = 1.0 + z * z / n
    val center = (p + z * z / (2.0 * n)) / denom
    val half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * (n * n))) / denom
    def p6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(byG("mid")._5 == p6(center - half) && byG("mid")._6 == p6(center + half),
      s"mid: ${byG("mid")}")
    // p-hat=0: lo pins to 0 (to rounding), hi strictly positive
    assert(math.abs(byG("zero")._5) <= 1e-6 && byG("zero")._6 > 0.0, s"${byG("zero")}")
    // p-hat=1: hi pins to 1, lo strictly below
    assert(math.abs(byG("one")._6 - 1.0) <= 1e-6 && byG("one")._5 < 1.0, s"${byG("one")}")
  }

  test("ltrFeatures: hand-computed feature vector per candidate; no-match docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark window foo"),
      (2L, "foo bar"),
      (3L, "vector")).toDF("doc_id", "text")
    val got = Search
      .ltrFeatures(Tokenize.tokens(docs, "text", Seq("doc_id")),
        Seq("spark", "vector", "window"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    def r4(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    // n_docs=3, avgdl=7/3; every query term has df 1 -> same idf
    val idf = math.log((3 - 1 + 0.5) / 1.5 + 1.0)
    def w(tf: Long, dl: Long) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (7.0 / 3.0)))
    val ti = (tf: Long) => tf * math.log(3.0 / 1.0)
    assert(got.toSeq == Seq(
      (1L, 4L, 2L, 3L, r4(w(2, 4) + w(1, 4)), r4(ti(2) + ti(1)), r4(2.0 / 3.0)),
      (3L, 1L, 1L, 1L, r4(w(1, 1)), r4(ti(1)), r4(1.0 / 3.0))),
      s"got: ${got.toSeq}")
  }

  test("kwic: 1-based positions, edge-clamped contexts, (doc,pos) top-k; raw terms rejected") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The Data, data! end"), // tokens [the, data, data, end]
      (2L, "data"),
      (3L, "no match here")).toDF("doc_id", "text")
    val got = Search.kwic(docs, "data", width = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 2, "the", "data end"),
      (1L, 3, "the data", "end"),
      (2L, 1, "", "")), s"got: ${got.toSeq}")
    // k truncates in (doc, pos) order
    assert(Search.kwic(docs, "data", width = 2, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 2), (1L, 3)))
    // a non-cleaned term can never match: reject loudly instead
    intercept[IllegalArgumentException](Search.kwic(docs, "Data"))
    intercept[IllegalArgumentException](Search.kwic(docs, "data1"))
  }
}
