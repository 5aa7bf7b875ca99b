package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Graph, InvertedIndex, Layout, Sampling, Stats, Tokenize}

/** Round-7 corpus/layout/graph additions: chunking, per-group cap,
  * delta-encoded postings, z-order keys, triangle counting, table stats.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // distinct all-alpha words (digits would be stripped by the tokenizer)
  private def word(i: Int): String = s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}"

  private lazy val docs = Seq(
    (0L, "src0", (0 until 50).map(word).mkString(" ")),
    (1L, "src0", (0 until 24).map(word).mkString(" ")),
    (2L, "src1", "alpha beta gamma"),
    (3L, "src1", "??? !!! ..."), // cleans to zero tokens
    (4L, "src1", "solo")
  ).toDF("doc_id", "source", "text")

  // ------------------------------------------------------------- chunking

  test("chunking with stride == size partitions the token stream exactly") {
    val chunks = Chunking.chunkTokens(docs, size = 8, stride = 8)
      .orderBy("doc_id", "chunk_id")
      .select(col("doc_id"), col("chunk"))
      .as[(Long, Seq[String])].collect()
    val rebuilt = chunks.groupBy(_._1).view.mapValues(_.flatMap(_._2).toSeq).toMap
    val expected = docs.select(col("doc_id"), Tokenize.tokenArray(col("text")))
      .as[(Long, Seq[String])].collect().toMap
    for ((id, toks) <- expected if toks.nonEmpty)
      assert(rebuilt(id) == toks, s"doc $id not reconstructed from disjoint chunks")
    assert(!rebuilt.contains(3L), "zero-token doc must yield no chunks")
  }

  test("overlapping chunks: consecutive windows share size - stride tokens") {
    val chunks = Chunking.chunkTokens(docs.where(col("doc_id") === 0L), size = 32, stride = 24)
      .orderBy("chunk_id").as[(Long, Int, Seq[String], Int)].collect()
    // doc 0 has 50 tokens -> starts 0, 24, 48 -> sizes 32, 26, 2
    assert(chunks.map(_._4).toSeq == Seq(32, 26, 2))
    val Seq(c0, c1, _) = chunks.map(_._3).toSeq
    assert(c0.takeRight(8) == c1.take(8), "24-stride windows must overlap by 8 tokens")
  }

  // ------------------------------------------------------- per-group cap

  test("textTiling: planted topic shifts are the boundaries; identical blocks are not") {
    // three 10-token topics with disjoint vocab, block=5: sims alternate
    // 1,0,1,0,1 -> depths 0,2,0,2,0; cutoff = 0.8 - sqrt(0.96)/2 ~ 0.31
    val text1 = (Seq.fill(2)(Seq("aa", "ab", "ac", "ad", "ae"))
      ++ Seq.fill(2)(Seq("ba", "bb", "bc", "bd", "be"))
      ++ Seq.fill(2)(Seq("ca", "cb", "cc", "cd", "ce"))).flatten.mkString(" ")
    val tiles = Chunking.textTiling(
      Seq((1L, text1), (2L, "short doc only")).toDF("doc_id", "text"), block = 5)
      .orderBy("doc_id", "gap").collect()
    assert(tiles.forall(_.getLong(0) == 1L), "a one-block doc emits no gaps")
    val rows = tiles.map(r => (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.toSeq == Seq(
      (0, 1.0, 0.0, false),
      (1, 0.0, 2.0, true),
      (2, 1.0, 0.0, false),
      (3, 0.0, 2.0, true),
      (4, 1.0, 0.0, false)), rows.toSeq.toString)
  }

  test("perGroupCap selects exactly the window-based rows, capped per group") {
    val big = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val rk = conv(substring(md5(concat(lit("cap:"), col("doc_id").cast("string"))), 1, 13), 16, 10)
      .cast("long")
    val w = Window.partitionBy(col("source")).orderBy(col("rk"), col("doc_id"))
    val expected = big.withColumn("rk", rk)
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 7)
      .select(col("source"), col("doc_id"), col("rk"))
      .collect().map(_.toSeq).toSet
    val got = Sampling.perGroupCap(big, "source", "doc_id", cap = 7)
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.size == 21, "3 groups x cap 7")
  }

  // -------------------------------------------------- delta postings

  test("delta postings: gaps reconstruct the posting list; varint bytes bounded") {
    val postings = InvertedIndex.postings(Tokenize.tokens(docs, "text", Seq("doc_id")))
    val gaps = postings
      .select(col("word"), col("doc_ids"),
        transform(col("doc_ids"), (x, i) =>
          when(i === 0, x).otherwise(x - element_at(col("doc_ids"), i))).as("gaps"))
      .as[(String, Seq[Long], Seq[Long])].collect()
    for ((w, ids, gs) <- gaps) {
      assert(gs.scanLeft(0L)(_ + _).drop(1) == ids, s"prefix-summed gaps != ids for '$w'")
    }
    val enc = InvertedIndex.deltaPostings(postings)
      .select(col("varint_bytes"), col("naive_bytes")).as[(Long, Long)].collect()
    for ((v, n) <- enc) assert(v >= 1 && v <= n, "varint bytes must be in [df, 8*df]")
  }

  // ------------------------------------------------------------- z-order

  test("zorderKey matches an independent bit-interleave on sample values") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (i * 2)) | (((y >> i) & 1L) << (i * 2 + 1))
      }.sum
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L), (16383L, 1L), (1234L, 8191L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorderKey(Seq(col("x"), col("y")), 14).as("z"))
      .as[(Long, Long, Long)].collect().map { case (x, y, z) => ((x, y), z) }.toMap
    for ((x, y) <- pts) assert(got((x, y)) == ref(x, y, 14), s"z($x,$y)")
  }

  test("zorderKeySql renders the identical arithmetic (spot-checked via Spark SQL)") {
    val sql = Layout.zorderKeySql(Seq("x", "y"), 4)
    val rows = spark.sql(s"SELECT $sql AS z FROM VALUES (3, 5), (15, 0) AS t(x, y)")
      .as[Long].collect().toSeq
    val exp = Seq((3L, 5L), (15L, 0L)).map { case (x, y) =>
      (0 until 4).map(i => (((x >> i) & 1L) << (i * 2)) | (((y >> i) & 1L) << (i * 2 + 1))).sum
    }
    assert(rows == exp)
  }

  test("hilbertKey == independent xy2d mirror; bijective; consecutive keys always adjacent") {
    // the in-memory classic xy2d (n-1-flip rotation), independent of the
    // SQL generator
    def xy2d(bits: Int, x0: Long, y0: Long): Long = {
      val n = 1L << bits
      var (x, y, d) = (x0, y0, 0L)
      var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val bits = 4
    val n = 1 << bits
    val cells = (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong)).toDF("x", "y")
    val got = Layout.hilbertKey(cells, "x", "y", bits)
      .as[(Long, Long, Long)].collect().map { case (x, y, d) => ((x, y), d) }.toMap
    for (((x, y), d) <- got) assert(d == xy2d(bits, x, y), s"hilbert($x,$y)")
    // bijection over the full grid
    assert(got.values.toSet == (0L until (n.toLong * n)).toSet, "keys must be a bijection")
    // the Hilbert property Z-order lacks: EVERY consecutive pair of keys
    // is a Manhattan-adjacent cell pair
    val byD = got.toSeq.sortBy(_._2).map(_._1)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump between d-neighbors ($x1,$y1)->($x2,$y2)")
    }
  }

  test("hilbertKey fuzz: 300 random points at bits=8 match the in-memory xy2d") {
    def xy2d(bits: Int, x0: Long, y0: Long): Long = {
      val n = 1L << bits
      var (x, y, d) = (x0, y0, 0L)
      var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(300)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong)).distinct
    val got = Layout.hilbertKey(pts.toDF("x", "y"), "x", "y", bits = 8)
      .as[(Long, Long, Long)].collect().map { case (x, y, d) => ((x, y), d) }.toMap
    for ((x, y) <- pts) assert(got((x, y)) == xy2d(8, x, y), s"hilbert8($x,$y)")
  }

  // ----------------------------------------------------------- triangles

  test("triangle counts: K4 has 4 triangles, 3 through each node") {
    val k4 = (for {
      a <- 1 to 4; b <- 1 to 4 if a < b
    } yield (s"n$a", s"n$b")).toDF("src", "dst")
    val got = Graph.triangleCounts(k4).as[(String, Long)].collect().toMap
    assert(got == Map("n1" -> 3L, "n2" -> 3L, "n3" -> 3L, "n4" -> 3L))
  }

  test("triangle counts: bipartite graphs have none; orientation dedups 6-way symmetry") {
    val bip = Seq(("a1", "b1"), ("a1", "b2"), ("a2", "b1"), ("a2", "b2")).toDF("src", "dst")
    assert(Graph.triangleCounts(bip).count() == 0, "bipartite graph must have zero triangles")
    // same triangle fed in all 6 orientations + duplicates counts once
    val tri = Seq(
      ("x", "y"), ("y", "x"), ("y", "z"), ("z", "y"), ("x", "z"), ("z", "x"), ("x", "y")
    ).toDF("src", "dst")
    val got = Graph.triangleCounts(tri).as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 1L, "y" -> 1L, "z" -> 1L))
  }

  // ----------------------------------------------------------- stats

  test("tableStats measures match direct aggregates; one row per column") {
    val df = Seq[(Long, Option[Double])](
      (1L, Some(1.5)), (2L, None), (2L, Some(4.0)), (5L, Some(1.5))
    ).toDF("a", "b")
    val st = Stats.tableStats(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(st("a").getLong(1) == 4 && st("a").getLong(2) == 0 && st("a").getLong(3) == 3)
    assert(st("b").getLong(2) == 1, "one null in b")
    assert(st("b").getLong(3) == 2, "ndv ignores nulls")
    assert(st("b").getDouble(4) == 1.5 && st("b").getDouble(5) == 4.0)
  }

  test("charEntropy: 0 for single-letter and non-alpha docs, ln 2 for two balanced letters") {
    val tiny = Seq(
      (0L, "aaaa aaa"), (1L, "ab ab ab"), (2L, "123 !!!"), (3L, "AbBa"))
      .toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis.withCharEntropy(tiny, "text", "e")
      .select(col("doc_id"), col("e"))
      .orderBy("doc_id").collect().map(_.getDouble(1))
    assert(got(0) == 0.0, "one distinct letter carries no entropy")
    assert(math.abs(got(1) - math.log(2.0)) < 1e-12, "balanced 2-letter alphabet = ln 2")
    assert(got(2) == 0.0, "no alphabetic characters = 0 by convention")
    assert(math.abs(got(3) - math.log(2.0)) < 1e-12, "case-folded before counting")
  }

  test("charEntropy: native one-pass counter matches the translate-form mirror on 200 fuzzed ASCII docs") {
    // the round-9 CharClassCounts expression replaced 26 translate passes;
    // this pins value-identity against an independent in-memory mirror
    // (same a→z literal term order, same IEEE evaluation order)
    val rnd = new scala.util.Random(0xcc09)
    val alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .,!?-_\t"
    val docs = (0 until 200).map { i =>
      val len = rnd.nextInt(80)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val got = graft.functions.TextAnalysis
      .withCharEntropy(docs.toDF("doc_id", "text"), "text", "e")
      .select(col("doc_id"), col("e"))
      .orderBy("doc_id").collect().map(_.getDouble(1))
    docs.foreach { case (id, text) =>
      val lower = text.toLowerCase
      val counts = ('a' to 'z').map(c => lower.count(_ == c).toDouble)
      val n = counts.reduce(_ + _)
      val expected =
        if (n == 0) 0.0
        else counts.map(c => if (c > 0) -(c / n) * math.log(c / n) else 0.0).reduce(_ + _)
      assert(math.abs(got(id.toInt) - expected) < 1e-12,
        s"doc $id '$text': got ${got(id.toInt)} expected $expected")
    }
  }

  test("gopherRules: each rule trips on its crafted violation, clean doc keeps") {
    val longClean = (("the quick brown fox jumps over a lazy dog near the old mill " * 6)
      + "and it is done for good").trim  // 66+ words, stopwords present
    val docs = Seq(
      (0L, longClean),                                        // passes all
      (1L, "too few words here"),                             // r_words
      (2L, ("supercalifragilisticexpialidocious " * 60).trim + " the a of"), // r_wlen (mean > 10)
      (3L, (("### ### " * 30).trim + " " + longClean)),       // r_symbol (60 '#'-tokens / ~126 words > 0.1)
      (4L, (("zz xq wv " * 30).trim))                         // r_stop (no stopwords)
    ).toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis.gopherRules(docs, minWords = 20)
      .orderBy("doc_id").collect()
    assert(got(0).getInt(11) == 1, s"clean doc must keep: ${got(0)}")
    assert(got(1).getInt(6) == 0 && got(1).getInt(11) == 0, "few words trips r_words")
    assert(got(2).getInt(7) == 0 && got(2).getInt(11) == 0, "long words trip r_wlen")
    assert(got(3).getInt(9) == 0 && got(3).getInt(11) == 0, "symbol spam trips r_symbol")
    assert(got(4).getInt(10) == 0 && got(4).getInt(11) == 0, "no stopwords trips r_stop")
  }

  test("keepBest: cluster representative is max-quality, min-id on ties") {
    // two clusters: {1,2,3} linked via (1,2),(2,3); {7,8}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc1", "doc2")
    val quality = Seq((1L, 10L), (2L, 50L), (3L, 50L), (7L, 5L), (8L, 9L))
      .toDF("doc_id", "q")
    val got = graft.operators.Dedup
      .keepBest(graft.operators.Dedup.duplicateGroups(pairs), quality)
      .orderBy("group_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // cluster 1: q=50 tie between 2 and 3 -> min id 2; cluster 7: 8 wins on q
    assert(got.toSeq == Seq((1L, 2L, 50L, 3L), (7L, 8L, 9L, 2L)), got.toSeq.toString)
  }

  test("wordDropout: deterministic, counts add up, p=0 and p=1 degenerate correctly") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon"), (2L, "one two")).toDF("doc_id", "text")
    val a = graft.functions.TextAnalysis.wordDropout(docs, p = 0.5)
      .orderBy("doc_id").collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val b = graft.functions.TextAnalysis.wordDropout(docs, p = 0.5)
      .orderBy("doc_id").collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq, "rerun must reproduce the identical augmentation")
    a.foreach { case (aug, total, kept) =>
      assert(kept <= total)
      assert(aug.isEmpty == (kept == 0L))
      if (kept > 0) assert(aug.split(" ").length == kept)
    }
    val keepAll = graft.functions.TextAnalysis.wordDropout(docs, p = 0.0)
      .orderBy("doc_id").collect()
    assert(keepAll(0).getString(1) == "alpha beta gamma delta epsilon" &&
      keepAll(0).getLong(2) == keepAll(0).getLong(3), "p=0 keeps every token in order")
    val dropAll = graft.functions.TextAnalysis.wordDropout(docs, p = 1.0)
      .orderBy("doc_id").collect()
    assert(dropAll.forall(r => r.getString(1).isEmpty && r.getLong(3) == 0L),
      "p=1 drops everything but preserves rows")
  }

  test("chunkByContent == in-memory mirror; prefix insertion preserves tail chunks") {
    val base = (0 until 120).map(word).mkString(" ")
    val two  = Seq((1L, base), (2L, s"zz yy xx $base")).toDF("doc_id", "text")
    val got = Chunking.chunkByContent(two, modulus = 4)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    // independent mirror: same tokenizer, same md5 cut rule, same md5 chunk hash
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    def chunksOf(text: String): Seq[String] = {
      val toks = text.split("\\s+").map(_.toLowerCase.replaceAll("[^a-z]", "")).filter(_.nonEmpty)
      val cuts = (1 until toks.length).filter(i => java.lang.Long.parseLong(md5hex(toks(i - 1)).take(8), 16) % 4 == 0)
      val bounds = 0 +: cuts :+ toks.length
      bounds.sliding(2).collect { case Seq(a, b) if b > a => md5hex(toks.slice(a, b).mkString(" ")) }.toSeq
    }
    assert(got.filter(_._1 == 1L).map(_._2).toSeq == chunksOf(base))
    assert(got.filter(_._1 == 2L).map(_._2).toSeq == chunksOf(s"zz yy xx $base"))
    // CDC property: every chunk of doc 1 except possibly the first is a
    // chunk of the prefix-injected doc 2 — fixed-stride windows share none
    val c1 = chunksOf(base); val c2 = chunksOf(s"zz yy xx $base").toSet
    assert(c1.drop(1).forall(c2.contains), "tail chunks must survive a prefix insertion")
    assert(c1.size > 3, "fixture must produce enough chunks to make the claim meaningful")
  }

  test("chunkDupPairs: paragraph-spliced near-dup found, unrelated docs are not") {
    val base = (0 until 120).map(word).mkString(" ")
    val spliced = {
      val w = base.split(" ")
      (w.take(60) ++ Seq("zz", "yy", "xx", "ww") ++ w.drop(60)).mkString(" ")
    }
    val corpus = Seq(
      (1L, base),
      (2L, spliced),                                    // base + 4-word splice
      (3L, (200 until 320).map(word).mkString(" "))     // disjoint vocab
    ).toDF("doc_id", "text")
    val got = Chunking.chunkDupPairs(corpus, modulus = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L)),
      s"expected exactly the spliced pair, got ${got.toSeq}")
    assert(got.head._3 >= 0.5, "most chunks survive a mid-document splice")
  }

  test("dedupSpans: planted duplicated span removed from the later doc only") {
    val base    = (0 until 120).map(word).mkString(" ")
    val fresh   = (200 until 260).map(word).mkString(" ")
    val spliced = {
      val w = fresh.split(" ")
      // paste the middle of doc 1 into the middle of an otherwise-new doc
      (w.take(30) ++ base.split(" ").slice(40, 80) ++ w.drop(30)).mkString(" ")
    }
    val corpus = Seq((1L, base), (2L, spliced), (3L, "")).toDF("doc_id", "text")
    val got = Chunking.dedupSpans(corpus, modulus = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))

    // independent mirror: chunk all docs with the same rules, keep first
    // (doc, chunk_id) occurrence of each content, rebuild the text
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    def chunksOf(text: String): Seq[Seq[String]] = {
      val toks = text.split("\\s+").map(_.toLowerCase.replaceAll("[^a-z]", "")).filter(_.nonEmpty)
      val cuts = (1 until toks.length).filter(i => java.lang.Long.parseLong(md5hex(toks(i - 1)).take(8), 16) % 4 == 0)
      val bounds = 0 +: cuts :+ toks.length
      bounds.sliding(2).collect { case Seq(a, b) if b > a => toks.slice(a, b).toSeq }.toSeq
    }
    val all = Seq(1L -> chunksOf(base), 2L -> chunksOf(spliced), 3L -> chunksOf(""))
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = all.map { case (id, cs) =>
      val kept = cs.filter(c => seen.add(c.mkString(" ")))
      (id, cs.size.toLong, (cs.size - kept.size).toLong,
        cs.map(_.size.toLong).sum, kept.map(_.size.toLong).sum,
        md5hex(kept.map(_.mkString(" ")).mkString(" ")))
    }
    assert(got.toSeq == expected, s"got ${got.toSeq}\nexpected $expected")
    // the planted span really was excised from doc 2, and doc 1 is intact
    assert(got(0)._3 == 0L, "first doc keeps everything")
    assert(got(1)._3 > 0L, "later doc loses the duplicated span")
    assert(got(1)._5 < got(1)._4, "doc 2's surviving token count shrank")
  }

  test("chunkByContent randomized fuzz: operator == in-memory mirror on 60 random docs") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    def chunksOf(text: String, m: Int): Seq[String] = {
      val toks = text.split("\\s+").map(_.toLowerCase.replaceAll("[^a-z]", "")).filter(_.nonEmpty)
      val cuts = (1 until toks.length).filter(i => java.lang.Long.parseLong(md5hex(toks(i - 1)).take(8), 16) % m == 0)
      val bounds = 0 +: cuts :+ toks.length
      bounds.sliding(2).collect { case Seq(a, b) if b > a => md5hex(toks.slice(a, b).mkString(" ")) }.toSeq
    }
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'z').map(_.toString) ++ Seq("the", "fox", "12x", "a-b", "")
    val corpus = (1L to 60L).map { id =>
      id -> Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for (m <- Seq(2, 8)) {
      val got = Chunking.chunkByContent(corpus.toDF("doc_id", "text"), modulus = m)
        .orderBy("doc_id", "chunk_id")
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getInt(1)).map(_.getString(3)).toSeq).toMap
      corpus.foreach { case (id, text) =>
        val want = chunksOf(text, m)
        assert(got.getOrElse(id, Seq.empty) == want, s"doc $id modulus $m: $text")
      }
    }
  }

  test("bpePairCounts randomized fuzz: operator == in-memory mirror") {
    val rnd = new scala.util.Random(11)
    val words = Seq("ab", "abc", "x", "banana", "abab", "zz", "q")
    val corpus = (1L to 25L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" ")
    }
    val toks = Tokenize.tokens(corpus.toDF("doc_id", "text"), "text", Seq("doc_id"))
    val got = graft.functions.TextAnalysis.bpePairCounts(toks)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // mirror: weighted vocabulary, adjacent char pairs
    val vocabCount = corpus.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = vocabCount.toSeq
      .filter(_._1.length >= 2)
      .flatMap { case (w, n) => w.sliding(2).map(p => s"${p(0)} ${p(1)}" -> n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(got == want)
  }

  test("bigramLogProbScore: hand-computed smoothed bigram means; short docs score 0") {
    val tiny = Seq(
      (0L, "a b a b"), (1L, "a b"), (2L, "x"), (3L, "..."))
      .toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis.bigramLogProbScore(tiny)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // uni: a:3 b:3 x:1, V=3; c2: "a b":3, "b a":1
    val lpAB = math.log(4.0 / 6.0); val lpBA = math.log(2.0 / 6.0)
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(got.toSeq == Seq(
      (0L, 3L, r4((2 * lpAB + lpBA) / 3.0)),
      (1L, 1L, r4(lpAB)),
      (2L, 0L, 0.0),
      (3L, 0L, 0.0)))
  }

  test("knBigramLogProbScore: hand-computed interpolated KN with estimated discount") {
    val tiny = Seq(
      (0L, "a b a b"), (1L, "a b"), (2L, "x"), (3L, "c a b c a"))
      .toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis.knBigramLogProbScore(tiny)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // bigram types: ab:4 ba:1 ca:2 bc:1 -> t1=2 (ba,bc), t2=1 (ca),
    // D = 2/(2+2) = 0.5; btypes = 4
    // ctx: a->(c1 4, fan 1), b->(c1 2, fan 2), c->(c1 2, fan 1)
    // cont: b<-1 (ab), a<-2 (ba,ca), c<-1 (bc)
    val lpAB = math.log(3.5 / 4 + 0.5 * 1 / 4.0 * (1 / 4.0))   // ln 0.90625
    val lpBA = math.log(0.5 / 2 + 0.5 * 2 / 2.0 * (2 / 4.0))   // ln 0.5
    val lpCA = math.log(1.5 / 2 + 0.5 * 1 / 2.0 * (2 / 4.0))   // ln 0.875
    val lpBC = math.log(0.5 / 2 + 0.5 * 2 / 2.0 * (1 / 4.0))   // ln 0.375
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(got.toSeq == Seq(
      (0L, 3L, r4((2 * lpAB + lpBA) / 3.0)),
      (1L, 1L, r4(lpAB)),
      (2L, 0L, 0.0),
      (3L, 4L, r4((2 * lpCA + lpAB + lpBC) / 4.0))))
  }

  test("knBigramLogProbScore: continuation richness separates docs add-one sees as equal") {
    // "u v" and "u w" are both singleton bigrams with the SAME context u
    // and the same unigram counts entering add-one's (c+1)/(c(u)+V) — so
    // bigramLogProbScore scores doc0 == doc1 exactly. But w continues
    // three distinct contexts (u, p, q) while v continues only u, so
    // interpolated KN's continuation term N1+(·w) > N1+(·v) must rank
    // doc1 strictly above doc0. "m n m n" tempers the estimated discount
    // below 1 so both KN terms are live.
    val tiny = Seq(
      (0L, "u v"), (1L, "u w"), (2L, "p w"), (3L, "q w"), (4L, "m n m n"))
      .toDF("doc_id", "text")
    def scores(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("doc_id").collect().map(_.getDouble(2))
    val kn = scores(graft.functions.TextAnalysis.knBigramLogProbScore(tiny))
    val ao = scores(graft.functions.TextAnalysis.bigramLogProbScore(tiny))
    assert(ao(0) == ao(1), s"add-one should tie (${ao(0)} vs ${ao(1)})")
    assert(kn(0) < kn(1),
      s"KN should rank the rich-continuation doc higher (${kn(0)} vs ${kn(1)})")
  }

  test("logregTrain: round-1 bias is the hand-computed label-imbalance step") {
    // all weights start 0 -> margin 0 -> sigma = 0.5 exactly -> err is
    // +500000 (y=0) / -500000 (y=1); bias grad = sum = -500000 here, so
    // bias_1 = 0 - floor(0.1 * (-500000) / 3 + 0.5) = -(-16667) = 16667
    val tiny = Seq(
      (1L, "aa bb", "en"), (2L, "cc", "en"), (3L, "dd", "de"))
      .toDF("doc_id", "text", "lang")
    val got = graft.functions.TextAnalysis
      .logregTrain(tiny, col("lang") === "en", rounds = 1, buckets = 64, lr = 0.1)
      .where(col("bucket") === -1L)
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(got.toSeq == Seq((1, 16667L)))
  }

  test("logregTrain: learns to separate vocab-disjoint labels; rerun-identical") {
    // en docs use vocab A, others vocab B (disjoint) -> after 3 rounds the
    // served margin of an A doc must exceed a B doc's
    val docs = (1 to 12).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha beta gamma alpha", "en")
      else (i.toLong, "omega psi chi omega", "de")
    }.toDF("doc_id", "text", "lang")
    def train() = graft.functions.TextAnalysis
      .logregTrain(docs, col("lang") === "en", rounds = 3, buckets = 64, lr = 0.1)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val a = train()
    assert(a == train(), "retraining must replay identically")
    // serve: margin(doc) = bias + sum over tokens of w(bucket(token))
    val w3 = a.filter(_._1 == 3).map(t => t._2 -> t._3).toMap
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("lrq:" + tok).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 64
    }
    def margin(text: String): Long =
      w3.getOrElse(-1L, 0L) +
        text.split(" ").map(t => w3.getOrElse(bucket(t), 0L)).sum
    assert(margin("alpha beta gamma alpha") > margin("omega psi chi omega"),
      s"trained margins must separate the classes: ${w3.mkString(",")}")
  }

  test("bpePairCounts: pairs weighted by word occurrences, single-char words excluded") {
    val tiny = Seq((0L, "ab ab abc x")).toDF("doc_id", "text")
    val toks = Tokenize.tokens(tiny, "text", Seq("doc_id"))
    val got = graft.functions.TextAnalysis.bpePairCounts(toks)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // vocab: ab×2, abc×1, x×1 (x has no pair)
    assert(got == Map("a b" -> 3L, "b c" -> 1L))
  }

  test("expectations: one pass, per-rule verdicts, failing rule flagged") {
    val df = Seq((1L, 5.0), (2L, 50.0)).toDF("id", "v")
    val got = Stats.expectations(df, Seq(
      Stats.Rule("v_min", min(col("v")), 0.0, 10.0),
      Stats.Rule("v_max", max(col("v")), 0.0, 10.0),  // fails: max is 50
      Stats.Rule("n_rows", count(lit(1)).cast("double"), 2.0, 2.0)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(got("v_min") == ((5.0, true)))
    assert(got("v_max") == ((50.0, false)))
    assert(got("n_rows") == ((2.0, true)))
  }

  test("winsorizedMean: outlier leverage bounded; clean groups unchanged") {
    val data = (Seq.fill(98)(10.0) ++ Seq(1e9, -1e9)).zipWithIndex
      .map { case (v, i) => ("g", v, i) }
      .toDF("grp", "v", "i")
    val r = Stats.winsorizedMean(data, "grp", "v", lo = 0.05, hi = 0.95)
      .collect().head
    // raw mean is dragged to ~10 +/- nothing (the two outliers cancel here),
    // so pin the WINSORIZED mean instead: both outliers clip to ~10
    assert(r.getLong(1) == 100)
    assert(math.abs(r.getDouble(3) - 10.0) < 0.01,
      s"winsorized mean ${r.getDouble(3)} must ignore the 1e9 outliers")
    // a clean constant group: winsorized == raw
    val clean = Seq.fill(50)(("c", 7.0)).zipWithIndex
      .map { case ((g, v), i) => (g, v + 0.0 * i) }.toDF("grp", "v")
    val rc = Stats.winsorizedMean(clean, "grp", "v").collect().head
    assert(rc.getDouble(2) == rc.getDouble(3))
  }

  test("ksTest: planted shift detected, identical samples give D=0; mirror-exact") {
    def ksRef(a: Seq[Double], b: Seq[Double]): Double = {
      val xs = (a ++ b).distinct.sorted
      xs.map { x =>
        math.abs(a.count(_ <= x).toDouble / a.size - b.count(_ <= x).toDouble / b.size)
      }.max
    }
    val rnd = new scala.util.Random(7)
    val sA = Seq.fill(200)(rnd.nextDouble() * 100)          // uniform [0,100)
    val sB = Seq.fill(150)(rnd.nextDouble() * 100 + 30)     // shifted +30
    val sC = sA                                             // identical to A
    val rows =
      sA.map(v => ("shift", v, 1)) ++ sB.map(v => ("shift", v, 2)) ++
      sA.map(v => ("same", v, 1)) ++ sC.map(v => ("same", v, 2))
    val got = Stats.ksTest(rows.toDF("g", "v", "smp"), "g", "v", "smp", chunkWidth = 10.0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val (n1, n2, d) = got("shift")
    assert(n1 == 200 && n2 == 150)
    assert(math.abs(d - math.floor(ksRef(sA, sB) * 1e6 + 0.5) / 1e6) < 1e-12,
      s"D must equal the in-memory two-sample KS: $d vs ${ksRef(sA, sB)}")
    assert(d > 0.2, "a +30 shift on [0,100) must show strong drift")
    assert(got("same")._3 == 0.0, "identical samples have zero CDF gap")
  }

  test("shrinkReport: planted clusters produce the exact removal count and fraction") {
    import graft.operators.Dedup
    val docs = (1L to 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters {1,2,3} and {7,8}; 5 singletons -> removals (3-1)+(2-1)=3, shrink 0.3
    val pairs = Seq((1L, 2L), (1L, 3L), (7L, 8L)).toDF("doc1", "doc2")
    val got = Dedup.shrinkReport(docs, pairs).collect().head
    assert(got.getLong(0) == 10 && got.getLong(1) == 5 && got.getLong(2) == 2,
      s"10 docs, 5 clustered, 2 clusters: $got")
    assert(got.getLong(3) == 3 && got.getDouble(4) == 0.3, s"3 removed, shrink 0.3: $got")
  }

  test("sourceOverlap: identical vocabularies hit 1.0, disjoint pairs don't emit") {
    val docs = Seq(
      (1L, "s1", "aa bb cc"), (2L, "s2", "cc bb aa"),  // same vocab
      (3L, "s3", "xx yy"),                              // disjoint from s1/s2
      (4L, "s4", "aa zz")                               // half-overlap with s1
    ).toDF("doc_id", "source", "text")
    val got = Stats.sourceOverlap(
      Tokenize.tokens(docs, "text", Seq("doc_id", "source")), "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(4), r.getDouble(5)))).toMap
    assert(got(("s1", "s2")) == ((3L, 1.0)), s"identical vocab: $got")
    // s4 shares 'aa' with s1: J = 1/(3+2-1) = 0.25
    assert(got(("s1", "s4")) == ((1L, 0.25)), s"partial overlap: $got")
    assert(!got.keySet.exists { case (a, b) => a == "s3" || b == "s3" },
      "disjoint source emits no pair rows")
  }

  test("temperatureMixture: targets sum exactly to budget; alpha flattens the head") {
    val docs = ((1 to 90).map(i => (i.toLong, "big")) ++ (91 to 100).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val flat = Sampling.temperatureMixture(docs, "source", alpha = 0.3, budget = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(flat.values.sum == 100L, s"largest remainder must conserve the budget: $flat")
    // natural share of 'small' is 10%; at alpha=0.3 it must be lifted well above
    assert(flat("small") > 20L && flat("big") < 80L, s"temperature lifts the tail: $flat")
    val natural = Sampling.temperatureMixture(docs, "source", alpha = 1.0, budget = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(natural == Map("big" -> 90L, "small" -> 10L), s"alpha=1 keeps proportions: $natural")
  }

  test("termDrift: injected term is the top riser with the exact smoothed delta") {
    import graft.functions.TextAnalysis
    val v1 = Seq((1L, "aa bb"), (2L, "aa bb")).toDF("doc_id", "text")
    val v2 = Seq((1L, "aa bb"), (2L, "aa bb cc cc cc")).toDF("doc_id", "text")
    val got = TextAnalysis.termDrift(v1, v2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.head._1 == "cc" && got.head._2 == 0L && got.head._3 == 3L,
      s"injected term rises first: ${got.toSeq}")
    // exact: V=3, N1=4, N2=7 -> delta(cc) = ln(4/10) - ln(1/7) = 1.0296
    assert(got.head._4 == 1.0296, s"smoothed delta: ${got.head._4}")
    assert(got.head._4 > got(1)._4, "strictly above the stable terms")
  }

  test("importanceWeights: target-domain vocabulary scores above off-domain; feature counts exact") {
    import graft.functions.TextAnalysis
    val df = Seq(
      (1L, "alpha beta alpha beta", "tgt"),   // target slice defines the domain
      (2L, "alpha beta alpha", "tgt"),
      (3L, "gamma delta gamma delta", "raw"), // off-domain mass
      (4L, "gamma delta gamma", "raw"),
      (5L, "alpha beta", "raw"),              // raw doc IN the target domain
      (6L, "gamma delta", "raw"),             // raw doc OFF the target domain
      (7L, "", "raw")                         // no features
    ).toDF("doc_id", "text", "kind")
    val w = TextAnalysis.importanceWeights(df, col("kind") === "tgt", buckets = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // "alpha beta": 2 unigrams + 1 bigram = 3 features
    assert(w(5L)._1 == 3L && w(6L)._1 == 3L, s"feature counts: $w")
    assert(w(5L)._2 > w(6L)._2,
      s"target-domain doc must outweigh off-domain doc: ${w(5L)} vs ${w(6L)}")
    assert(w(7L) == ((0L, 0.0)), s"featureless doc scores zero: ${w(7L)}")
    // deterministic: identical on rerun
    val w2 = TextAnalysis.importanceWeights(df, col("kind") === "tgt", buckets = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(w == w2)
  }

  test("kAnonymity: only classes below k surface, with exact sizes and shares") {
    val df = (1 to 8).map(i => ("en", "web")) ++ Seq(("en", "book"), ("de", "web"), ("de", "web"))
    val got = Stats.kAnonymity(df.toDF("lang", "source"), Seq("lang", "source"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // (en, web) has 8 members -> safe; the two small classes surface
    assert(got == Set(("en", "book", 1L, 0.090909), ("de", "web", 2L, 0.181818)), s"got $got")
  }

  test("g2Collocations: hand-computed Dunning G2; exact independence reads 0") {
    import graft.operators.{Cooccurrence, Tokenize}
    // 10 docs (common filler 'zz' keeps every doc in the universe):
    // aa in docs 1-6, bb in docs 1-5 and 7 -> n_xy=5, n_x=n_y=6, N=10
    // -> G2 = 3.5548 (computed independently). cc in 1-5, dd in {1,2,6,7}
    // -> n_xy=2 == 5*4/10 exactly independent -> G2 = 0.
    val docs = (1 to 10).map { i =>
      val words = Seq("zz") ++
        (if (i <= 6) Seq("aa") else Nil) ++
        (if (i <= 5 || i == 7) Seq("bb") else Nil) ++
        (if (i <= 5) Seq("cc") else Nil) ++
        (if (i <= 2 || i == 6 || i == 7) Seq("dd") else Nil)
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val got = Cooccurrence
      .g2Collocations(Tokenize.tokens(docs, "text", Seq("doc_id")), minPair = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(got(("aa", "bb")) == 3.5548, s"got $got")
    assert(got(("cc", "dd")) == 0.0, s"independence must read exactly 0: $got")
    // evidence weighting: the same proportions at 3x the support
    // triple-ish the statistic (PMI would be identical) — monotone check
    assert(got(("aa", "bb")) > got(("cc", "dd")))
  }

  test("burrowsDelta: == in-memory z-profile mirror; identical styles read exactly 0") {
    import graft.functions.TextAnalysis
    // S1 and S4 share the exact function-word profile -> Delta(S1,S4) = 0
    val profiles = Map(
      "S1" -> Seq(("the", 6), ("of", 2), ("xx", 2)),
      "S2" -> Seq(("the", 2), ("of", 6), ("yy", 2)),
      "S3" -> Seq(("the", 4), ("of", 4), ("zz", 2)),
      "S4" -> Seq(("the", 6), ("of", 2), ("ww", 2)))
    val tok = profiles.toSeq.flatMap { case (s, ws) =>
      ws.flatMap { case (w, n) => Seq.fill(n)((s, w)) }
    }.toDF("source", "word")
    val got = TextAnalysis.burrowsDelta(tok, "source", topM = 2)
      .orderBy("s1", "s2")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // mirror: top-2 words are {of, the}; 1e6-scaled rel freqs, exact
    // integer moments, z rounded 6dp, mean of 1e6-scaled |dz|
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val srcs = profiles.keys.toSeq.sorted
    val z = Seq("of", "the").map { w =>
      val f6 = srcs.map { s =>
        val n1 = profiles(s).map(_._2).sum.toDouble
        val a = profiles(s).find(_._1 == w).map(_._2).getOrElse(0).toDouble
        math.floor(a / n1 * 1e6 + 0.5).toLong
      }
      val ns = f6.size.toDouble
      val mu6 = f6.sum / ns
      val sd6 = math.sqrt(f6.map(v => v.toDouble * v).sum / ns - mu6 * mu6)
      w -> srcs.zip(f6.map(v => r6((v - mu6) / sd6))).toMap
    }.toMap
    for (i <- srcs.indices; j <- (i + 1) until srcs.size) {
      val (a, b) = (srcs(i), srcs(j))
      val d6 = Seq("of", "the").map(w =>
        math.floor(math.abs(z(w)(a) - z(w)(b)) * 1e6 + 0.5).toLong).sum
      val want = r6(d6.toDouble / 1e6 / 2.0)
      assert(got((a, b)) == ((2L, want)), s"pair ($a,$b): ${got((a, b))} vs $want")
    }
    assert(got(("S1", "S4"))._2 == 0.0, s"identical styles: ${got(("S1", "S4"))}")
  }

  test("keyness: the planted source-exclusive term tops its source; balanced terms drop") {
    import graft.operators.{Cooccurrence, Tokenize}
    // A: hot x6 + zz x4; B: cold x6 + zz x4. zz is perfectly balanced
    // (a/n1 == c/n0) so the strict-overuse filter drops it; each source's
    // exclusive term is its only (and top) key term.
    val docs = Seq(
      (1L, "A", (Seq.fill(6)("hot") ++ Seq.fill(4)("zz")).mkString(" ")),
      (2L, "B", (Seq.fill(6)("cold") ++ Seq.fill(4)("zz")).mkString(" ")))
      .toDF("doc_id", "source", "text")
    val got = Cooccurrence
      .keyness(Tokenize.tokens(docs, "text", Seq("source")), "source", k = 10, minCount = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    def g2(a: Long, wtot: Long, n1: Long, nn: Long): Double = {
      def t(k: Long, row: Long, c: Long): Double =
        if (k > 0) k.toDouble * math.log(k.toDouble * nn / (row.toDouble * c.toDouble)) else 0.0
      val v = 2.0 * (t(a, n1, wtot) + t(n1 - a, n1, nn - wtot)
        + t(wtot - a, nn - n1, wtot) + t(nn - n1 - (wtot - a), nn - n1, nn - wtot))
      math.floor(v * 1e4 + 0.5) / 1e4
    }
    val want = g2(a = 6, wtot = 6, n1 = 10, nn = 20)
    assert(got.toSeq == Seq(
      ("A", "hot", 6L, 0L, want, 1),
      ("B", "cold", 6L, 0L, want, 1)), s"got: ${got.toSeq}, want g2 $want")
  }

  test("uccCheck: true key reads unique, near-key grades its duplication exactly") {
    val df = Seq((1, "a"), (2, "a"), (3, "b"), (3, "b"), (3, "c")).toDF("id", "v")
    val key = Stats.uccCheck(df.where(col("id") =!= 3), Seq("id")).collect().head
    assert(key.getAs[Long]("n_dup_groups") == 0 && key.getAs[Int]("is_unique") == 1)
    val near = Stats.uccCheck(df, Seq("id", "v")).collect().head
    // (3,b) repeats once: 5 rows, 4 groups, 1 dup group, max multiplicity 2
    assert((near.getAs[Long]("n_rows"), near.getAs[Long]("n_groups"),
      near.getAs[Long]("n_dup_groups"), near.getAs[Long]("max_mult"),
      near.getAs[Int]("is_unique")) == (5L, 4L, 1L, 2L, 0), s"got $near")
  }

  test("tCloseness: hand-computed ordered EMD, and a single-value domain reads 0") {
    // class a: values [1,1,2] (p = 2/3, 1/3, 0), class b: [2,2,3]
    // (p = 0, 2/3, 1/3); global q = (2/6, 3/6, 1/6). Ordered EMD for
    // both classes: (|1/3| + |1/6| + 0) / (3-1) = 0.25 — hand-checked
    // via the integer form |N·cumC − size·cumG| = (6, 3, 0), 9/18/2.
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 2), ("b", 2), ("b", 3))
      .toDF("g", "v")
    val got = Stats.tCloseness(df, Seq("g"), "v", t = 0.2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == Set(("a", 3L, 0.25, 1), ("b", 3L, 0.25, 1)), s"got $got")
    // below-threshold classes flag 0
    val loose = Stats.tCloseness(df, Seq("g"), "v", t = 0.3)
      .collect().map(_.getInt(3)).toSet
    assert(loose == Set(0))
    // degenerate single-value domain: every distribution identical, emd
    // 0, and the (m-1) division must not throw
    val flat = Seq(("a", 7), ("b", 7), ("b", 7)).toDF("g", "v")
    val z = Stats.tCloseness(flat, Seq("g"), "v", t = 0.1)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(z == Map("a" -> 0.0, "b" -> 0.0), s"got $z")
  }

  test("corrMatrix: one pass yields exact pairwise correlations, upper triangle only") {
    // y = 2x (corr 1), z = -x (corr -1), w uncorrelated-by-construction:
    // w = (1,-1,1,-1) against x = (1,2,3,4) -> corr(x, w) = sum dev products
    //   x devs (-1.5,-0.5,0.5,1.5), w devs (1,-1,1,-1) -> sum = -1-(-0.5)...
    val df = Seq(
      (1.0, 2.0, -1.0, 1.0), (2.0, 4.0, -2.0, -1.0),
      (3.0, 6.0, -3.0, 1.0), (4.0, 8.0, -4.0, -1.0))
      .toDF("x", "y", "z", "w")
    val got = Stats.corrMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(got.size == 6, s"upper triangle of 4 cols is 6 pairs: $got")
    assert(got(("x", "y")) == 1.0 && got(("x", "z")) == -1.0 && got(("y", "z")) == -1.0)
    // corr(x, w): cov = (-1.5-0.5*(-1)+0.5-1.5)/3 ... closed form = -0.4*sqrt(5)/sqrt... check numerically
    val xs = Seq(1.0, 2.0, 3.0, 4.0); val ws = Seq(1.0, -1.0, 1.0, -1.0)
    val (mx, mw) = (xs.sum / 4, ws.sum / 4)
    val cov = xs.zip(ws).map { case (a, b) => (a - mx) * (b - mw) }.sum
    val expected = cov / math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum * ws.map(b => (b - mw) * (b - mw)).sum)
    assert(math.abs(got(("x", "w")) - expected) < 1e-6, s"${got(("x", "w"))} vs $expected")
  }

  test("lDiversity: k-anonymous-but-homogeneous classes surface; diverse classes pass") {
    // class (web): 6 members but ALL 'en' -> k-anonymous at k=3 yet diversity 1
    // class (book): 3 members over 3 langs -> passes l=3
    // class (chat): 2 members, 2 langs -> diversity 2, flagged at l=3
    val df = ((1 to 6).map(_ => ("web", "en")) ++
      Seq(("book", "en"), ("book", "de"), ("book", "fr"), ("chat", "en"), ("chat", "de")))
      .toDF("source", "lang")
    val got = Stats.lDiversity(df, Seq("source"), "lang", l = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("web", 6L, 1L), ("chat", 2L, 2L)), s"got $got")
  }

  test("joinCardinality: histogram estimate equals the materialized join exactly") {
    val a = Seq(1, 1, 1, 2, 3).map(k => (k, "a")).toDF("ka", "pa")
    val b = Seq(1, 1, 2, 2, 2, 4).map(k => (k, "b")).toDF("kb", "pb")
    val got = Stats.joinCardinality(a, "ka", b, "kb").collect().head
    val actual = a.join(b, col("ka") === col("kb")).count()
    // key 1: 3*2=6, key 2: 1*3=3 -> est 9, max 6, share 6/9
    assert(got.getLong(0) == actual && actual == 9L, s"estimate vs actual: $got / $actual")
    assert(got.getLong(1) == 6L && got.getDouble(2) == 0.666667, s"skew profile: $got")
  }

  test("mergeable moments: any shard split merges to the direct whole-table stats") {
    val rows = (1 to 100).map(i => (if (i % 3 == 0) "a" else "b", (i % 7).toDouble))
      .toDF("g", "v")
    val direct = Stats.mergedMomentsReport(Stats.partialMoments(rows, "g", "v"))
      .collect().map(_.toSeq).toSet
    // three different split axes must all merge to the identical report
    Seq(2, 3, 5).foreach { m =>
      val parts = (0 until m).map(r =>
        Stats.partialMoments(rows.where(col("v").cast("int") % m === r), "g", "v"))
      val merged = Stats.mergedMomentsReport(parts: _*).collect().map(_.toSeq).toSet
      assert(merged == direct, s"split-by-$m merge must equal direct: $merged vs $direct")
    }
    // and the values themselves are right: v in {0..6} cycling over 100 rows
    val b = direct.find(_.head == "b").get
    assert(b(1).asInstanceOf[Long] == 67, s"b group size: $b")
  }

  test("zoneMapPruneStats: value-clustered files prune the range, shuffled files do not") {
    // 100 rows, values 0..99; 10 files of 10. Clustered: file = v/10 ->
    // predicate [40, 49] scans exactly 1 file. Scattered: file = v%10 ->
    // every file spans [0..9x..] and none prune.
    val rows = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val clustered = Layout
      .zoneMapPruneStats(rows, floor(col("v") / 10.0), "clustered", "v", 40.0, 49.0)
      .collect().head
    assert(clustered.getLong(1) == 10 && clustered.getLong(2) == 1 && clustered.getDouble(3) == 0.9,
      s"clustered: $clustered")
    val scattered = Layout
      .zoneMapPruneStats(rows, col("id") % 10, "scattered", "v", 40.0, 49.0)
      .collect().head
    assert(scattered.getLong(2) == 10 && scattered.getDouble(3) == 0.0,
      s"scattered layout can prune nothing: $scattered")
  }

  test("compactionPlan: bytes conserved, bins near target, big files kept singleton") {
    import graft.operators.Layout
    val files = Seq(
      ("p1", "a", 100L), ("p1", "b", 200L), ("p1", "c", 150L), ("p1", "d", 900L),
      ("p1", "e", 80L), ("p2", "f", 50L), ("p2", "g", 1200L)
    ).toDF("part", "path", "bytes")
    val plan = Layout.compactionPlan(files, targetBytes = 400).collect()
    assert(plan.map(_.getLong(4)).sum == files.collect().map(_.getLong(2)).sum,
      "every byte lands in exactly one bin")
    val keeps = plan.filter(_.getString(2) == "keep")
    assert(keeps.map(r => (r.getString(0), r.getString(5))).toSet == Set(("p1", "d"), ("p2", "g")))
    assert(keeps.forall(r => r.getLong(3) == 1L && r.getLong(1) < 0), "keeps are singleton negative bins")
    // greedy prefix rule: a compact bin's bytes stay below target + max small file
    val compacts = plan.filter(_.getString(2) == "compact")
    assert(compacts.nonEmpty)
    assert(compacts.forall(_.getLong(4) < 400 + 400), "bins bounded by target + one boundary file")
    // deterministic rerun
    assert(Layout.compactionPlan(files, targetBytes = 400).collect().map(_.toSeq).toSet ==
      plan.map(_.toSeq).toSet)
  }

  test("compactExecute: rewrite is lossless, one file per bin, all-keep is a no-op") {
    import graft.operators.Layout
    val src = java.nio.file.Files.createTempDirectory("graft-compact-src").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact-out").toString
    val rows = (1L to 400L).map(i => (i, s"doc body number $i", i % 7))
    rows.toDF("id", "body", "grp").repartition(10, col("id"))
      .write.mode("overwrite").parquet(src)
    def parquets(d: String) =
      new java.io.File(d).listFiles((_, n) => n.endsWith(".parquet"))
    assert(parquets(src).length == 10)
    // generous target: every file is small -> all compact
    val got = Layout.compactExecute(spark, src, out, targetBytes = 10L * 1024 * 1024)
      .select("id", "body", "grp").collect().map(_.toSeq).toSet
    assert(got == rows.map(p => Seq(p._1, p._2, p._3)).toSet, "rewrite must be lossless")
    // one file per bin directory, fewer files than before
    val binDirs = new java.io.File(out).listFiles((f, n) => n.startsWith("bin="))
    assert(binDirs.nonEmpty && binDirs.length < 10, s"expected fewer bins: ${binDirs.length}")
    binDirs.foreach { d =>
      assert(parquets(d.toString).length == 1, s"exactly one file per bin in $d")
    }
    // target below every file size -> all keep -> table returned unchanged
    val noop = Layout.compactExecute(spark, src, out + "-n", targetBytes = 1)
      .select("id", "body", "grp").collect().map(_.toSeq).toSet
    assert(noop == got)
  }

  test("groupedOls: exact line recovered, r2=1; noisy r2<1; constant-x guarded") {
    val exact = (1 to 10).map(i => ("a", i.toDouble, 3.0 * i + 7.0))
    val noisy = (1 to 10).map(i => ("b", i.toDouble, 2.0 * i + (if (i % 2 == 0) 1.0 else -1.0)))
    val const = (1 to 5).map(_ => ("c", 4.0, 9.0))
    val got = Stats.groupedOls((exact ++ noisy ++ const).toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getDouble(2) == 3.0 && got("a").getDouble(3) == 7.0 && got("a").getDouble(4) == 1.0,
      s"points on y=3x+7 must recover slope/intercept/r2 exactly: ${got("a")}")
    assert(math.abs(got("b").getDouble(2) - 2.0) < 0.25, "noisy slope stays near 2")
    assert(got("b").getDouble(4) < 1.0, "noise must lower r2")
    assert(got("c").isNullAt(2) && got("c").isNullAt(3) && got("c").isNullAt(4),
      "constant x has no defined slope - guarded NULLs, not a division error")
  }

  test("zipfFit: synthetic power-law corpus recovers its exponent; n is the vocab size") {
    // freq(rank r) = floor(1024 / r): ln(freq) ≈ ln(1024) - 1·ln(rank),
    // so the fitted slope must land near -1 with high r2
    // letter-only words (the tokenizer strips digits): rank r -> "wba".."wbf"...
    val words = (1 to 32).flatMap { r =>
      val name = s"w${('a' + (r - 1) / 26).toChar}${('a' + (r - 1) % 26).toChar}"
      Seq.fill(1024 / r)(name)
    }
    val docs = Seq((1L, "s1", words.mkString(" "))).toDF("doc_id", "source", "text")
    val got = Stats.zipfFit(
      Tokenize.tokens(docs, "text", Seq("doc_id", "source")), "source").collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(1) == 32L, s"vocab size: ${r.getLong(1)}")
    assert(math.abs(r.getDouble(2) + 1.0) < 0.05, s"slope near -1: ${r.getDouble(2)}")
    assert(r.getDouble(4) > 0.99, s"power law fits nearly perfectly: ${r.getDouble(4)}")
  }

  test("tokenGini: uniform vocabulary is 0, dominated vocabulary is high, hand value exact") {
    // source u: four words once each -> G = 0
    // source s: freqs [1,1,1,97] asc ranks [1,2,3,4]:
    //   G = 2*(1+2+3+4*97)/(4*100) - 5/4 = 2*394/400 - 1.25 = 0.72
    val docs = Seq(
      (1L, "u", "aa bb cc dd"),
      (2L, "s", (Seq("ww") ++ Seq("xx") ++ Seq("yy") ++ Seq.fill(97)("zz")).mkString(" "))
    ).toDF("doc_id", "source", "text")
    val got = Stats.tokenGini(
      Tokenize.tokens(docs, "text", Seq("doc_id", "source")), "source")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("u") == ((4L, 4L, 0.0)), s"uniform: ${got("u")}")
    assert(got("s") == ((4L, 100L, 0.72)), s"dominated: ${got("s")}")
  }

  test("datasetCard: dup rate, language entropy, and token mass per source") {
    val docs = Seq(
      (1L, "a", "en", "same text here", 14L),
      (2L, "a", "en", "same text here", 14L),   // exact dup of doc 1
      (3L, "b", "en", "first unique doc", 16L),
      (4L, "b", "de", "second unique doc", 17L)
    ).toDF("doc_id", "source", "lang", "text", "n_chars")
    val toks = Tokenize.tokens(docs, "text", Seq("doc_id", "source"))
    val got = Stats.datasetCard(docs, toks)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a"); val b = got("b")
    assert(a.getLong(1) == 2 && a.getLong(2) == 6, s"a: 2 docs, 6 tokens: $a")
    assert(a.getDouble(6) == 0.5, s"one dup of two docs: $a")
    assert(a.getLong(4) == 1 && a.getDouble(5) == 0.0, s"single-lang entropy 0: $a")
    assert(b.getLong(1) == 2 && b.getLong(2) == 6, s"b: 2 docs, 6 tokens: $b")
    assert(b.getDouble(6) == 0.0, s"no dups in b: $b")
    // two langs, 50/50: H = ln 2 = 0.6931
    assert(b.getLong(4) == 2 && b.getDouble(5) == 0.6931, s"ln-2 entropy: $b")
    assert(a.getDouble(3) == 14.0 && b.getDouble(3) == 16.5, s"mean chars: $a / $b")
  }

  test("robustOutliers: planted outlier flagged; uniform group has none; zero MAD safe") {
    val rows =
      (1 to 99).map(i => ("a", 100.0 + (i % 11))) ++ Seq(("a", 1e6)) ++  // one planted spike
      (1 to 50).map(i => ("b", 200.0 + i)) ++                            // spread, no outlier
      (1 to 20).map(_ => ("c", 7.0))                                     // constant -> MAD 0
    val got = Stats.robustOutliers(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("a") == ((100L, 1L)), s"planted spike must be the only a-outlier: ${got("a")}")
    assert(got("b")._2 == 0L, "well-spread group has no |z| > 3.5")
    assert(got("c") == ((20L, 0L)), "zero-MAD group yields no verdicts, no blow-up")
  }

  test("vocabGrowth: cumulative count ends at the distinct-word total") {
    val toks = Tokenize.tokens(docs, "text", Seq("doc_id"))
    val curve = Stats.vocabGrowth(toks, bucketWidth = 2).orderBy("bucket")
      .as[(Long, Long, Long)].collect()
    val vocab = toks.select(col("word")).distinct().count()
    assert(curve.last._3 == vocab)
    assert(curve.map(_._2).sum == vocab)
    assert(curve.map(_._3).toSeq == curve.map(_._2).scanLeft(0L)(_ + _).drop(1).toSeq)
  }

  test("readability: hand-computed Flesch-Kincaid grades and the degenerate-text clamp") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat."),                    // 1 sentence, 3 words, 3 syllables → −2.62
      (2L, "Hello world. How are you? Fine!"), // 3 / 6 / 9 → 2.89
      (3L, "!!!")                              // no words: clamps, fk = 0.39 − 15.59
    ).toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis.readability(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(1L) == (1L, 3L, 3L, -2.62), s"got $got")
    assert(got(2L) == (3L, 6L, 9L, 2.89), s"got $got")
    assert(got(3L) == (1L, 0L, 0L, -15.2), s"got $got")
  }

  test("codeSwitch: concatenated-language docs flag, monolingual and empty-marker docs don't") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the and is of the and is of"),  // en | en → clean
      (2L, "the and is of le et dans les"), // en | fr → mixed
      (3L, "zzz qqq xxx yyy"),              // unknown | unknown → clean
      (4L, "the and is of zzz qqq xxx yy")  // en | unknown → mixed
    ).toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis.codeSwitch(docs)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getInt(3))).toMap
    assert(got(1L) == ("en", "en", 0), s"got $got")
    assert(got(2L) == ("en", "fr", 1), s"got $got")
    assert(got(3L) == ("unknown", "unknown", 0), s"got $got")
    assert(got(4L)._1 == "en" && got(4L)._3 == 1, s"got $got")
  }

  test("goodTuring: hand-computed N_r, r* and unseen mass on a fixed count profile") {
    // counts: a=1, b=1, c=2, d=3 → N=7, N1=2, N2=1, N3=1
    //   r=1: r* = 2·N2/N1 = 1.0      r=2: r* = 3·N3/N2 = 3.0
    //   P0 = N1/N = 2/7 = 0.285714…
    val toks = Seq("a", "b", "c", "c", "d", "d", "d").toDF("word")
    val got = graft.functions.TextAnalysis.goodTuring(toks, maxR = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == Map(
      1L -> (2L, 1L, 1.0, 0.285714),
      2L -> (1L, 1L, 3.0, 0.285714)), s"got $got")
  }

  test("goodTuring: a saturated domain (no counts <= maxR+1) reads empty, not wrong") {
    val toks = Seq.fill(10)("x").toDF("word")
    assert(graft.functions.TextAnalysis.goodTuring(toks, maxR = 2).collect().isEmpty)
  }

  test("mahalanobis: off-ridge corners outrank the center; collinear input yields no rows") {
    import graft.operators.Stats
    val sq = Seq((1L, 0L, 0L), (2L, 2L, 0L), (3L, 0L, 2L), (4L, 2L, 2L), (5L, 1L, 1L))
      .toDF("id", "x", "y")
    val got = Stats.mahalanobisOutliers(sq, "id", "x", "y", k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    // vx=vy=0.8, cxy=0 → corners d²=2.5, center 0; tie breaks by id
    assert(got.toSeq == Seq((1L, 2.5), (2L, 2.5), (3L, 2.5), (4L, 2.5), (5L, 0.0)),
      s"${got.toSeq}")
    val line = Seq((1L, 0L, 0L), (2L, 1L, 1L), (3L, 2L, 2L)).toDF("id", "x", "y")
    assert(Stats.mahalanobisOutliers(line, "id", "x", "y").count() == 0,
      "collinear pair must yield no ranked rows")
  }

  test("noveltyProfile: first-seen shingles attribute to the earliest doc; short docs whole-shingle") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c x"), (3L, "z"), (4L, "")).toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis.noveltyProfile(docs, "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 1.0),   // "a b c", "b c d" — both first here
      (2L, 2L, 1L, 0.5),   // "a b c" seen in doc 1
      (3L, 1L, 1L, 1.0)),  // short doc: one whole-doc shingle
      s"${got.toSeq}")     // empty doc 4 absent
  }

  test("rakePhrases: hand deg/freq scores; identical phrases collapse with a count") {
    // "the red apple and the green apple of doom": runs [red apple],
    // [green apple], [doom]; deg/freq → apple 4/2, red 2, green 2, doom 1
    val one = Seq((1L, "the red apple and the green apple of doom")).toDF("doc_id", "text")
    val got = graft.functions.TextAnalysis.rakePhrases(one, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("green apple", 1L, 4.0), ("red apple", 1L, 4.0), ("doom", 1L, 1.0)),
      s"${got.toSeq}")
    // a second "red apple" doc pools word stats and collapses instances
    val two = one.unionAll(Seq((2L, "red apple")).toDF("doc_id", "text"))
    val g2 = graft.functions.TextAnalysis.rakePhrases(two, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(g2.toSeq == Seq(
      ("green apple", 1L, 4.0), ("red apple", 2L, 4.0), ("doom", 1L, 1.0)),
      s"${g2.toSeq}")
  }

  test("skipgramPmi: hand window-2 pair counts, self-consistent marginals, exact PMI") {
    import spark.implicits._
    def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
    // "a b a c": pairs (a,b)x2, (a,a), (a,c), (b,c); T=5; marginals
    // count both sides: n_a=5, n_b=3, n_c=2
    val docs = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val got = graft.operators.Cooccurrence.skipgramPmi(docs, window = 2, minPair = 1)
      .orderBy("w1", "w2")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("a", "a", 1L, 5L, 5L, r6(math.log(5.0 / 25.0))),
      ("a", "b", 2L, 5L, 3L, r6(math.log(10.0 / 15.0))),
      ("a", "c", 1L, 5L, 2L, r6(math.log(5.0 / 10.0))),
      ("b", "c", 1L, 3L, 2L, r6(math.log(5.0 / 6.0)))), s"got: ${got.toSeq}")
  }

  test("skipgramPmi fuzz: == the plain-Scala windowed-pair mirror") {
    import spark.implicits._
    def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
    val rnd = new scala.util.Random(915L)
    val vocab = Vector("x", "y", "z", "w", "v")
    val docs = (0 until 12).map(d =>
      (d.toLong, (0 until 5 + rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(5))).mkString(" ")))
    val got = graft.operators.Cooccurrence
      .skipgramPmi(docs.toDF("doc_id", "text"), window = 3, minPair = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // mirror
    val pairs = docs.flatMap { case (_, text) =>
      val t = text.split(" ")
      for { i <- t.indices; o <- 1 to 3; if i + o < t.length }
        yield (Seq(t(i), t(i + o)).min, Seq(t(i), t(i + o)).max)
    }
    val cnt = pairs.groupBy(identity).map { case (p, l) => p -> l.size.toLong }
    val tot = cnt.values.sum
    val marg = (cnt.toSeq.map { case ((a, _), n) => a -> n }
      ++ cnt.toSeq.map { case ((_, b), n) => b -> n })
      .groupBy(_._1).map { case (w, l) => w -> l.map(_._2).sum }
    val want = cnt.filter(_._2 >= 2).map { case ((a, b), n) =>
      (a, b) -> ((n, marg(a), marg(b),
        r6(math.log(n.toDouble * tot / (marg(a).toDouble * marg(b).toDouble)))))
    }
    assert(got == want, s"got: $got\nwant: $want")
  }

  test("sStem: the three Harman rules fire in order; exceptions stay untouched") {
    import spark.implicits._
    val cases = Seq(
      // rule 1: -ies -> -y (not after a/e)
      "queries" -> "query", "studies" -> "study", "ties" -> "ty",
      "movies" -> "movy", // the documented S-stemmer quirk: only a/e block rule 1
      // rule 2: -es -> -e (not after a/e/o)
      "tables" -> "table", "classes" -> "classe",
      // rule 2 exception -oes falls through to rule 3 (e before final s)
      "goes" -> "goe",
      // rule 3: drop -s (not -us/-ss)
      "cats" -> "cat", "gas" -> "ga",
      // rule 3 exceptions: untouched
      "corpus" -> "corpus", "class" -> "class")
    val df = cases.map(_._1).distinct.toDF("w")
      .select(col("w"), graft.functions.TextAnalysis.sStem(col("w")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (w, want) => assert(df(w) == want, s"$w -> ${df(w)} (want $want)") }
  }

  test("textrank: == plain-Scala pagerank over the windowed co-occurrence graph; hub wins") {
    import spark.implicits._
    // 'core' touches every sentence; leaves touch only 'core'
    val docs = Seq(
      (1L, "core alpha core beta core gamma"),
      (2L, "core delta core epsilon"),
      (3L, "zeta core eta core")).toDF("doc_id", "text")
    def toks(t: String) = t.split("\\s+").map(_.toLowerCase.filter(c => c >= 'a' && c <= 'z'))
      .filter(_.nonEmpty).toSeq
    // in-memory mirror: window-2 unordered pairs -> >=1 count edges ->
    // symmetrized simple graph -> 5 pagerank rounds at d = 0.85
    val pairs = Seq((1L, "core alpha core beta core gamma"),
      (2L, "core delta core epsilon"), (3L, "zeta core eta core"))
      .flatMap { case (_, t) =>
        val ts = toks(t)
        for (i <- ts.indices; o <- 1 to 2 if i + o < ts.size)
          yield (Seq(ts(i), ts(i + o)).min, Seq(ts(i), ts(i + o)).max)
      }
    // NB: NOT groupBy(identity).map(_._1) — mapping a Map with a
    // tuple-valued lambda rebuilds a Map and collapses same-first-element
    // pairs into one entry
    val edges = pairs.distinct.filter(p => p._1 != p._2).toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    val nodes = adj.keys.toSeq.sorted
    val n = nodes.size.toDouble
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 5) {
      val mass = nodes.map { v =>
        v -> adj(v).map(u => pr(u) / adj(u).size).sum
      }.toMap
      pr = nodes.map(v => v -> (0.15 / n + 0.85 * mass(v))).toMap
    }
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val want = pr.map { case (w, v) => w -> r6(v) }
    val got = graft.operators.Cooccurrence
      .textrank(docs, window = 2, minPair = 1, iters = 5, k = 100)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want, s"got $got want $want")
    // the hub out-ranks every leaf, and k truncates on (score, word)
    val top = graft.operators.Cooccurrence
      .textrank(docs, window = 2, minPair = 1, iters = 5, k = 1)
      .collect().map(_.getString(0)).toSeq
    assert(top == Seq("core"), s"top: $top")
  }
}
