package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** The BPE trainer ([[TextAnalysis.bpeMerges]]) against an in-memory
  * mirror: same greedy left-to-right non-overlapping merge, same
  * (cnt DESC, pair ASC) argmax tie-break. The mirror is a direct
  * list-based implementation, so any divergence in the distributed
  * aggregate-lambda merge (overlap handling, run parity, checkpointed
  * state threading) surfaces as a wrong merge table.
  */
class BpeSpec extends SparkSpec {

  /** Reference greedy merge: replace non-overlapping (a, b) left-to-right. */
  private def mergeRef(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  /** Reference trainer over a weighted word list. */
  private def bpeRef(words: Seq[(String, Long)], k: Int): Seq[(Int, String, Long)] = {
    var vocab = words.map { case (w, n) => (w.split("").toList, n) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var it = 1
    var done = false
    while (it <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, s"$x $y") }
        merges += ((it, s"$a $b", cnt))
        vocab = vocab.map { case (syms, n) => (mergeRef(syms, a, b), n) }
        it += 1
      }
    }
    merges.toSeq
  }

  private def run(words: Seq[(String, Long)], k: Int): Seq[(Int, String, Long)] = {
    import spark.implicits._
    // expand weights to token multiplicity (bpeMerges counts occurrences)
    val tokens = words
      .flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .toDF("word")
    TextAnalysis
      .bpeMerges(tokens, k)
      .orderBy("iter")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSeq
  }

  test("repeated-symbol runs merge with correct parity (the overlap case)") {
    // 'aaaa' x3: round 1 must pick (a,a) cnt 3*3=9 and apply it
    // non-overlapping -> [aa, aa]; round 2's top pair is then (aa, aa)
    val words = Seq(("aaaa", 3L), ("aab", 2L), ("ba", 1L))
    assert(run(words, 3) == bpeRef(words, 3))
  }

  test("merged symbols participate in later rounds") {
    val words = Seq(("banana", 4L), ("bandana", 2L), ("ananas", 1L))
    assert(run(words, 4) == bpeRef(words, 4))
  }

  test("trainer stops when no pairs remain") {
    // single-char words only: zero merge rounds possible
    val words = Seq(("a", 5L), ("b", 3L))
    assert(run(words, 2).isEmpty)
    assert(bpeRef(words, 2).isEmpty)
  }

  test("bpeApply: encoding unseen words with a learned table matches the mirror") {
    import spark.implicits._
    // merges learned elsewhere; apply to words the trainer never saw,
    // including repeated-run and no-op cases, >8 merges to cross the
    // localCheckpoint group boundary
    val merges = Seq("a a", "aa b", "c d", "aab c", "e f", "ef g", "x y",
      "b a", "d e", "g h")
    val words = Seq("aaba", "aabcd", "cdcd", "efgh", "zzz", "a", "xyxy")
    val got = graft.functions.TextAnalysis
      .bpeApply(words.toDF("word"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    words.foreach { w =>
      var syms = w.split("").toList
      merges.foreach { p => val Array(a, b) = p.split(" ", 2); syms = mergeRef(syms, a, b) }
      assert(got(w) == syms, s"word $w: got ${got(w)} expected $syms")
    }
  }

  test("bpeEncodeDocs: documents become token-id sequences matching the mirror") {
    import spark.implicits._
    val merges = Seq("a n", "an a", "b an")
    val docs = Seq(
      (1L, "banana bandana"),
      (2L, "ananas AND 123 banana"), // cleaning: AND->and, 123 dropped
      (3L, "??? !!!"),               // every token cleans to empty
      (4L, "zzz")                    // untouched by any merge
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncodeDocs(docs, merges)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList, r.getInt(2), r.getInt(3)))
    // mirror: the id table the engine derives from the merge table alone
    val pieces = (('a' to 'z').map(_.toString) ++
      merges.map(_.split(" ", 2).mkString)).distinct.sorted
    val ids = pieces.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
    def enc(text: String): List[Int] = text.split("\\s+").toList
      .map(_.toLowerCase.filter(c => c >= 'a' && c <= 'z'))
      .filter(_.nonEmpty)
      .flatMap { w =>
        var syms = w.split("").toList
        merges.foreach { p => val Array(a, b) = p.split(" ", 2); syms = mergeRef(syms, a, b) }
        syms.map(ids)
      }
    val expected = Seq(
      (1L, enc("banana bandana"), 2, enc("banana bandana").length),
      (2L, enc("ananas and banana"), 3, enc("ananas and banana").length),
      (3L, List.empty[Int], 0, 0),
      (4L, enc("zzz"), 1, 3))
    assert(got.toList == expected,
      s"got ${got.toList}\nexpected $expected")
  }

  test("fuzz: 30 random weighted vocabularies match the mirror exactly") {
    val rnd = new scala.util.Random(0xb9e5)
    (1 to 30).foreach { trial =>
      val nWords = 1 + rnd.nextInt(8)
      val words = (1 to nWords).map { _ =>
        val len = 1 + rnd.nextInt(6)
        // 3-letter alphabet maximizes repeated-run and tie cases
        val w = (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        (w, 1L + rnd.nextInt(4))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      val k = 1 + rnd.nextInt(4)
      assert(run(words, k) == bpeRef(words, k),
        s"trial $trial diverged on words=$words k=$k")
    }
  }

  // ----------------------------------------------------------- WordPiece

  private def wpSymInit(w: String): List[String] =
    w.split("").toList.zipWithIndex.map { case (c, i) => if (i == 0) c else "##" + c }

  private def wpMergeRef(syms: List[String], a: String, b: String): List[String] = {
    val merged = a + (if (b.startsWith("##")) b.drop(2) else b)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += merged; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  /** Reference WordPiece trainer: likelihood argmax cnt/(ca·cb). */
  private def wpRef(
      words: Seq[(String, Long)], k: Int): Seq[(Int, String, Long, Long, Long)] = {
    var vocab = words.map { case (w, n) => (wpSymInit(w), n) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long, Long)]
    var it = 1
    var done = false
    while (it <= k && !done) {
      val sym = scala.collection.mutable.Map.empty[String, Long]
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.foreach(s => sym(s) = sym.getOrElse(s, 0L) + n)
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) =>
          (-(c.toDouble / (sym(x) * sym(y)).toDouble), x, y)
        }
        merges += ((it, s"$a $b", cnt, sym(a), sym(b)))
        vocab = vocab.map { case (syms, n) => (wpMergeRef(syms, a, b), n) }
        it += 1
      }
    }
    merges.toSeq
  }

  private def wpRun(
      words: Seq[(String, Long)], k: Int): Seq[(Int, String, Long, Long, Long)] = {
    import spark.implicits._
    val tokens = words
      .flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .toDF("word")
    TextAnalysis
      .wordpieceMerges(tokens, k)
      .orderBy("iter")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
  }

  test("wordpiece: likelihood argmax picks the exclusive pair BPE's count argmax skips") {
    // (a,##b) has count 3 but a and ##b are frequent (score 3/9);
    // (c,##d) has count 1 but occurs ONLY together (score 1/1) -> WP merges
    // it first, BPE would merge (a,##b). Round 2 is a three-way 1/3 tie ->
    // pair-ASC picks (a,##b); round 3 ties (x,##a)/(x,##y) on score ->
    // b-ASC picks (x,##a).
    val words = Seq(("ab", 3L), ("cd", 1L), ("xy", 2L), ("xa", 1L))
    assert(wpRun(words, 3) == Seq(
      (1, "c ##d", 1L, 1L, 1L),
      (2, "a ##b", 3L, 3L, 3L),
      (3, "x ##a", 1L, 3L, 1L)))
    // and the count argmax (BPE) indeed makes the other round-1 choice
    assert(bpeRef(words, 1).head._2 == "a b")
  }

  test("wordpiece: ## marker survives continuation-side merges") {
    // "abc": [a, ##b, ##c]; round 1 ties (a,##b)/(##b,##c) at 2/4 ->
    // '#'<'a' picks (##b,##c), merged symbol keeps the ## marker;
    // round 2 merges (a, ##bc) into the full word
    val words = Seq(("abc", 2L))
    val got = wpRun(words, 2)
    assert(got == Seq(
      (1, "##b ##c", 2L, 2L, 2L),
      (2, "a ##bc", 2L, 2L, 2L)))
  }

  test("wordpiece fuzz: 30 random weighted vocabularies match the mirror exactly") {
    val rnd = new scala.util.Random(0x3d17)
    (1 to 30).foreach { trial =>
      val nWords = 1 + rnd.nextInt(8)
      val words = (1 to nWords).map { _ =>
        val len = 1 + rnd.nextInt(6)
        val w = (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        (w, 1L + rnd.nextInt(4))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      val k = 1 + rnd.nextInt(4)
      assert(wpRun(words, k) == wpRef(words, k),
        s"trial $trial diverged on words=$words k=$k")
    }
  }
}
