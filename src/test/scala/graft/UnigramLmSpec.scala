package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.Tokenize

/** Pins the unigram-LM tokenizer trainer (Kudo 2018, hard-EM form):
  * the Spark Viterbi against an in-memory DP mirror under fuzz, piece
  * learning on a planted corpus, total coverage after pruning, and the
  * fertility comparison row against BPE on the same corpus.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory mirror of viterbiPath: max integer score, path-ASC ties. */
  private def mirror(w: String, lp: Map[String, Long], maxPieceLen: Int): Option[String] = {
    val none = (Long.MinValue, null: String)
    val best = Array.fill(w.length + 1)(none)
    best(0) = (0L, "")
    for (i <- 1 to w.length) {
      var b = none
      for (j <- 1 to math.min(maxPieceLen, i)) {
        val piece = w.substring(i - j, i)
        if (best(i - j)._2 != null) lp.get(piece).foreach { v =>
          val s = best(i - j)._1 + v
          val p = if (best(i - j)._2.isEmpty) piece else best(i - j)._2 + " " + piece
          if (b._2 == null || s > b._1 || (s == b._1 && p < b._2)) b = (s, p)
        }
      }
      best(i) = b
    }
    Option(best(w.length)._2)
  }

  test("viterbiPath == the in-memory DP mirror under fuzz (scores, tie-breaks, coverage)") {
    val rnd = new scala.util.Random(7L)
    val alpha = "abcde"
    val words = (0 until 40).map { _ =>
      val len = 1 + rnd.nextInt(12)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.distinct
    // all single chars (coverage) + random multi pieces, random micro-lps;
    // coarse lp granularity (multiples of 1e5) provokes genuine ties
    val multis = (0 until 60).map { _ =>
      val len = 2 + rnd.nextInt(3)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.distinct
    val lp: Map[String, Long] =
      (alpha.map(_.toString) ++ multis).distinct.map { p =>
        p -> -(1L + rnd.nextInt(30)) * 100000L
      }.toMap
    val df = words.map(w => (w, 1L)).toDF("w", "n")
    val got = TextAnalysis.viterbiPath(df, lp, maxPieceLen = 4, maxWordLen = 12)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    words.foreach { w =>
      assert(got.get(w).contains(mirror(w, lp, 4).get),
        s"$w: spark ${got.get(w)} != mirror ${mirror(w, lp, 4)}")
    }
  }

  test("the trainer learns a dominant word as one piece; chars always retained") {
    val docs = (Seq.fill(100)("tree") ++ Seq.fill(3)("rock pond") ++ Seq("fish"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val v = TextAnalysis.unigramLm(
      Tokenize.tokens(docs, "text", Seq("doc_id")), seedSize = 50, keepMulti = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v.contains("tree") && v("tree") >= 100L,
      s"the dominant word must survive as one piece: $v")
    "treeockpndfish".toSet.foreach { (c: Char) =>
      assert(v.contains(c.toString), s"char $c missing from the pruned vocab — coverage broken")
    }
  }

  test("coverage after pruning: fertility loses no token; unigram beats BPE on the same corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fert = TextAnalysis.unigramFertility(docs).collect()
    val totWords = fert.map(_.getLong(1)).sum
    val nToks = Tokenize.tokens(docs, "text", Seq("doc_id"))
      .where(length(col("word")) <= 12).count()
    assert(totWords == nToks,
      s"fertility join lost tokens: $totWords of $nToks — a word failed to segment")
    // the comparison row: a 40-multi-piece unigram vocab must out-compress
    // a 3-merge BPE on the same corpus (pieces per word strictly lower)
    val uniFert = fert.map(r => r.getString(0) -> r.getDouble(3)).toMap
    val merges = TextAnalysis
      .bpeMerges(Tokenize.tokens(docs, "text", Seq("doc_id")), 3)
      .orderBy("iter").collect().map(_.getString(1)).toSeq
    val bpeFert = TextAnalysis.bpeEncodeDocs(docs, merges)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg((sum(col("n_pieces")).cast("double") / sum(col("n_words")).cast("double")).as("f"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    uniFert.foreach { case (lang, f) =>
      assert(f < bpeFert(lang),
        s"$lang: unigram fertility $f must beat 3-merge BPE ${bpeFert(lang)}")
    }
  }
}
