package graft

import graft.operators.TextEval

/** BLEU / ROUGE hand cases: identity, hand-computed clipped counts, the
  * clipping rule itself ("the the the..." must not score), brevity
  * penalty direction, and zero-overlap floors.
  */
class TextEvalSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("bleuCorpus: identical candidate == 1.0 exactly; zero overlap == 0.0") {
    val same = Seq((1L, "the quick brown fox jumps over the lazy dog", "the quick brown fox jumps over the lazy dog"))
      .toDF("pid", "cand", "ref")
    val row = TextEval.bleuCorpus(same, "cand", "ref", "pid").collect().head
    assert(row.getAs[Double]("bp_r") == 1.0)
    (1 to 4).foreach(n => assert(row.getAs[Double](s"p${n}_r") == 1.0, s"p$n"))
    assert(row.getAs[Double]("bleu_r") == 1.0)
    val disjoint = Seq((1L, "aa bb cc dd", "ww xx yy zz")).toDF("pid", "cand", "ref")
    assert(TextEval.bleuCorpus(disjoint, "cand", "ref", "pid")
      .collect().head.getAs[Double]("bleu_r") == 0.0)
  }

  test("bleuCorpus: hand-computed clipped precisions and brevity penalty") {
    // cand: "the cat sat on the mat" (6 toks), ref: "the cat is on the mat" (6)
    // 1-grams: cand counts {the:2, cat:1, sat:1, on:1, mat:1}; ref has
    // {the:2, cat:1, is:1, on:1, mat:1} -> clipped = 2+1+0+1+1 = 5 of 6
    // 2-grams: cand {the cat, cat sat, sat on, on the, the mat}; ref has
    // {the cat, cat is, is on, on the, the mat} -> matches 3 of 5
    // 3-grams: cand 4, ref shares only "on the mat" -> 1 of 4
    // 4-grams: 0 of 3 -> corpus BLEU = 0 (no smoothing by design)
    val pairs = Seq((1L, "the cat sat on the mat", "the cat is on the mat"))
      .toDF("pid", "cand", "ref")
    val row = TextEval.bleuCorpus(pairs, "cand", "ref", "pid").collect().head
    assert(row.getAs[Long]("c_len") == 6L && row.getAs[Long]("r_len") == 6L)
    assert(row.getAs[Double]("bp_r") == 1.0)
    assert(row.getAs[Double]("p1_r") == r6(5.0 / 6))
    assert(row.getAs[Double]("p2_r") == r6(3.0 / 5))
    assert(row.getAs[Double]("p3_r") == r6(1.0 / 4))
    assert(row.getAs[Double]("p4_r") == 0.0)
    assert(row.getAs[Double]("bleu_r") == 0.0, "a zero order zeroes corpus BLEU")
    // maxN = 3 avoids the zero order: geometric mean of the three
    val row3 = TextEval.bleuCorpus(pairs, "cand", "ref", "pid", maxN = 3).collect().head
    val want = r6(math.exp((math.log(r6(5.0 / 6)) + math.log(r6(3.0 / 5)) + math.log(0.25)) / 3.0))
    assert(row3.getAs[Double]("bleu_r") == want, s"bleu3: $row3 vs $want")
  }

  test("bleuCorpus: clipping caps degenerate repetition; short candidate pays BP") {
    // the classic: cand "the the the the" vs ref with two "the"s ->
    // clipped p1 = 2/4, not 4/4
    val rep = Seq((1L, "the the the the", "the cat the mat")).toDF("pid", "cand", "ref")
    assert(TextEval.bleuCorpus(rep, "cand", "ref", "pid", maxN = 1)
      .collect().head.getAs[Double]("p1_r") == 0.5)
    // 3-token candidate vs 6-token reference: BP = exp(1 - 6/3)
    val short = Seq((1L, "the cat sat", "the cat sat on the mat")).toDF("pid", "cand", "ref")
    val row = TextEval.bleuCorpus(short, "cand", "ref", "pid", maxN = 1).collect().head
    assert(row.getAs[Double]("bp_r") == r6(math.exp(1.0 - 2.0)))
    assert(row.getAs[Double]("bleu_r") == r6(row.getAs[Double]("bp_r") * 1.0))
  }

  test("bleuCorpus is corpus-level: counts pool across pairs before the ratio") {
    // pair A matches 1 of 2 unigrams, pair B 3 of 3 -> corpus p1 = 4/5,
    // NOT mean(1/2, 1) = 3/4
    val pairs = Seq(
      (1L, "aa bb", "aa xx"),
      (2L, "cc dd ee", "cc dd ee")).toDF("pid", "cand", "ref")
    val row = TextEval.bleuCorpus(pairs, "cand", "ref", "pid", maxN = 1).collect().head
    assert(row.getAs[Double]("p1_r") == 0.8, s"corpus pooling: $row")
  }

  test("rouge12: hand precision/recall/F1 per pair; empty denominators read 0") {
    val pairs = Seq(
      // m1 = 5 (see BLEU hand case), m2 = 3; cl = rl = 6
      (1L, "the cat sat on the mat", "the cat is on the mat"),
      // zero overlap
      (2L, "aa bb", "xx yy"),
      // single-token pair: no bigrams anywhere -> rouge2 all 0
      (3L, "hello", "hello")).toDF("pid", "cand", "ref")
    val rows = TextEval.rouge12(pairs, "cand", "ref", "pid")
      .collect().map(r => r.getAs[Long]("pid") -> r).toMap
    val a = rows(1L)
    assert(a.getAs[Double]("rouge1_p") == r6(5.0 / 6) && a.getAs[Double]("rouge1_r") == r6(5.0 / 6))
    val f1 = r6(2.0 * r6(5.0 / 6) * r6(5.0 / 6) / (r6(5.0 / 6) + r6(5.0 / 6)))
    assert(a.getAs[Double]("rouge1_f") == f1, s"f1: $a")
    assert(a.getAs[Double]("rouge2_p") == 0.6 && a.getAs[Double]("rouge2_r") == 0.6)
    val b = rows(2L)
    Seq("rouge1_p", "rouge1_r", "rouge1_f", "rouge2_p", "rouge2_r", "rouge2_f")
      .foreach(c => assert(b.getAs[Double](c) == 0.0, s"$c of disjoint pair"))
    val c = rows(3L)
    assert(c.getAs[Double]("rouge1_f") == 1.0)
    assert(c.getAs[Double]("rouge2_p") == 0.0 && c.getAs[Double]("rouge2_f") == 0.0,
      "no bigram exists in a 1-token pair")
  }
}
