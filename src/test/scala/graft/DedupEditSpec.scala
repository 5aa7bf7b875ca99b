package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Edit-distance candidate verification: hand distances over normalized
  * text, the order-awareness Jaccard lacks, the banded early-exit, and
  * the empty-text guard.
  */
class DedupEditSpec extends SparkSpec {

  import spark.implicits._

  test("editVerifyPairs: hand distance over normalized text; order-aware where Jaccard is not") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d f"),    // one substitution from doc 1
      (3L, "e d c b a"))    // same token BAG as doc 1, reversed order
      .toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("doc1", "doc2")
    val got = Dedup.editVerifyPairs(docs, cands, maxDist = 400)
      .orderBy("doc2")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
    // "a b c d e" -> "a b c d f": one substitution; len 9
    assert(got(0) == ((2L, 1, math.floor((1.0 - 1.0 / 9) * 1e6 + 0.5) / 1e6)))
    // reversal costs many edits even though the token bag is identical
    assert(got(1)._2 == 4, s"reversal: 'e d c b a' is 4 substitutions away: ${got(1)}")
    assert(got(0)._3 > got(1)._3, "near-copy must outscore the bag-equal shuffle")
  }

  test("editVerifyPairs: pairs beyond maxDist drop via the banded early-exit") {
    val docs = Seq(
      (1L, "aaaa bbbb cccc"),
      (2L, "aaaa bbbb cccd"),  // dist 1
      (3L, "zzzz yyyy xxxx")) // dist way above 2
      .toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("doc1", "doc2")
    val got = Dedup.editVerifyPairs(docs, cands, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)), s"only the close pair survives: ${got.toSeq}")
  }

  test("editVerifyPairs: two token-less docs are identical by convention") {
    val docs = Seq((1L, "123 456"), (2L, "789 ...")).toDF("doc_id", "text")
    val cands = Seq((1L, 2L)).toDF("doc1", "doc2")
    val got = Dedup.editVerifyPairs(docs, cands)
      .collect().map(r => (r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0, 1.0)))
  }

  test("lshPlan: s50 monotone in rows, extremes lose, argmin interior and unique") {
    val got = Dedup.lshPlan(spark, numHashes = 16, threshold = 0.5)
      .orderBy("bands")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getInt(6)))
    assert(got.map(_._1).toSeq == Seq(1, 2, 4, 8, 16))
    // s50 falls as bands rise (more OR -> the curve fires at lower s)
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted.reverse)
    // hand midpoint for (4, 4): (1 - 0.5^(1/4))^(1/4)
    val s50h = math.pow(1.0 - math.pow(0.5, 0.25), 0.25)
    val row44 = got.find(_._1 == 4).get
    assert(math.abs(row44._3 - s50h) < 1e-6, s"s50(4,4) = ${row44._3} vs $s50h")
    // all-AND (b=1) drowns in false negatives, all-OR (b=16) in false
    // positives; an interior factorization must win, exactly once
    val opt = got.filter(_._7 == 1)
    assert(opt.length == 1, s"exactly one pick: ${got.toSeq}")
    assert(Set(2, 4, 8).contains(opt.head._1), s"interior argmin: ${opt.head}")
    assert(got.forall(t => t._4 >= 0 && t._4 <= 1 && t._5 >= 0 && t._5 <= 1),
      "integral masses stay in [0, 1]")
  }
}
