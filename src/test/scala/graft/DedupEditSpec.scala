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
}
