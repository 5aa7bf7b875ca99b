package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** [[Similarity.mutualTopMatch]]: reciprocity yields exactly the known
  * mutual pairs, hubs are capped at one edge, and the output is a partial
  * matching (each side appears at most once).
  */
class MutualMatchSpec extends SparkSpec {
  import spark.implicits._

  test("only reciprocal top-1 pairs survive; a one-directional best is dropped") {
    // a1↔b1 and a2↔b2 are mutual; a3's best is ALSO b1, but b1 prefers a1,
    // so a3 matches nothing — the hubness cap in miniature
    val a = Seq(
      (10L, Array(1.0f, 0.0f)),
      (20L, Array(0.0f, 1.0f)),
      (30L, Array(0.95f, 0.05f))
    ).toDF("vec_id", "embedding")
    val b = Seq(
      (11L, Array(1.0f, 0.01f)),
      (21L, Array(0.01f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.mutualTopMatch(a, b)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 11L), (20L, 21L)))
  }

  test("output is a partial matching: every a_id and b_id at most once") {
    // deterministic pseudo-random vectors; reciprocity must still produce
    // a matching whatever the geometry
    val rnd = new java.util.Random(42)
    def vec() = Array.fill(8)(rnd.nextFloat() - 0.5f)
    val a = (0L until 40L).map(i => (i, vec())).toDF("vec_id", "embedding")
    val b = (100L until 130L).map(i => (i, vec())).toDF("vec_id", "embedding")
    val rows = Similarity.mutualTopMatch(a, b)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(rows.nonEmpty, "some mutual pair must exist")
    assert(rows.map(_._1).distinct.length == rows.length, "a_id repeated")
    assert(rows.map(_._2).distinct.length == rows.length, "b_id repeated")
    assert(rows.length <= 30, "matching cannot exceed the smaller side")
  }

  test("mmrSelect: the diverse equal-relevance candidate beats the exact duplicate") {
    // query (1,0); a=(3,1) id 1, b=(6,2) id 2 (exact dup of a, sim 1),
    // c=(3,-1) id 3 (equally relevant, sim(c,a)=0.8). All rel_r equal
    // (0.948683) → first pick = min id = 1. λ=0.5 round 2:
    //   b: ½·0.948683 − ½·1.0 = −0.025658   c: ½·0.948683 − ½·0.8 = 0.074342
    // → c (diversity) wins rank 2, the duplicate drops to rank 3.
    val corpus = Seq(
      (1L, Array(3.0f, 1.0f)),
      (2L, Array(6.0f, 2.0f)),
      (3L, Array(3.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val query = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(corpus, query, n = 3, k = 3, lambda = 0.5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toList
    assert(got == List((1, 1L, 0.948683), (2, 3L, 0.074342), (3, 2L, -0.025658)),
      s"got $got")
  }

  test("mmrSelect: fewer candidates than k stops gracefully; string ids work; empty corpus is empty") {
    // 2 candidates, k=4 — the greedy loop must stop at 2 picks instead of
    // .head-ing an empty argmax round; ids are STRINGS, so the generic
    // Row.get path is exercised (the r12 form hard-cast getLong)
    val corpus = Seq(("docA", Array(3.0f, 1.0f)), ("docB", Array(3.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val query = Seq(("q", Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(corpus, query, n = 3, k = 4, lambda = 0.5)
      .collect().map(r => (r.getInt(0), r.getString(1))).toList
    assert(got.map(_._1) == List(1, 2), s"two picks for two candidates: $got")
    assert(got.map(_._2).toSet == Set("docA", "docB"), s"got $got")
    // empty corpus: zero rows, correct schema, no crash
    val empty = Similarity.mmrSelect(corpus.where(lit(false)), query, n = 3, k = 2)
    assert(empty.collect().isEmpty && empty.columns.toSeq == Seq("rank", "vec_id", "score_r"))
  }

  test("identical sets under distinct ids match one-to-one with cos 1.0") {
    val a = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(-1.0f, 0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val b = Seq((5L, Array(1.0f, 2.0f, 3.0f)), (6L, Array(-1.0f, 0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mutualTopMatch(a, b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 5L, 1.0), (2L, 6L, 1.0)))
  }
}
