package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** [[Similarity.semDedup]]: the clustering bounds the pair space, the
  * smaller-id-neighbor rule decides keepers deterministically.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated directions; ids 1/2/3 cluster on (1,0,..), 4/5 on
  // (0,1,..); 2 is a near-copy of 1, 3 is orthogonal-ish within margin
  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
    (2L, Array(0.99f, 0.0f, 0.0f, 0.12f)),   // ~copy of 1 → dropped
    (3L, Array(0.9f, 0.0f, 0.44f, 0.0f)),    // same cell, below thr → kept
    (4L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (5L, Array(0.0f, 0.99f, 0.05f, 0.0f))    // near-copy of 4 (cos ≈ 0.9987) → dropped
  ).toDF("vec_id", "embedding")

  private def centroids = vecs.where(col("vec_id") === 1L || col("vec_id") === 4L)

  test("near-copies drop, distinct members and cross-cell pairs survive") {
    val got = Similarity
      .semDedup(vecs, centroids, thr = 0.995)
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(2))
      .toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true, 5L -> false))
  }

  test("pairs across cells are NEVER compared — cell-locality is the cost model") {
    // 10 and 20 are near-copies (cos ≈ 0.995 > thr) but each sits closest
    // to its own centroid, so they land in DIFFERENT cells and both survive:
    // SemDeDup's pair space is within-cell by construction (that is what
    // makes it sub-quadratic), and boundary-straddling pairs are the known
    // recall trade-off
    val straddle = Seq(
      (10L, Array(1.0f, 0.9f, 0.0f, 0.0f)),
      (20L, Array(0.9f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val cents = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity
      .semDedup(straddle, cents, thr = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((10L, 1L, true), (20L, 2L, true)))
  }

  test("maxCell guard: a saturated cell is excluded from comparison (all kept)") {
    val crowd = (1L to 6L).map(i => (i, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity
      .semDedup(crowd, crowd.where(col("vec_id") === 1L), thr = 0.5, maxCell = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got.values.forall(identity), "saturated cell must be pruned before pair expansion")
    assert(got.size == 6)
  }

  test("semDecontam: paraphrase-direction leak flagged, orthogonal absent, argmax ties to min id") {
    val bench = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)), // duplicate benchmark items
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(2.0f, 0.0f)),   // same direction as bench 0/1: cos 1.0
      (11L, Array(1.0f, 1.0f)),   // 45 degrees to everything: cos 0.707107
      (12L, Array(-1.0f, 0.0f)))  // best is cos 0.0 (to bench 2)
      .toDF("vec_id", "embedding")
    val strict = Similarity.semDecontam(corpus, bench, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(strict.toSeq == Seq((10L, 0L, 1.0)), s"strict: ${strict.toSeq}")
    val loose = Similarity.semDecontam(corpus, bench, threshold = 0.5)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(loose.toSeq == Seq((10L, 0L, 1.0), (11L, 0L, 0.707107)), s"loose: ${loose.toSeq}")
  }
}
