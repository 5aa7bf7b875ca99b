package graft

import graft.operators.Similarity

/** Clustering-quality evals ([[Similarity.silhouetteSimplified]] /
  * [[Similarity.daviesBouldin]]): hand-computed values on exact-cosine
  * geometry, degenerate separations, and the boundary-straddler case.
  */
class ClusterEvalSpec extends SparkSpec {
  import spark.implicits._

  private def pround(x: Double, dp: Int): Double = {
    val m = math.pow(10, dp)
    math.floor(x * m + 0.5) / m
  }

  // centroids on the axes: cos(c0, c1) = 0 exactly
  private val cents = Seq(
    (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")

  test("silhouetteSimplified: on-centroid members read 1, a boundary straddler reads 0") {
    val members = Seq(
      (10L, Array(1.0f, 0.0f)),   // exactly c0: a=0, b=1 -> s=1
      (11L, Array(0.0f, 1.0f)),   // exactly c1: s=1
      (12L, Array(1.0f, 1.0f)))   // equidistant: tie -> cell 0, a=b -> s=0
      .toDF("vec_id", "embedding")
    val got = Similarity.silhouetteSimplified(members, cents)
      .orderBy("cell")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val aBoundary = 1.0 - pround(math.sqrt(0.5), 6)
    val aMean0 = pround((0L + math.floor(aBoundary * 1e6 + 0.5).toLong).toDouble / 1e6 / 2, 6)
    assert(got.toSeq == Seq(
      (0L, 2L, 0.5, aMean0),
      (1L, 1L, 1.0, 0.0)),
      s"got: ${got.toSeq}")
  }

  test("daviesBouldin: zero scatter reads R 0; the straddler's scatter drives both cells' R") {
    val clean = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val gotClean = Similarity.daviesBouldin(clean, cents)
      .orderBy("cell")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    // S = 0 both cells, M = 1 - cos = 1 -> R = 0
    assert(gotClean.toSeq == Seq((0L, 0.0, 0.0), (1L, 0.0, 0.0)), s"clean: ${gotClean.toSeq}")

    val straddle = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f)),
      (12L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val aBoundary = 1.0 - pround(math.sqrt(0.5), 6)
    val s0 = pround((0L + math.floor(aBoundary * 1e6 + 0.5).toLong).toDouble / 1e6 / 2, 6)
    val r01 = pround((s0 + 0.0) / 1.0, 6)
    val gotS = Similarity.daviesBouldin(straddle, cents)
      .orderBy("cell")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // both cells' worst (only) neighbor term is (S0 + S1) / M01 = s0
    assert(gotS.toSeq == Seq((0L, 2L, s0, r01), (1L, 1L, 0.0, r01)), s"straddle: ${gotS.toSeq}")
  }

  test("daviesBouldin: a coincident-centroid pair reads NULL R when no positive-M neighbor exists") {
    val dup = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(2.0f, 0.0f))).toDF("vec_id", "embedding")
    val members = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(3.0f, 0.0f))).toDF("vec_id", "embedding")
    // both centroids are the same DIRECTION: cos = 1 -> M = 0 everywhere;
    // ties assign everything to cell 0, cell 1 is empty/absent
    val got = Similarity.daviesBouldin(members, dup).collect()
    assert(got.length == 1 && got.head.getLong(0) == 0L && got.head.isNullAt(3),
      s"dup centroids: ${got.toSeq}")
  }
}
