package graft

import graft.operators.Similarity

/** [[Similarity.labelAudit]]: a planted mislabel is the suspect, clean
  * clusters are not, and the margin is own-centroid minus nearest-foreign.
  */
class LabelAuditSpec extends SparkSpec {
  import spark.implicits._

  // two tight, well-separated clusters in 4-d; vec 99 carries cluster-B
  // geometry under label 0 — the planted mislabel
  private def fixture = Seq(
    (1L, Array(1.0f, 0.1f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.0f, 0.1f, 0.0f), 0),
    (3L, Array(1.0f, 0.0f, 0.0f, 0.1f), 0),
    (4L, Array(0.0f, 0.1f, 1.0f, 0.0f), 1),
    (5L, Array(0.1f, 0.0f, 0.9f, 0.0f), 1),
    (6L, Array(0.0f, 0.0f, 1.0f, 0.1f), 1),
    (99L, Array(0.0f, 0.1f, 0.95f, 0.05f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("planted mislabel is the only suspect; margins are signed correctly") {
    val got = Similarity.labelAudit(fixture)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(got.size == 7, "every vector is audited")
    val suspects = got.collect { case (id, (_, _, true)) => id }
    assert(suspects.toSet == Set(99L), s"only the planted mislabel flags: $got")
    val (nearest, margin, _) = got(99L)
    assert(nearest == 1, "the suspect's nearest foreign label is the cluster it really belongs to")
    assert(margin < -0.1, s"decisively negative margin: $margin")
    // clean members sit decisively on their own side
    Seq(1L, 2L, 3L, 4L, 5L, 6L).foreach { id =>
      assert(got(id)._2 > 0.1, s"clean vector $id margin: ${got(id)._2}")
    }
  }

  test("knnLabelEval: planted mislabel drags its label's accuracy; clean label stays 1.0") {
    // every vector is a query (nQueries high). Label 0's cluster is clean
    // except vec 99, whose neighbors are all label 1 -> it votes wrong;
    // the three true label-0 vectors vote right -> acc 3/4. Label 1's
    // queries all sit in their own cluster BUT vec 99 (label 0) is inside
    // it; with k=3 the vote is still majority-1 -> acc 1.0.
    val got = Similarity.knnLabelEval(fixture, kNeighbors = 3, nQueries = 1000)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0) == ((4L, 3L, 0.75)), s"label 0: ${got(0)}")
    assert(got(1) == ((3L, 3L, 1.0)), s"label 1: ${got(1)}")
    // deterministic on rerun
    val again = Similarity.knnLabelEval(fixture, kNeighbors = 3, nQueries = 1000)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == again)
  }

  test("embedHygiene: ragged dims, zero vectors, and NaNs all surface per label") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(3.0f, 4.0f), 0),              // norm 5
      (2L, Array(0.0f, 0.0f), 0),              // zero vector
      (3L, Array(1.0f, 0.0f, 0.0f), 0),        // ragged: dim 3 in a dim-2 label
      (4L, Array(Float.NaN, 1.0f), 1),         // NaN poison
      (5L, Array(0.0f, 2.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.embedHygiene(df)
      .collect().map(r => r.getInt(0) -> r).toMap
    val l0 = got(0)
    assert(l0.getLong(1) == 3 && l0.getInt(2) == 2 && l0.getInt(3) == 3,
      s"ragged dims surface as min!=max: $l0")
    assert(l0.getLong(4) == 1, s"zero vector counted: $l0")
    val l1 = got(1)
    assert(l1.getLong(5) == 1, s"NaN counted: $l1")
    assert(l1.getDouble(6) == 2.0 && l1.getDouble(7) == 2.0 && l1.getDouble(8) == 2.0,
      s"NaN excluded from the norm stats: $l1")
  }

  test("audit over the real embeddings table: total rows preserved, margins in [-2, 2]") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Similarity.labelAudit(emb).collect()
    assert(got.length == emb.count(), "one audit row per labeled vector")
    got.foreach { r =>
      val m = r.getDouble(3)
      assert(m >= -2.0 && m <= 2.0, s"cosine margin out of range: $m")
      assert(r.getBoolean(4) == (m < 0), "suspect flag must equal margin<0")
    }
  }
}
