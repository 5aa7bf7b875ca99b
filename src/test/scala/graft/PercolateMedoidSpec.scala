package graft

import org.apache.spark.sql.functions._

import graft.operators.{Search, Similarity}

/** [[Search.percolate]] and [[Similarity.cellMedoid]]: conjunctive match
  * semantics and exemplar selection on hand-built inputs.
  */
class PercolateMedoidSpec extends SparkSpec {
  import spark.implicits._

  test("percolate: conjunctive semantics, duplicate terms count once") {
    val toks = Seq(
      (1L, "alpha"), (1L, "beta"), (1L, "beta"),   // matches q1 (both terms)
      (2L, "alpha"),                               // q1 partial → no match
      (3L, "beta"), (3L, "gamma"),                 // matches q2
      (4L, "alpha"), (4L, "beta"), (4L, "gamma")   // matches q1 AND q2
    ).toDF("doc_id", "word")
    val got = Search.percolate(toks, Seq(1 -> Seq("alpha", "beta"), 2 -> Seq("gamma")))
      .as[(Int, Long)].collect().toSet
    assert(got == Set((1, 1L), (1, 4L), (2, 3L), (2, 4L)), s"got $got")
  }

  test("percolate: a query term cleaned to nothing can't block a match") {
    val toks = Seq((1L, "alpha")).toDF("doc_id", "word")
    // "123" cleans to empty and is dropped → query is just "alpha"
    val got = Search.percolate(toks, Seq(7 -> Seq("Alpha", "123")))
      .as[(Int, Long)].collect().toSet
    assert(got == Set((7, 1L)))
  }

  test("cellMedoid picks the geometric middle member; singleton is its own medoid") {
    // centroid 100 → members 1,2,3: 2 sits between 1 and 3 → medoid 2.
    // centroid 200 → member 4 alone → its own medoid at sum 0.
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.95f, 0.2f)),
      (3L, Array(0.85f, 0.4f)),
      (4L, Array(0.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val centroids = Seq(
      (100L, Array(1.0f, 0.2f)),
      (200L, Array(0.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.cellMedoid(corpus, centroids)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(100L)._1 == 2L, s"middle member is the medoid: $got")
    assert(got(100L)._2 == 3L)
    assert(got(200L) == (4L, 1L, 0.0), s"singleton: $got")
  }

  test("clusterTopTerms: distinctive terms outrank cluster-universal ones") {
    // cell A: apple×3 + common; cell B: banana×2 + common.
    // score(apple|A) = 3·ln(3/2) = 1.216395, score(common|·) = ln(3/3)·tf = 0
    val toks = Seq(
      (1L, "apple"), (1L, "apple"), (2L, "apple"), (2L, "common"),
      (3L, "banana"), (4L, "banana"), (4L, "common")
    ).toDF("doc_id", "word")
    val asn = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L)).toDF("doc_id", "cell")
    val got = Similarity.clusterTopTerms(toks, asn, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .toList.sortBy(t => (t._1, t._2))
    assert(got == List(
      (10L, 1, "apple", 3L, 1.216395), (10L, 2, "common", 1L, 0.0),
      (20L, 1, "banana", 2L, 0.81093), (20L, 2, "common", 1L, 0.0)), s"got $got")
  }

  test("cellMedoid: maxCell drops over-full cells entirely") {
    val corpus = (1L to 6L).map(i => (i, Array(1.0f, i * 0.01f))).toDF("vec_id", "embedding")
    val centroids = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.cellMedoid(corpus, centroids, maxCell = 5).collect()
    assert(got.isEmpty, "a cell above maxCell must not emit a medoid")
  }
}
