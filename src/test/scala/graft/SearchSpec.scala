package graft

import graft.operators.{InvertedIndex, Search, Tokenize}

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val postings = InvertedIndex.postings(
    Tokenize.tokens(
      Seq(
        (1L, "spark runs fast queries"),
        (2L, "spark joins tables"),
        (3L, "ducks swim"),
        (4L, "Spark! spark SPARK joins")).toDF("doc_id", "text"),
      "text", Seq("doc_id")))

  test("AND query requires every term") {
    val got = Search.andQuery(postings, Seq("spark", "joins")).as[Long].collect().toSeq
    assert(got == Seq(2L, 4L))
  }

  test("OR query ranks by distinct terms matched") {
    val got = Search
      .orQuery(postings, Seq("spark", "swim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("query terms go through the reference tokenizer (case, punctuation)") {
    val got = Search.andQuery(postings, Seq("SPARK!", "jo-ins")).as[Long].collect().toSeq
    assert(got == Seq(2L, 4L))
    // a term that cleans to empty is dropped, not impossible-to-match
    val gotEmptyTerm = Search.andQuery(postings, Seq("spark", "42")).as[Long].collect().toSeq
    assert(gotEmptyTerm == Seq(1L, 2L, 4L))
  }
}
