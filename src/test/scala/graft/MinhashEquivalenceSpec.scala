package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Tokenize}

/** The r14 cheap non-empty guard in the minhash path: `rlike '[A-Za-z]'`
  * must select EXACTLY the docs whose cleaned token set is non-empty —
  * CleanToken keeps precisely the bytes [A-Za-z] (lowercased), so a doc
  * has ≥1 surviving token iff its text has ≥1 ASCII letter. Pinned on
  * real corpora plus the adversarial edge cases, and end-to-end on the
  * candidate pairs.
  */
class MinhashEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("rlike guard == size(tokenArray)>0 on real corpora and edge cases") {
    val edge = Seq(
      (900001L, "123 456 !!!"),          // no letters → empty tokens
      (900002L, "τοκεν μονο ελληνικα"),  // non-ASCII only → empty tokens
      (900003L, "x"),                    // single letter → non-empty
      (900004L, "1a2"),                  // letter embedded in digits
      (900005L, ""),                     // empty text
      (900006L, "Z")                     // uppercase only
    ).toDF("doc_id", "text")
    for (path <- Seq("/root/testdata/sf0.001/documents.parquet",
                     "/root/testdata/sf0.01/documents.parquet")) {
      val docs = spark.read.parquet(path).select("doc_id", "text").unionByName(edge)
      val viaTokens = docs.where(size(Tokenize.tokenArray(col("text"))) > 0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val viaRlike = docs.where(col("text").rlike("[A-Za-z]"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(viaRlike == viaTokens, s"guard predicates diverge on $path")
      assert(!viaRlike.contains(900001L) && !viaRlike.contains(900002L)
        && !viaRlike.contains(900005L))
      assert(viaRlike.contains(900003L) && viaRlike.contains(900004L)
        && viaRlike.contains(900006L))
    }
  }

  test("minhash candidates unchanged by the guard swap (vs spec-local reimplementation)") {
    // end-to-end: candidates from the shipped operator == candidates from
    // a local variant using the token-count guard, on sf0.001 + edge docs
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      .unionByName(Seq((900001L, "123 456 !!!"), (900007L, "alpha beta gamma delta")).toDF("doc_id", "text"))
    val got = Dedup.minhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the old guard, composed manually: filter docs the expensive way
    // FIRST, then run the operator (its internal rlike guard is then a
    // no-op on the pre-filtered input)
    val want = Dedup.minhashCandidates(
      docs.where(size(Tokenize.tokenArray(col("text"))) > 0))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, "candidate pairs changed under the cheap guard")
  }
}
