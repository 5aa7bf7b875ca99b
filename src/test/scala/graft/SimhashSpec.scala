package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Tokenize}

/** SimHash must behave like a similarity hash, not just match the oracle:
  * near-identical documents land within a few bits; unrelated documents far.
  */
class SimhashSpec extends SparkSpec {
  import spark.implicits._

  private def simhashOf(docs: Seq[(Long, String)]): Map[Long, Long] =
    Dedup
      .simhash(Tokenize.tokens(docs.toDF("doc_id", "text"), "text", Seq("doc_id")))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("near-identical docs are close in hamming distance, unrelated docs far") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home " * 4
    val near = base + " extra token"
    val far  = "completely different vocabulary about spark catalyst optimizer shuffle partitions exchange codegen " * 4
    val h = simhashOf(Seq((1L, base), (2L, near), (3L, far)))
    val dNear = hamming(h(1L), h(2L))
    val dFar  = hamming(h(1L), h(3L))
    assert(dNear <= 6, s"near docs should be close, got $dNear bits")
    assert(dFar > dNear, s"unrelated docs should be farther: near=$dNear far=$dFar")
  }

  test("identical content gives identical simhash; fits in 32 bits") {
    val h = simhashOf(Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta")))
    assert(h(1L) == h(2L))
    assert(h.values.forall(v => v >= 0 && v < (1L << 32)))
  }
}
