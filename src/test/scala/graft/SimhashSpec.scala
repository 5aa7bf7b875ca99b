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

  private def docs60(docs: Seq[(Long, String)]) =
    Dedup.simhash(Tokenize.tokens(docs.toDF("doc_id", "text"), "text", Seq("doc_id")), bits = 60)

  test("60-bit signature fits in 60 bits and differs from the 32-bit one") {
    val d = Seq((1L, "alpha beta gamma delta epsilon zeta"))
    val wide   = docs60(d).collect().head.getLong(1)
    val narrow = simhashOf(d)(1L)
    assert(wide >= 0 && wide < (1L << 60))
    // the low 32 bits of the wide signature ARE the narrow signature (same
    // per-bit sums) — the width only ADDS discriminating bits
    assert((wide & 0xffffffffL) == narrow)
  }

  test("banded + capped pairs equal unbanded all-pairs hamming (pigeonhole exactness)") {
    val corpus = (1L to 40L).map { i =>
      val base = s"shared vocabulary tokens common across documents group${i % 5}"
      (i, if (i % 2 == 0) base else base + s" unique$i extra$i")
    }
    val sigs = docs60(corpus).cache()
    val banded = Dedup
      .simhashPairs(sigs, maxDist = 3, bands = 6, sigBits = 60, maxBucket = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val raw = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (i1, s1) <- raw; (i2, s2) <- raw if i1 < i2
      d = java.lang.Long.bitCount(s1 ^ s2) if d <= 3
    } yield (i1, i2, d)).toSet
    sigs.unpersist()
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
  }

  test("maxBucket drops saturated buckets before pair expansion") {
    // five identical docs: identical signatures share every band bucket
    val sigs = docs60((1L to 5L).map(i => (i, "identical content in every document")))
    val capped = Dedup.simhashPairs(sigs, maxDist = 3, bands = 6, sigBits = 60, maxBucket = 4)
    assert(capped.count() == 0, "all buckets are saturated at cap 4 — no pairs may survive")
    val uncapped = Dedup.simhashPairs(sigs, maxDist = 3, bands = 6, sigBits = 60, maxBucket = 5)
    assert(uncapped.count() == 10, "5 identical docs give C(5,2)=10 pairs under the cap")
  }
}
