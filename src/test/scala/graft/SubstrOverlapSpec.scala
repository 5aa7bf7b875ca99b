package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Dedup}

/** Pins [[Dedup.substringOverlapPairs]] — exact ≥k-token substring
  * overlap at the Lee et al. 2022 standard — on planted corpora:
  *
  *  - a 60-token mid-document splice is found EXACTLY (start positions,
  *    maximal length) while CDC chunk dedup PROVABLY misses it: the
  *    splice tokens are chosen so none is a content-defined cut point
  *    (hash32 % modulus ≠ 0), so the chunk containing the splice extends
  *    into differing context on both sides and no chunk hash matches;
  *  - a 49-token overlap sits just under the 50-token bar — no row;
  *  - boilerplate grams past the df cap are dropped BEFORE expansion
  *    (audited), so a corpus-saturated span mints no pairs while the
  *    distinctive splice is unaffected.
  */
class SubstrOverlapSpec extends SparkSpec {
  import spark.implicits._

  /** The engine's portable 32-bit token hash (Chunking.chunkByContent's
    * cut-point hash): first 8 md5 hex chars as a long.
    */
  private def hash32(w: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    java.lang.Long.parseLong(
      d.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8), 16)
  }

  // deterministic lowercase-alpha words the reference tokenizer keeps
  private def word(prefix: String, i: Int): String =
    prefix + ('a' + i / 26).toChar + ('a' + i % 26).toChar

  // 60 splice tokens, none a CDC cut point at modulus 16 — the planted
  // span can never start or end a chunk of its own
  private lazy val splice: Seq[String] =
    Iterator.from(0).map(word("spl", _)).filter(w => hash32(w) % 16 != 0)
      .take(60).toSeq

  private lazy val aToks = (0 until 70).map(word("aaa", _)) ++ splice ++
    (0 until 70).map(word("azz", _)) // doc A: splice at positions 70..129, 200 tokens
  private lazy val bToks = (0 until 80).map(word("bbb", _)) ++ splice ++
    (0 until 70).map(word("bzz", _)) // doc B: splice at positions 80..139, 210 tokens

  private lazy val planted = Seq(
    (1L, aToks.mkString(" ")),
    (2L, bToks.mkString(" "))).toDF("doc_id", "text")

  test("a 60-token mid-document splice is found exactly: positions, maximal length") {
    val got = Dedup.substringOverlapPairs(planted, minTokens = 50, anchorK = 8, dfCap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 70L, 80L, 60L)),
      s"expected exactly the planted splice (1, 2, 70, 80, 60), got ${got.toSeq}")
  }

  test("CDC chunking provably misses the same splice (no cut point inside it)") {
    // sanity: the planted invariant CDC relies on
    splice.foreach(w => assert(hash32(w) % 16 != 0, s"$w is a cut point — plant broken"))
    // chunk-level pair detection: nothing (no chunk hash is shared,
    // because every chunk covering splice tokens extends into differing
    // context on at least one side)
    assert(Chunking.chunkDupPairs(planted, modulus = 16, minShared = 1, minFrac = 0.0)
      .count() == 0, "CDC chunk pairs must miss a splice containing no cut point")
    // span-removal twin: dedupSpans removes nothing either
    val removed = Chunking.dedupSpans(planted, modulus = 16)
      .agg(sum("n_removed")).head().getLong(0)
    assert(removed == 0, s"dedupSpans must not find the splice (removed $removed chunks)")
  }

  test("a 49-token overlap sits under the 50-token bar; 50 passes it") {
    val sub49 = splice.take(49)
    val docs = Seq(
      (1L, ((0 until 40).map(word("caa", _)) ++ sub49 ++ (0 until 40).map(word("czz", _))).mkString(" ")),
      (2L, ((0 until 30).map(word("daa", _)) ++ sub49 ++ (0 until 30).map(word("dzz", _))).mkString(" ")))
      .toDF("doc_id", "text")
    assert(Dedup.substringOverlapPairs(docs, minTokens = 50).count() == 0,
      "49 shared tokens must not reach the 50-token bar")
    val at49 = Dedup.substringOverlapPairs(docs, minTokens = 49)
      .select("span_len").collect().map(_.getLong(0)).toSeq
    assert(at49 == Seq(49L), s"at minTokens=49 the run must surface exactly once: $at49")
  }

  test("df-capped boilerplate grams drop before expansion, audited; distinctive spans unaffected") {
    // 30 docs all carrying the same 20-token boilerplate → every gram
    // inside it has df 30 > dfCap 10; the two planted docs keep their
    // distinctive splice (df 2)
    val boiler = (0 until 20).map(word("boi", _))
    val noisy = (10L until 40L).map { i =>
      (i, ((0 until 5).map(word(s"n$i", _)) ++ boiler ++ (0 until 5).map(word(s"m$i", _))).mkString(" "))
    }.toDF("doc_id", "text")
    val o = new Observation("substr_cap")
    val pairs = Dedup.substringOverlapPairs(planted.unionByName(noisy),
      minTokens = 20, anchorK = 8, dfCap = 10, dropAudit = Some(o))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val m = o.get
    assert(m("dropped_buckets").asInstanceOf[Long] > 0,
      s"boilerplate grams past the cap must be audited: $m")
    assert(pairs.toSeq == Seq((1L, 2L, 60L)),
      s"only the distinctive splice may pair — boilerplate is capped out: ${pairs.toSeq}")
  }

  test("strip action: the doc2-side splice is deleted, the doc1 copy kept (Lee et al. semantics)") {
    val got = Dedup.substringStrip(planted, minTokens = 50, anchorK = 8, dfCap = 100)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((200L, 0L, aToks.mkString(" "))),
      s"doc 1 is the lowest-id holder — nothing stripped: ${got(1L)}")
    val expected2 = (bToks.take(80) ++ bToks.drop(140)).mkString(" ")
    assert(got(2L) == ((210L, 60L, expected2)),
      s"doc 2 must lose exactly the 60-token splice at [80,140): ${got(2L)}")
  }

  test("strip action: overlapping intervals from multiple partners merge before stripping") {
    // three identical docs: B strips against A; C carries TWO identical
    // full-length intervals (vs A and vs B) that must merge to one —
    // n_stripped equals the doc length, never double-counts
    val t3 = (0 until 80).map(word("tri", _)).mkString(" ")
    val tri = Seq((1L, t3), (2L, t3), (3L, t3)).toDF("doc_id", "text")
    val got = Dedup.substringStrip(tri, minTokens = 50, anchorK = 8, dfCap = 100)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((80L, 0L, t3)), s"keeper intact: ${got(1L)}")
    assert(got(2L) == ((80L, 80L, "")) && got(3L) == ((80L, 80L, "")),
      s"both later copies fully stripped exactly once: ${got(2L)}, ${got(3L)}")
  }
}
