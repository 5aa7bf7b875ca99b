package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, Tokenize}

/** Pins the per-bucket scale guards of the capped pair generators under a
  * 50x-replicated DUPLICATE-DENSE corpus — every document/vector appears 50
  * times byte-identically, so every signature bucket is at least 50 deep and
  * the caps are the only thing between the plan and a quadratic blowup.
  * These properties are what ScaleBench measures wall-clock for at sf0.1;
  * here they are asserted structurally at sf0.001 so a parameter change
  * that silently unbounds a bucket fails in CI, not at 100 TB.
  */
class ScaleGuardSpec extends SparkSpec {

  private val Factor = 50

  private lazy val docs50 = ScaleBench.replicated(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id", "text"),
    "doc_id", Factor)

  // eager checkpoints: each suite action would otherwise recompute the
  // full tokenize + two-shuffle simhash upstream (the suite runs ~10
  // actions over these relations at local[4])
  private lazy val sigs1 = Dedup.simhash(
    Tokenize.tokens(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id", "text"),
      "text", Seq("doc_id")),
    bits = 60).localCheckpoint(true)

  private lazy val sigs50 = Dedup.simhash(
    Tokenize.tokens(docs50, "text", Seq("doc_id")), bits = 60).localCheckpoint(true)

  private lazy val emb1 = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").select("vec_id", "embedding")

  private lazy val emb50 = ScaleBench.replicated(emb1, "vec_id", Factor).localCheckpoint(true)

  // smaller target buckets than the sf0.1 default: at local[4] the point is
  // the structural bound, not in-bucket throughput
  private def embPlanes: Int = Similarity.planesFor(Factor * emb1.count(), targetBucket = 256)

  test("simhash band buckets grow exactly linearly under replication (deterministic hashing)") {
    val b1 = sigs1.transform(Dedup.simhashBucketSizes(_))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val b50 = sigs50.transform(Dedup.simhashBucketSizes(_))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(b1.nonEmpty && b50.keySet == b1.keySet,
      "identical replicas must land in exactly the 1x bucket keys")
    // replicas carry identical signatures, so every bucket is exactly 50x
    // deeper — sublinear growth here would mean the hashing is not
    // deterministic; superlinear would mean replicas cross buckets
    b1.foreach { case (k, n) =>
      assert(b50(k) == n * Factor, s"bucket $k: ${b50(k)} != $n * $Factor")
    }
  }

  test("simhash cap binds BEFORE pair expansion: all-saturated corpus emits zero pairs") {
    // every bucket holds >= 50 members (each doc's replicas share its
    // signature), so a cap below the factor drops every bucket — the
    // pipeline must emit nothing rather than expand any saturated bucket
    val minBucket = sigs50.transform(Dedup.simhashBucketSizes(_))
      .agg(min("n")).head().getLong(0)
    assert(minBucket >= Factor, s"replication floor violated: min bucket $minBucket < $Factor")
    val capped = Dedup.simhashPairs(sigs50, maxBucket = Factor - 1)
    assert(capped.count() == 0, "a cap below the replication factor must drop every bucket")
  }

  test("simhash pair stream at 50x is bounded by the retained buckets' pair sum") {
    val cap = 1 << 12
    val bound = sigs50.transform(Dedup.simhashBucketSizes(_))
      .where(col("n").between(2, cap))
      .agg(sum(expr("n * (n - 1) DIV 2"))).head().getLong(0)
    val pairs = Dedup.simhashPairs(sigs50, maxBucket = cap)
    val nPairs = pairs.count()
    assert(nPairs > 0, "50 replicas of each doc must produce near-dup pairs under the default cap")
    assert(nPairs <= bound,
      s"emitted $nPairs pairs > retained-bucket bound $bound — a saturated bucket expanded")
    // capped output is a SUBSET of the uncapped closure, never novel pairs
    val uncapped = Dedup.simhashPairs(sigs50, maxBucket = Int.MaxValue)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cappedSet = pairs.select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedSet.subsetOf(uncapped), "capping must only DROP pairs")
  }

  test("embedding LSH buckets grow exactly linearly under replication") {
    val planes = embPlanes
    val b1 = Similarity.lshBucketSizes(emb1, planes, tables = 2)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val b50 = Similarity.lshBucketSizes(emb50, planes, tables = 2)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(b1.nonEmpty && b50.keySet == b1.keySet)
    b1.foreach { case (k, n) =>
      assert(b50(k) == n * Factor, s"bucket $k: ${b50(k)} != $n * $Factor")
    }
  }

  test("embedding cap binds before the self-join at 50x; retained buckets bound the pairs") {
    val planes = embPlanes
    // below-factor cap: every bucket holds a full replica set, so nothing survives
    val capped = Similarity.cosineNearDupPairs(
      emb50, thr = 0.25, planes = planes, tables = 2, maxBucket = Factor - 1)
    assert(capped.count() == 0, "a cap below the replication factor must drop every bucket")
    // default cap: the pair stream obeys the retained buckets' quadratic sum
    val cap = 1 << 12
    val bound = Similarity.lshBucketSizes(emb50, planes, tables = 2)
      .where(col("n").between(2, cap))
      .agg(sum(expr("n * (n - 1) DIV 2"))).head().getLong(0)
    val nPairs = Similarity.cosineNearDupPairs(
      emb50, thr = 0.25, planes = planes, tables = 2, maxBucket = cap).count()
    assert(nPairs > 0, "replicated vectors are exact duplicates and must pair under the cap")
    assert(nPairs <= bound,
      s"emitted $nPairs pairs > retained-bucket bound $bound — a saturated bucket self-joined")
  }

  test("probe cap: flipped visits skip hot buckets, audited; capped probes never mint novel pairs") {
    import org.apache.spark.sql.Observation
    val planes = embPlanes
    // probeMaxBucket below the replica-set size: every bucket is hot (all
    // Factor-sized multiples), so FLIPPED visits are all dropped and the
    // probed run must equal the plain single-table run; the audit counts
    // every kept bucket as probe-capped
    val o = new Observation("probe_cap")
    val probedCapped = Similarity.cosineNearDupPairs(
      emb50, thr = 0.25, planes = planes, tables = 1, maxBucket = 1 << 12,
      probes = math.min(4, planes), probeMaxBucket = Factor - 1, dropAudit = Some(o))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val m = o.get
    assert(m("probe_capped_buckets").asInstanceOf[Long] > 0,
      s"audit must count probe-capped buckets: $m")
    val plain = Similarity.cosineNearDupPairs(
      emb50, thr = 0.25, planes = planes, tables = 1, maxBucket = 1 << 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probedCapped == plain,
      "with every bucket probe-capped, probing must add nothing over plain")
    // and an uncapped probe run is a SUPERSET (the cap only drops)
    val probedFull = Similarity.cosineNearDupPairs(
      emb50, thr = 0.25, planes = planes, tables = 1, maxBucket = 1 << 12,
      probes = math.min(4, planes))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probedCapped.subsetOf(probedFull), "probe cap must only DROP pairs")
  }

  test("probe-cap pair retention is id-order-free (relabeling ids never changes the pair set)") {
    // r16 advice fix: under the old v1<v2-before-normalization join, a
    // hot–cold flip pair survived only when the COLD member's id was the
    // smaller — retention depended on id assignment. Pin the fix by
    // relabeling every id through an order-REVERSING bijection and
    // asserting the (normalized) pair set is unchanged.
    val planes = embPlanes
    val cap = Factor // single-replica-set buckets stay probe-able, deeper ones are hot
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      Similarity.cosineNearDupPairs(df, thr = 0.25, planes = planes, tables = 1,
        maxBucket = 1 << 12, probes = math.min(4, planes), probeMaxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = pairsOf(emb50)
    val maxId = emb50.agg(max("vec_id")).head().getLong(0)
    val reversed = pairsOf(emb50.withColumn("vec_id", lit(maxId) - col("vec_id")))
      .map { case (a, b) =>
        val (x, y) = (maxId - a, maxId - b)
        (math.min(x, y), math.max(x, y))
      }
    assert(base == reversed,
      s"probe-capped pair retention depends on id order: ${
        (base diff reversed).take(3)} only under original ids, ${
        (reversed diff base).take(3)} only under reversed ids")
    // non-vacuity: the cap must actually BIND (hot buckets exist) while
    // probing still contributes pairs beyond plain mode — otherwise this
    // test exercises neither arm of the orientation logic
    val plain = Similarity.cosineNearDupPairs(
      emb50, thr = 0.25, planes = planes, tables = 1, maxBucket = 1 << 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncappedProbe = Similarity.cosineNearDupPairs(
      emb50, thr = 0.25, planes = planes, tables = 1, maxBucket = 1 << 12,
      probes = math.min(4, planes))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain.subsetOf(base) && base.subsetOf(uncappedProbe),
      "capped-probe set must sit between plain and uncapped-probe")
    assert(base != plain || uncappedProbe == plain,
      "cap killed every probe pair the corpus offers — pick a cap that keeps some cold buckets")
  }

  // 40 docs replicated 50x: every prefix bucket and every chunk bucket
  // holds at least one full replica set
  private lazy val docsSmall = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text").where(col("doc_id") < 40)
  private lazy val docsSmall50 =
    ScaleBench.replicated(docsSmall, "doc_id", Factor).localCheckpoint(true)
  private def sameBase(a: Long, b: Long): Boolean = a % 1000000000L == b % 1000000000L

  test("prefix buckets grow exactly linearly under replication (rare-first order is stable)") {
    // replicas multiply every shingle's df by the factor UNIFORMLY, so the
    // global rare-first order — and therefore each doc's prefix — is
    // unchanged, and every prefix bucket is exactly 50x deeper. Superlinear
    // growth would mean replicas crossed buckets (broken determinism);
    // a changed key set would mean the df order itself shifted.
    val b1 = Dedup.setsimBucketSizes(docsSmall, 0.5, shingleK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b50 = Dedup.setsimBucketSizes(docsSmall50, 0.5, shingleK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(b1.nonEmpty && b50.keySet == b1.keySet,
      "identical replicas must land in exactly the 1x prefix-bucket keys")
    b1.foreach { case (k, n) =>
      assert(b50(k) == n * Factor, s"bucket $k: ${b50(k)} != $n * $Factor")
    }
  }

  test("prefix-join cap binds before expansion under 50x duplicate-dense replication") {
    // a cap below the replication factor saturates EVERY bucket (each
    // prefix shingle carries >= 50 byte-identical replicas) → zero pairs
    assert(Dedup.prefixJaccardJoin(docsSmall50, 0.5, shingleK = 3, maxBucket = Factor - 10)
      .count() == 0)
    // default cap at threshold 1.0: the exact join finds every replica
    // pair — 50 identical copies per base doc pair C(50,2) ways
    val pairs = Dedup.prefixJaccardJoin(docsSmall50, 1.0, shingleK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.forall(_._3 == 1.0), "threshold 1.0 admits only exact-set matches")
    val nSameBase = pairs.count(p => sameBase(p._1, p._2))
    assert(nSameBase == 40 * (Factor * (Factor - 1) / 2),
      s"every replica pair must surface exactly once; got $nSameBase")
  }

  test("cross-corpus product cap binds before expansion under 50x replication") {
    // new batch = one replica set (the base docs), corpus = the other 49:
    // every band bucket holds 1 new x 49 corpus members per base doc, so a
    // product cap below 49 must suppress every pair...
    val newB   = docsSmall50.where(col("doc_id") < 1000000000L)
    val corpus = docsSmall50.where(col("doc_id") >= 1000000000L)
    assert(Dedup.crossCorpusNearDups(newB, corpus, threshold = 1.0,
      maxBucket = Factor - 2).count() == 0,
      "a product cap below |corpus replicas| must suppress every bucket")
    // ...and with the cap open, every base doc pairs its new replica with
    // all 49 corpus replicas at jaccard 1.0 — exactly once each
    val pairs = Dedup.crossCorpusNearDups(newB, corpus, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.forall(_._3 == 1.0), "replicas are exact duplicates")
    assert(pairs.forall(p => sameBase(p._1, p._2)),
      "threshold 1.0 admits only same-base pairs on this corpus")
    val nonEmptyBase = docsSmall
      .where(size(split(col("text"), "\\s+")) > 0)
      .where(length(regexp_replace(lower(col("text")), "[^a-z]", "")) > 0)
      .count()
    assert(pairs.length.toLong == nonEmptyBase * (Factor - 1),
      s"got ${pairs.length} pairs for $nonEmptyBase tokenizable base docs x ${Factor - 1}")
  }

  test("minhash candidatesFromIndex cap binds at 50x; indexed == inline") {
    val index = Dedup.minhashIndex(docsSmall50)
    // replicas share shingles → signatures → band keys, so every band
    // bucket holds a full replica set; a cap below the factor drops all
    assert(Dedup.candidatesFromIndex(index, maxBucket = Factor - 1).count() == 0,
      "a cap below the replication factor must drop every band bucket")
    // under the default cap the index-served pairs are EXACTLY the inline
    // pairs — the amortized corpus-snapshot path may not change the result
    val indexed = Dedup.candidatesFromIndex(index)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = Dedup.minhashCandidates(docsSmall50)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(indexed.nonEmpty && indexed == inline,
      s"index-served (${indexed.size}) must equal inline (${inline.size}) at 50x")
  }

  test("wminhash index at 50x: cap binds, indexed == inline, cross-dups serve from the snapshot") {
    val widx = Dedup.wminhashIndex(docsSmall50)
    // replicas share shingles → identical ICWS draws → identical weighted
    // band keys, so every band bucket holds a full replica set
    assert(Dedup.candidatesFromIndex(widx.index, maxBucket = Factor - 1).count() == 0,
      "a cap below the replication factor must drop every weighted band bucket")
    val indexed = Dedup.candidatesFromIndex(widx.index)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = Dedup.weightedMinhashCandidates(docsSmall50)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(indexed.nonEmpty && indexed == inline,
      s"weighted index-served (${indexed.size}) must equal inline (${inline.size}) at 50x")
    // cross path: a batch of byte-identical replicas of corpus docs banded
    // with the FROZEN snapshot draws must hit their corpus twins at
    // weighted Jaccard exactly 1.0 — and the product cap must bind: with
    // maxBucket below |batch|·|corpus| per bucket nothing survives
    val batch = docsSmall50.where(col("doc_id") % lit(Factor.toLong) === 0L)
      .withColumn("doc_id", -col("doc_id") - 1L)
    val hits = Dedup.wminhashCrossDups(widx, batch, threshold = 0.99)
    val n = hits.count()
    assert(n > 0, "replica batch must cross-hit the snapshot corpus")
    assert(hits.where(col("wjaccard_r") =!= 1.0).count() == 0,
      "byte-identical replicas must verify at weighted Jaccard 1.0")
    assert(Dedup.wminhashCrossDups(widx, batch, threshold = 0.99,
      maxBucket = Factor - 1).count() == 0,
      "a product cap below |batch|x|corpus| per bucket must drop every bucket")
  }

  test("keep-best at 50x: one keeper per duplicate group, max quality wins") {
    val groups = Dedup.duplicateGroups(
      Dedup.candidatesFromIndex(Dedup.minhashIndex(docsSmall50)))
    val quality = docsSmall50.select(
      col("doc_id"), (col("doc_id") % 997L).cast("double").as("q"))
    val members = groups.join(quality, "doc_id")
      .collect()
      .map(r => (r.getLong(1), (r.getLong(0), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val kept = Dedup.keepBest(groups, quality).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(kept.nonEmpty && kept.keySet == members.keySet, "exactly one keeper per group")
    members.foreach { case (g, ms) =>
      val (keepId, bestQ, nMembers) = kept(g)
      val maxQ = ms.map(_._2).max
      val wantKeep = ms.filter(_._2 == maxQ).map(_._1).min // q ties: smallest id
      assert(bestQ == maxQ && keepId == wantKeep && nMembers == ms.length,
        s"group $g: got (keep=$keepId q=$bestQ n=$nMembers), want (keep=$wantKeep q=$maxQ n=${ms.length})")
    }
  }

  test("containment pairs at 50x replica corpus: each base contained in every replica") {
    val pairs = Dedup
      .containmentPairs(corpus = docsSmall50, queries = docsSmall, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.forall(_._3 == 1.0), "threshold 1.0 admits only full containment")
    val nonEmptyBase = docsSmall
      .where(length(regexp_replace(lower(col("text")), "[^a-z]", "")) > 0)
      .count()
    val nSameBase = pairs.count(p => sameBase(p._1, p._2))
    assert(nSameBase == nonEmptyBase * Factor,
      s"every tokenizable base doc is contained in exactly its $Factor replicas; got $nSameBase")
  }

  // media replica sets: each base's bytes repeated 50x under distinct ids —
  // every perceptual-hash band bucket then holds >= 50 members, so the
  // hot-bucket caps are the only guard against quadratic in-bucket expansion
  private def mediaReplicas(
      kind: String, bases: Seq[Long], mk: Long => Array[Byte]) = {
    import spark.implicits._
    bases.flatMap(b => (0 until Factor).map(r =>
      graft.operators.Multimodal.MediaRecord(b + r * 1000000000L, kind, mk(b), ""))).toDS()
  }

  test("image near-dup cap binds at 50x; replicas pair exactly once at hamming 0") {
    import graft.operators.Multimodal
    val imgs = mediaReplicas("image", Seq(1L, 2L, 3L), b => Multimodal.synthPng(32, 32, b))
    assert(Multimodal.imageNearDupPairs(imgs, maxBucket = Factor - 1).count() == 0,
      "a cap below the replication factor must drop every dHash band bucket")
    val pairs = Multimodal.imageNearDupPairs(imgs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val same = pairs.filter(p => sameBase(p._1, p._2))
    assert(same.length == 3 * (Factor * (Factor - 1) / 2),
      s"every replica pair exactly once; got ${same.length}")
    assert(same.forall(_._3 == 0), "byte-identical replicas hash identically")
  }

  test("audio near-dup cap binds at 50x; replicas pair exactly once at hamming 0") {
    import graft.operators.Multimodal
    val clips = mediaReplicas("audio", Seq(1L, 2L, 3L), b => Multimodal.synthWav(2000, 1000, b))
    assert(Multimodal.audioNearDupPairs(clips, maxBucket = Factor - 1).count() == 0,
      "a cap below the replication factor must drop every fingerprint band bucket")
    val pairs = Multimodal.audioNearDupPairs(clips)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val same = pairs.filter(p => sameBase(p._1, p._2))
    assert(same.length == 3 * (Factor * (Factor - 1) / 2),
      s"every replica pair exactly once; got ${same.length}")
    assert(same.forall(_._3 == 0), "byte-identical replicas fingerprint identically")
  }

  test("video near-dup cap binds at 50x; replicas share all sampled frames") {
    import graft.operators.Multimodal
    val vids = mediaReplicas("video", Seq(1L, 2L, 3L), b => Multimodal.synthGif(16, 16, 6, b))
    assert(Multimodal.videoNearDupPairs(vids, minShared = 1, maxBucket = Factor - 1).count() == 0,
      "a cap below the replication factor must drop every frame-hash bucket")
    val pairs = Multimodal.videoNearDupPairs(vids, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val same = pairs.filter(p => sameBase(p._1, p._2))
    assert(same.length == 3 * (Factor * (Factor - 1) / 2),
      s"every replica pair exactly once; got ${same.length}")
  }

  test("chunk-dedup maxDf binds before the join under 50x replication") {
    import graft.operators.Chunking
    assert(Chunking.chunkDupPairs(docsSmall50, maxDf = Factor - 10).count() == 0,
      "a chunk-frequency cap below the replication factor must suppress every pair")
    // default cap: replicas share ALL chunks → frac 1.0 same-base pairs
    // for every base doc with >= 2 distinct chunks (minShared's floor)
    val eligible = Chunking.chunkByContent(docsSmall)
      .select("doc_id", "chunk_hash").distinct()
      .groupBy("doc_id").count().where(col("count") >= 2).count()
    val pairs = Chunking.chunkDupPairs(docsSmall50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val same = pairs.filter(p => sameBase(p._1, p._2))
    assert(same.forall(_._3 == 1.0), "replica pairs share every chunk")
    assert(same.length == eligible * (Factor * (Factor - 1) / 2),
      s"got ${same.length} same-base pairs for $eligible eligible base docs")
  }
}
