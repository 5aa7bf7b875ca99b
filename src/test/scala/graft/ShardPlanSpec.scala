package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Pins [[Layout.shardPlan]] / [[Layout.shardManifest]] — the deterministic
  * corpus shuffle + token-balanced shard assignment a training data loader
  * consumes — and the [[Layout.globalRank]] primitive beneath them.
  */
class ShardPlanSpec extends SparkSpec {
  import spark.implicits._

  // 400 docs with token counts 1..400 (doc i repeats a word i times) — a
  // linear size ramp is the adversarial load for doc-count balancing and
  // exactly what the snake rule must equalize by tokens
  private lazy val docs = spark.range(1, 401)
    .select(col("id").as("doc_id"),
      expr("array_join(transform(sequence(1, int(id)), x -> 'w'), ' ')").as("text"))

  test("globalRank equals the single-partition row_number on a total order") {
    val ranked = Layout.globalRank(
      docs.select(col("doc_id"), length(col("text")).as("len")),
      Seq(col("len").desc, col("doc_id").asc), numRange = 7, outCol = "rank")
    val got = ranked.orderBy("rank").select("doc_id").as[Long].collect()
    // len desc is token count desc → doc 400 first, 1 last
    assert(got.toSeq == (400L to 1L by -1L), s"rank order broken: ${got.take(5).toSeq}…")
  }

  test("shard plan is total, rerun-identical, and token-balanced") {
    val n = 8
    val plan = Layout.shardPlan(docs, nShards = n).cache()
    // totality: one row per doc
    assert(plan.count() == 400 && plan.select("doc_id").distinct().count() == 400)
    // determinism: a second independent plan is row-identical
    val again = Layout.shardPlan(docs, nShards = n)
    assert(plan.exceptAll(again).isEmpty && again.exceptAll(plan).isEmpty,
      "shard plan must be a pure function of the corpus")
    // token balance: the snake rule bounds max-min by one doc per N-band;
    // with the 1..400 ramp at N=8 totals must sit within 1% of each other
    val totals = plan.groupBy("shard").agg(sum("n_tokens").as("t"))
      .select("t").as[Long].collect()
    assert(totals.length == n)
    assert(totals.max - totals.min <= totals.min / 100 + n,
      s"snake balance violated: ${totals.toSeq.sorted}")
    // within-shard pos is dense 1..count
    val posOk = plan.groupBy("shard")
      .agg(count(lit(1)).as("c"), min("pos").as("mn"), max("pos").as("mx"))
      .where(col("mn") =!= 1L || col("mx") =!= col("c")).count()
    assert(posOk == 0, "pos must be dense 1..count per shard")
    plan.unpersist()
  }

  test("manifest totals reconcile with the plan") {
    val plan = Layout.shardPlan(docs, nShards = 4)
    val m = Layout.shardManifest(plan).collect()
    assert(m.map(_.getLong(1)).sum == 400)
    assert(m.map(_.getLong(2)).sum == (1L to 400L).sum)
  }

  test("shardPlanByCount shards string-keyed units by a precomputed size column") {
    val units = Seq(("en:0", 100L), ("en:1", 90L), ("de:0", 80L), ("de:1", 70L))
      .toDF("unit_id", "n")
    val plan = Layout.shardPlanByCount(units, nShards = 2, idCol = "unit_id", countCol = "n")
    assert(plan.count() == 4 && plan.select("shard").distinct().count() == 2)
    // snake over (100,90,80,70): ranks 1..4 -> shards 0,1,1,0 -> totals 170/170
    val totals = plan.groupBy("shard").agg(sum("n_tokens").as("t"))
      .select("t").as[Long].collect().sorted
    assert(totals.toSeq == Seq(170L, 170L), s"snake totals: ${totals.toSeq}")
  }

  test("incremental assignment: biggest new doc lands on the lightest shard, no re-shard") {
    val manifest = Layout.shardManifest(Layout.shardPlan(docs, nShards = 4))
    val lightest = manifest.orderBy(col("n_tokens").asc, col("shard").asc)
      .select("shard").as[Long].first()
    val fresh = spark.range(1000, 1020)
      .select(col("id").as("doc_id"),
        expr("array_join(transform(sequence(1, int(id - 900)), x -> 'w'), ' ')").as("text"))
    val got = Layout.shardAssignIncremental(manifest, fresh).cache()
    assert(got.count() == 20 && got.select("doc_id").distinct().count() == 20)
    // rank-1 new doc (the biggest, id 1019) must land on the lightest shard
    val big = got.orderBy(col("n_tokens").desc).select("shard").as[Long].first()
    assert(big == lightest, s"biggest new doc on shard $big, lightest is $lightest")
    // deterministic
    val again = Layout.shardAssignIncremental(manifest, fresh)
    assert(got.exceptAll(again).isEmpty && again.exceptAll(got).isEmpty)
    got.unpersist()
  }

  test("shardWrite: one file per shard, lossless, rows in pos order") {
    val n = 8
    val out = java.nio.file.Files.createTempDirectory("graft-shard-write").toString
    val back = Layout.shardWrite(spark, docs, nShards = n, out)
    // one parquet data file per shard directory
    val root = new java.io.File(out)
    val shardDirs = root.listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == n, s"expected $n shard dirs, got ${shardDirs.length}")
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: expected exactly one file, got ${files.length}")
    }
    // lossless: read-back == docs ⋈ plan
    assert(back.count() == 400 &&
      back.select("doc_id").distinct().count() == 400)
    val plan = Layout.shardPlan(docs, nShards = n)
    // no caller-side cast: shardWrite itself restores the plan's long type
    // after partition-column inference (the stated invariant holds naively)
    val mismatch = back.select(col("doc_id"), col("shard"), col("pos"))
      .exceptAll(plan.select(col("doc_id"), col("shard"), col("pos")))
    assert(mismatch.isEmpty, "read-back assignment must equal the plan")
    // in-file order: each shard file read alone yields ascending pos
    shardDirs.foreach { d =>
      val pos = spark.read.parquet(d.toString).select("pos").as[Long].collect()
      assert(pos.toSeq == pos.sorted.toSeq, s"${d.getName} not in pos order")
    }
  }

  test("shardWriteIncremental: delta segments append; existing files byte-untouched") {
    val n = 4
    val out = java.nio.file.Files.createTempDirectory("graft-shard-incr").toString
    Layout.shardWrite(spark, docs, nShards = n, out)
    val manifest = Layout.shardManifest(Layout.shardPlan(docs, nShards = n))
    // snapshot every base file: (path -> (size, first/last byte checksum))
    def snap(): Map[String, (Long, Int)] = {
      val b = scala.collection.mutable.Map.empty[String, (Long, Int)]
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) f.listFiles().foreach(walk)
        else if (f.getName.endsWith(".parquet")) {
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          b(f.getPath) = (bytes.length.toLong, java.util.Arrays.hashCode(bytes))
        }
      walk(new java.io.File(out)); b.toMap
    }
    val before = snap()
    val fresh = spark.range(1000, 1040)
      .select(col("id").as("doc_id"),
        expr("array_join(transform(sequence(1, int(id - 900)), x -> 'w'), ' ')").as("text"))
    val back = Layout.shardWriteIncremental(spark, manifest, fresh, out)
    // append-only: every pre-existing file survives bit-identical
    val after = snap()
    before.foreach { case (p, sig) =>
      assert(after.get(p).contains(sig), s"base file rewritten: $p")
    }
    // one NEW delta file per receiving shard
    val planned = Layout.shardAssignPos(manifest, fresh).cache()
    val receiving = planned.select("shard").distinct().as[Long].collect().toSet
    val newFiles = after.keySet -- before.keySet
    val newByShard = newFiles.groupBy(p =>
      "shard=(\\d+)".r.findFirstMatchIn(p).get.group(1).toLong)
    assert(newByShard.keySet == receiving,
      s"delta files in ${newByShard.keySet}, assignments to $receiving")
    newByShard.foreach { case (s, fs) =>
      assert(fs.size == 1, s"shard $s: expected one delta segment, got ${fs.size}")
    }
    // read-back == base plan ∪ batch assignment (shard already long)
    val want = Layout.shardPlan(docs, nShards = n)
      .select(col("doc_id"), col("shard"), col("pos"))
      .unionByName(planned.select(col("doc_id"), col("shard"), col("pos")))
    val got = back.select(col("doc_id"), col("shard"), col("pos"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "whole-table read-back must equal base plan ∪ batch assignment")
    // pos stays dense 1..count per shard ACROSS segments
    val posOk = got.groupBy("shard")
      .agg(count(lit(1)).as("c"), min("pos").as("mn"), max("pos").as("mx"))
      .where(col("mn") =!= 1L || col("mx") =!= col("c")).count()
    assert(posOk == 0, "pos must stay dense across base + delta segments")
    // each delta segment file alone reads in ascending pos
    newFiles.foreach { p =>
      val pos = spark.read.parquet(p).select("pos").as[Long].collect()
      assert(pos.toSeq == pos.sorted.toSeq, s"delta $p not in pos order")
    }
    planned.unpersist()
  }

  test("epoch reorder: membership frozen, pos dense, epochs decorrelated, rerun-identical") {
    val plan = Layout.shardPlan(docs, nShards = 4).cache()
    val e1 = Layout.epochOrderWithinShards(plan, epoch = 1).cache()
    // membership frozen: every doc keeps its shard, only pos moves
    assert(e1.select("doc_id", "shard").exceptAll(plan.select("doc_id", "shard")).isEmpty,
      "an epoch must not move docs between shards (files are immutable)")
    // pos dense 1..count per shard
    val posOk = e1.groupBy("shard")
      .agg(count(lit(1)).as("c"), min("pos").as("mn"), max("pos").as("mx"))
      .where(col("mn") =!= 1L || col("mx") =!= col("c")).count()
    assert(posOk == 0, "epoch pos must be dense 1..count per shard")
    // different epochs produce different within-shard orders (md5 salt)
    val e2 = Layout.epochOrderWithinShards(plan, epoch = 2)
    val moved = e1.select(col("doc_id"), col("pos").as("p1"))
      .join(e2.select(col("doc_id"), col("pos").as("p2")), Seq("doc_id"))
      .where(col("p1") =!= col("p2")).count()
    assert(moved > 300, s"epochs must be decorrelated; only $moved of 400 moved")
    // deterministic
    val again = Layout.epochOrderWithinShards(plan, epoch = 1)
    assert(e1.exceptAll(again).isEmpty && again.exceptAll(e1).isEmpty)
    e1.unpersist(); plan.unpersist()
  }

  test("epoch shard visit order: a permutation of the manifest per epoch") {
    val man = Layout.shardManifest(Layout.shardPlan(docs, nShards = 8))
    val v = Layout.epochShardVisit(man, epochs = 3).cache()
    assert(v.count() == 24)
    // each epoch's visit column is a permutation 1..8 of all 8 shards
    val perm = v.groupBy("epoch")
      .agg(countDistinct("shard").as("s"), min("visit").as("mn"),
        max("visit").as("mx"), count(lit(1)).as("c"))
      .where(col("s") =!= 8L || col("mn") =!= 1L || col("mx") =!= 8L || col("c") =!= 8L)
      .count()
    assert(perm == 0, "each epoch must visit every shard exactly once, ranks 1..8")
    // at least two epochs disagree on the order
    val orders = v.orderBy("epoch", "visit").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    assert(orders.values.toSet.size > 1, s"epoch permutations all identical: $orders")
    v.unpersist()
  }

  test("shardManifestFold == full shardManifest recompute over the union") {
    val n = 4
    val plan = Layout.shardPlan(docs, nShards = n)
    val manifest = Layout.shardManifest(plan)
    val fresh = spark.range(2000, 2030)
      .select(col("id").as("doc_id"),
        expr("array_join(transform(sequence(1, int(id - 1900)), x -> 'w'), ' ')").as("text"))
    val assigned = Layout.shardAssignIncremental(manifest, fresh)
    val folded = Layout.shardManifestFold(manifest, assigned)
    val recomputed = Layout.shardManifest(
      plan.select(col("doc_id"), col("n_tokens"), col("shard"))
        .unionByName(assigned.select(col("doc_id"), col("n_tokens"), col("shard"))))
    assert(folded.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(folded).isEmpty,
      "metadata fold must be bit-identical to the full recompute")
    // repeated fold stays consistent: a second batch against the FOLDED
    // manifest continues pos densely (the loader contract across batches)
    val fresh2 = spark.range(3000, 3010)
      .select(col("id").as("doc_id"), lit("w w w").as("text"))
    val pos2 = Layout.shardAssignPos(folded, fresh2)
    val joined = pos2.select(col("shard"), col("pos"))
      .join(folded.select(col("shard"), col("n_docs")), Seq("shard"))
      .where(col("pos") <= col("n_docs")).count()
    assert(joined == 0, "second-batch pos must start past the folded n_docs")
  }
}
