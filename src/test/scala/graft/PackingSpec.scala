package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Packing

/** The two-pass distributed prefix sum must be row-identical to the naive
  * single-window form, and its plan must never put a whole shard into one
  * window partition (the round-2 scale weakness).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 200L)
    .map(i => (i, if (i % 3 == 0) "en" else "de", Seq.fill((i % 7).toInt + 1)("tok").mkString(" ")))
    .toDF("doc_id", "lang", "text")

  /** The round-2 formulation: one window per shard — correct, not scalable. */
  private def naive(budget: Long) = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    docs
      .withColumn("n_tok", size(split(col("text"), "\\s+")).cast("bigint"))
      .withColumn("start_off", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("pack_id", floor(col("start_off") / budget).cast("bigint"))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("pack_id"))
  }

  test("chunked prefix sum is row-identical to the single-window form") {
    val expected = naive(16).collect().map(_.toSeq).toSet
    for (width <- Seq(1L, 7L, 64L, 1L << 16)) {
      val got = Packing.packByOffset(docs, budget = 16, chunkWidth = width)
        .collect().map(_.toSeq).toSet
      assert(got == expected, s"chunkWidth=$width diverges from the single-window packing")
    }
  }

  test("incremental packing == full repack's batch rows under the append contract") {
    val base  = docs.where(col("doc_id") <= 150)
    val batch = docs.where(col("doc_id") > 150)
    val got = Packing.packByOffsetIncremental(
      Packing.packTotals(Packing.packByOffset(base, budget = 16)),
      batch, budget = 16)
      .collect().map(_.toSeq).toSet
    val full = Packing.packByOffset(docs, budget = 16)
      .where(col("doc_id") > 150)
      .collect().map(_.toSeq).toSet
    assert(got == full,
      "batch packed against totals must equal the full repack restricted to batch rows")
    // the boundary pack keeps filling: the batch's first pack id per lang
    // equals the base's last pack id per lang unless the base total landed
    // exactly on a budget boundary — check at least one lang continues
    val baseLast = Packing.packByOffset(base, budget = 16)
      .groupBy("lang").agg(max("pack_id").as("last")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchFirst = Packing.packByOffsetIncremental(
      Packing.packTotals(Packing.packByOffset(base, budget = 16)),
      batch, budget = 16)
      .groupBy("lang").agg(min("pack_id").as("first")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batchFirst.exists { case (l, f) => baseLast.get(l).contains(f) },
      s"no boundary pack continued filling: base last $baseLast, batch first $batchFirst")
  }

  test("a shard unseen in the totals starts packing at offset 0") {
    val base = docs.where(col("lang") === "de")
    val batch = Seq((1000L, "fr", "tok tok tok")).toDF("doc_id", "lang", "text")
    val got = Packing.packByOffsetIncremental(
      Packing.packTotals(Packing.packByOffset(base, budget = 16)),
      batch, budget = 16).collect()
    assert(got.length == 1 && got(0).getLong(3) == 0L,
      s"new lang must open pack 0, got ${got.toSeq}")
  }

  test("length-bucket batches: chunked rank == single-window form; waste arithmetic") {
    val boundaries = Seq(2, 4, 6)
    val single = {
      val bArr = array(boundaries.map(lit): _*)
      val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      docs
        .withColumn("n_tok", size(split(col("text"), "\\s+")).cast("bigint"))
        .withColumn("bucket", size(filter(bArr, b => b <= col("n_tok"))))
        .withColumn("batch_id", floor((row_number().over(w) - 1) / 5).cast("bigint"))
        .groupBy(col("bucket"), col("batch_id"))
        .agg(count(lit(1)).as("n_docs"), max(col("n_tok")).as("max_tok"),
          sum(col("n_tok")).as("sum_tok"))
        .withColumn("pad_tok", col("n_docs") * col("max_tok") - col("sum_tok"))
        .collect().map(_.toSeq).toSet
    }
    for (width <- Seq(1L, 7L, 64L, 1L << 16)) {
      val got = Packing.lengthBucketBatches(docs, batchSize = 5,
        boundaries = boundaries, chunkWidth = width)
      assert(got.collect().map(_.toSeq).toSet == single,
        s"chunkWidth=$width diverges from the single-window batching")
    }
    // full batches really hold batchSize docs; waste is non-negative and
    // zero for any batch whose members all share one length
    val rows = Packing.lengthBucketBatches(docs, batchSize = 5, boundaries = boundaries)
      .collect()
    assert(rows.forall(_.getLong(5) >= 0))
    assert(rows.map(_.getLong(2)).max == 5)
  }

  test("the document-side window partitions by (shard, chunk), never shard alone") {
    val plan = Packing.packByOffset(docs, budget = 16, chunkWidth = 8)
      .queryExecution.executedPlan.toString
    val docWindows = plan.linesIterator.filter(l => l.contains("Window") && l.contains("n_tok"))
    assert(docWindows.nonEmpty, s"expected a document-side Window node in:\n$plan")
    assert(docWindows.forall(_.contains("__chunk")),
      "the running-sum window over documents must include __chunk in its partition spec")
  }
}
