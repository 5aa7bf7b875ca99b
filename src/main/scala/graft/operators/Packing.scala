package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: assign documents to
  * fixed-token-budget packs by their starting offset in a deterministic
  * concatenation order — the chunked-packing approximation every large
  * pipeline uses when exact bin packing (NP-hard, sequential) is off the
  * table.
  *
  * Scale design: a TWO-PASS DISTRIBUTED PREFIX SUM. Round 2 computed the
  * running offset with one window partitioned by `shardCol` (language,
  * source, crawl segment…) — a handful of strata at corpus scale means ONE
  * task sorts and prefix-sums an entire language's documents (tens of TB in
  * one window partition at 100×). Now the id space is cut into bounded
  * chunks (`chunk = id div chunkWidth`, so a chunk holds at most
  * `chunkWidth` docs regardless of id density):
  *
  *   pass 1  per-(shard, chunk) token subtotals — one partial-aggregated
  *           shuffle whose output is chunk METADATA (corpus_size/chunkWidth
  *           rows), then a window over those metadata rows turns subtotals
  *           into each chunk's base offset;
  *   pass 2  a window partitioned by (shard, chunk) — bounded at
  *           `chunkWidth` rows per partition — computes the local running
  *           sum, and base + local = the exact global offset.
  *
  * Chunk ids are monotonic in `idCol`, so (chunk ASC, id ASC) is exactly
  * the per-shard id order — the result is row-identical to the single
  * -window form (PackingSpec asserts it), and the DuckDB oracle keeps the
  * simple formulation. Reruns pack identically (same reproducibility
  * argument as [[Sampling]]); all arithmetic is integer-exact.
  */
object Packing {

  /** (idCol, shardCol, n_tok, pack_id): documents in `idCol` order per
    * shard, `pack_id = floor(start_offset / budget)` where start_offset is
    * the running token total of all earlier docs in the shard. A doc
    * landing on a budget boundary starts the next pack; oversized docs
    * occupy consecutive packs' id space (their tokens spill — callers
    * split or drop > budget docs upstream).
    *
    * Token counts default to the whitespace proxy over `textCol`; pass
    * `countCol` to budget by REAL tokenizer counts instead (e.g.
    * [[graft.functions.TextAnalysis.bpeEncodeDocs]]'s `n_pieces` — a
    * training-batch budget is spent in model tokens, and whitespace
    * under-counts subword-heavy text). With `countCol` set, `textCol` is
    * never touched.
    */
  /** The two-pass prefix-sum core: (idCol, shardCol, n_tok, start_off)
    * with start_off the running token total of all earlier docs in the
    * shard. [[packByOffset]] floors it into pack ids;
    * [[packByOffsetIncremental]] shifts it by a shard's already-packed
    * total first.
    */
  private def withStartOff(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shardCol: String,
      chunkWidth: Long,
      countCol: Option[String]): DataFrame = {
    require(chunkWidth > 0, s"chunkWidth ($chunkWidth) must be positive")
    val nTok = countCol
      .map(c => col(c).cast("bigint"))
      .getOrElse(size(split(col(textCol), "\\s+")).cast("bigint"))
    val withTok = docs
      .withColumn("n_tok", nTok)
      .withColumn("__chunk", floor(col(idCol) / chunkWidth).cast("bigint"))
    // pass 1: chunk subtotals (metadata-scale), then base offsets via a
    // window over CHUNK rows — ~N/chunkWidth rows per shard, never documents
    val wChunks = Window.partitionBy(col(shardCol)).orderBy(col("__chunk"))
    val bases = withTok
      .groupBy(col(shardCol), col("__chunk"))
      .agg(sum(col("n_tok")).as("__chunk_tok"))
      .withColumn("__base", sum(col("__chunk_tok")).over(wChunks) - col("__chunk_tok"))
      .select(col(shardCol), col("__chunk"), col("__base"))
    // pass 2: bounded local window (≤ chunkWidth rows per partition); the
    // chunk-base side is metadata and broadcasts
    val wLocal = Window.partitionBy(col(shardCol), col("__chunk")).orderBy(col(idCol))
    withTok
      .join(broadcast(bases), Seq(shardCol, "__chunk"))
      .withColumn("start_off", col("__base") + sum(col("n_tok")).over(wLocal) - col("n_tok"))
      .select(col(idCol), col(shardCol), col("n_tok"), col("start_off"))
  }

  def packByOffset(
      docs: DataFrame,
      budget: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      shardCol: String = "lang",
      chunkWidth: Long = 1 << 16,
      countCol: Option[String] = None): DataFrame = {
    require(budget > 0, s"budget ($budget) must be positive")
    withStartOff(docs, idCol, textCol, shardCol, chunkWidth, countCol)
      .withColumn("pack_id", floor(col("start_off") / budget).cast("bigint"))
      .select(col(idCol), col(shardCol), col("n_tok"), col("pack_id"))
  }

  /** Per-shard packed-token totals over a [[packByOffset]] assignment —
    * the metadata relation [[packByOffsetIncremental]] continues from
    * (one partial-agg pass; strata-sized output).
    */
  def packTotals(packed: DataFrame, shardCol: String = "lang"): DataFrame =
    packed.groupBy(col(shardCol)).agg(sum(col("n_tok")).as("total_tok"))

  /** INCREMENTAL packing — the [[graft.operators.Layout.shardAssignIncremental]]
    * discipline applied to pack assembly: a growing corpus must not
    * re-pack 100 TB to admit a new batch, so the batch's offsets are the
    * batch-local two-pass prefix sum SHIFTED by each shard's
    * already-packed total ([[packTotals]], a strata-sized broadcast). A
    * shard unseen in the totals starts at offset 0 (new language mid
    * -corpus). Under the append contract (batch ids sort after the packed
    * corpus's ids within each shard — the same monotone-id contract the
    * incremental index stages share), the result is ROW-IDENTICAL to
    * re-running [[packByOffset]] over the full union and keeping the
    * batch rows: PackingSpec pins that equivalence, and the boundary pack
    * (a shard's last partially-filled pack) keeps filling before a new
    * pack opens — no fragmentation cost for incrementality.
    */
  def packByOffsetIncremental(
      totals: DataFrame,
      newDocs: DataFrame,
      budget: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      shardCol: String = "lang",
      chunkWidth: Long = 1 << 16,
      countCol: Option[String] = None): DataFrame = {
    require(budget > 0, s"budget ($budget) must be positive")
    withStartOff(newDocs, idCol, textCol, shardCol, chunkWidth, countCol)
      .join(broadcast(totals.select(col(shardCol), col("total_tok"))),
        Seq(shardCol), "left_outer")
      .withColumn("pack_id",
        floor((col("start_off") + coalesce(col("total_tok"), lit(0L))) / budget)
          .cast("bigint"))
      .select(col(idCol), col(shardCol), col("n_tok"), col("pack_id"))
  }

  /** Pack MANIFESTS from a [[packByOffset]] assignment: one row per
    * (shard, pack) with the member doc ids in concatenation order and the
    * pack's token total — what the downstream batch writer actually
    * consumes. One aggregation keyed by (shard, pack_id); a pack holds at
    * most `budget` tokens' worth of docs (+1 boundary doc), so per-group
    * state is budget-bounded regardless of corpus size.
    */
  def packContents(packed: DataFrame, idCol: String = "doc_id", shardCol: String = "lang"): DataFrame =
    packed
      .groupBy(col(shardCol), col("pack_id"))
      .agg(
        sort_array(collect_list(col(idCol))).as("doc_ids"),
        sum(col("n_tok")).as("pack_tokens"),
        count(lit(1)).as("n_docs"))

  /** Length-bucketed batch assembly: group documents of similar token
    * length into fixed-count training batches and report each batch's
    * PADDING WASTE — the token cost of batching unequal-length sequences
    * (every sequence pads to its batch's max). Bucketing by length first
    * is the standard mitigation: batches draw from one length band, so
    * the pad fraction collapses versus random batching.
    *
    * `boundaries` (ASC) cut the length axis: bucket = #boundaries ≤ n_tok
    * (map-side against a literal array). Within a bucket, docs take their
    * deterministic `idCol`-order rank and `batch_id = rank div batchSize`
    * — reruns batch identically.
    *
    * Scale: the in-bucket rank is the same TWO-PASS CHUNKED PREFIX form
    * as [[packByOffset]] (a handful of buckets would otherwise funnel the
    * corpus into a handful of window partitions): per-(bucket, chunk)
    * COUNTS roll into chunk-base ranks over metadata rows, a bounded
    * (bucket, chunk) window adds the local row_number, and the final
    * per-batch aggregate is an ordinary partial-agg groupBy. PackingSpec
    * pins row-identity with the single-window form.
    *
    * Returns (bucket, batch_id, n_docs, max_tok, sum_tok, pad_tok) where
    * pad_tok = n_docs·max_tok − sum_tok.
    */
  def lengthBucketBatches(
      docs: DataFrame,
      batchSize: Int,
      boundaries: Seq[Int] = Seq(8, 16, 32, 64, 128),
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkWidth: Long = 1 << 16): DataFrame = {
    require(batchSize > 0, s"batchSize ($batchSize) must be positive")
    require(boundaries.nonEmpty && boundaries == boundaries.sorted,
      s"boundaries ($boundaries) must be non-empty ascending")
    val bArr = array(boundaries.map(lit): _*)
    val withTok = docs
      .withColumn("n_tok", size(split(col(textCol), "\\s+")).cast("bigint"))
      .withColumn("bucket", size(filter(bArr, b => b <= col("n_tok"))))
      .withColumn("__chunk", floor(col(idCol) / chunkWidth).cast("bigint"))
    val wChunks = Window.partitionBy(col("bucket")).orderBy(col("__chunk"))
    val bases = withTok
      .groupBy(col("bucket"), col("__chunk"))
      .agg(count(lit(1)).as("__chunk_n"))
      .withColumn("__base", sum(col("__chunk_n")).over(wChunks) - col("__chunk_n"))
      .select(col("bucket"), col("__chunk"), col("__base"))
    val wLocal = Window.partitionBy(col("bucket"), col("__chunk")).orderBy(col(idCol))
    withTok
      .join(broadcast(bases), Seq("bucket", "__chunk"))
      .withColumn("__rank0", col("__base") + row_number().over(wLocal) - 1)
      .withColumn("batch_id", floor(col("__rank0") / batchSize).cast("bigint"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("n_tok")).as("max_tok"),
        sum(col("n_tok")).as("sum_tok"))
      .withColumn("pad_tok", col("n_docs") * col("max_tok") - col("sum_tok"))
  }
}
