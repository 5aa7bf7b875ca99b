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
  * Scale design: packing is PER SHARD (`shardCol` — language, source,
  * crawl segment…): the running-offset window partitions by shard, so no
  * global single-task sort exists and shards pack independently in
  * parallel. Within a shard, order is the stable `idCol` — reruns pack
  * identically (the same reproducibility argument as
  * [[Sampling]]). All arithmetic is integer, so the DuckDB oracle
  * reproduces pack ids exactly.
  */
object Packing {

  /** (idCol, shardCol, n_tok, pack_id): documents in `idCol` order per
    * shard, `pack_id = floor(start_offset / budget)` where start_offset is
    * the running token total of all earlier docs in the shard. A doc
    * landing on a budget boundary starts the next pack; oversized docs
    * occupy consecutive packs' id space (their tokens spill — callers
    * split or drop > budget docs upstream).
    */
  def packByOffset(
      docs: DataFrame,
      budget: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      shardCol: String = "lang"): DataFrame = {
    require(budget > 0, s"budget ($budget) must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    docs
      .withColumn("n_tok", size(split(col(textCol), "\\s+")).cast("bigint"))
      .withColumn("start_off", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("pack_id", floor(col("start_off") / budget).cast("bigint"))
      .select(col(idCol), col(shardCol), col("n_tok"), col("pack_id"))
  }
}
