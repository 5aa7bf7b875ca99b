package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document's token stream into
  * fixed-size, optionally-overlapping windows — the step between cleaning
  * and tokenizer in every pretraining pipeline that trains on long
  * documents (a 100k-token doc becomes ~3k training windows; RAG ingestion
  * uses the same op with smaller windows).
  *
  * Scale design: pure map-side row expansion — `sequence` generates the
  * chunk starts, `posexplode` turns them into rows, `slice` cuts each
  * window out of the per-doc token array. No shuffle, no window function,
  * no state: the operator is embarrassingly parallel and its output size
  * is input_tokens × (size/stride) regardless of document skew (one
  * pathological 1 GB document expands inside its own task).
  */
object Chunking {

  /** Chunk rows (idCol, chunk_id, n_chunk, chunk) for every document:
    * windows of `size` tokens starting every `stride` tokens (stride <
    * size ⇒ overlapping windows, the common pretraining setting; stride ==
    * size ⇒ exact partition). Starts are 0, stride, 2·stride, … strictly
    * below the token count, so the tail window may be short and an
    * empty-token document yields no chunks.
    */
  def chunkTokens(
      docs: DataFrame,
      size: Int = 32,
      stride: Int = 24,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(size > 0, s"size ($size) must be positive")
    require(stride > 0, s"stride ($stride) must be positive")
    val toks = Tokenize.tokenArray(col(textCol))
    docs
      .select(col(idCol), toks.as("__toks"))
      .withColumn("__n", size_(col("__toks")))
      .withColumn(
        "__starts",
        when(col("__n") === 0, array().cast("array<int>"))
          .otherwise(sequence(lit(0), col("__n") - 1, lit(stride))))
      .select(col(idCol), col("__toks"), posexplode(col("__starts")).as(Seq("chunk_id", "__s")))
      .select(
        col(idCol),
        col("chunk_id"),
        slice(col("__toks"), col("__s") + 1, lit(size)).as("chunk"))
      .withColumn("n_chunk", size_(col("chunk")))
  }

  // functions.size shadowed by the `size` parameter above
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)
}
