package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction: the reduce + sort phases of the reference
  * (O7–O10, reference src/main.cpp:172-236), expressed as a declarative plan so
  * Catalyst plans partial+final hash aggregation with map-side combine —
  * the reference's per-file queues + 26 letter mutexes become one shuffle
  * hash-partitioned by `word`.
  *
  * Determinism note (SURVEY §4 trap): `collect_set` order is nondeterministic,
  * so every surfaced posting list is wrapped in `sort_array`, and the ranking
  * sort key (df DESC, word ASC) is total per letter (words are distinct after
  * grouping). This is what makes output reproducible and oracle-comparable.
  */
object InvertedIndex {

  /** (word, doc_id) token pairs → postings:
    * word, doc_ids (sorted distinct ASC), df (document frequency), letter.
    * Duplicate (word, doc_id) pairs collapse (reference src/main.cpp:188-191).
    */
  def postings(tokens: DataFrame, idCol: String = "doc_id"): DataFrame =
    tokens
      .groupBy("word")
      .agg(sort_array(collect_set(col(idCol))).as("doc_ids"))
      .withColumn("df", size(col("doc_ids")))
      .withColumn("letter", substring(col("word"), 1, 1))

  /** Rank postings within each letter bucket by df DESC, word ASC
    * (reference comparator src/main.cpp:225-231). Returns a DataFrame whose
    * partitioning is 26-way by letter with rows sorted inside each bucket —
    * the distributed analogue of the reference's per-letter sort stage.
    */
  def rankedWithinLetters(postings: DataFrame): DataFrame =
    postings
      .repartition(26, col("letter"))
      .sortWithinPartitions(col("letter"), desc("df"), asc("word"))

  /** Globally-ordered ranking (letter ASC, df DESC, word ASC) — the oracle-
    * comparable total order over the whole index.
    */
  def rankedGlobal(postings: DataFrame): DataFrame =
    postings.orderBy(asc("letter"), desc("df"), asc("word"))

  /** Hot-key-safe postings for the 100 TB regime: a stop word's posting list
    * at web scale is billions of ids — too big for one reducer's collect_set
    * buffer. Shard the aggregation by doc-id range (`shard = doc_id div
    * shardWidth`), build sorted per-shard lists, then reassemble per word by
    * flattening shards in shard order — which preserves global ascending
    * order exactly because shards partition the id space monotonically.
    * Result is IDENTICAL to [[postings]] (asserted in PostingsSpec); the
    * difference is that no single task ever materializes a whole hot word.
    */
  def postingsSharded(tokens: DataFrame, idCol: String = "doc_id", shardWidth: Long = 1000000L): DataFrame =
    tokens
      .withColumn("__shard", (col(idCol) / shardWidth).cast("long"))
      .groupBy(col("word"), col("__shard"))
      .agg(sort_array(collect_set(col(idCol))).as("__ids"))
      .groupBy("word")
      .agg(flatten(array_sort(collect_list(struct(col("__shard"), col("__ids")))).getField("__ids")).as("doc_ids"))
      .withColumn("df", size(col("doc_ids")))
      .withColumn("letter", substring(col("word"), 1, 1))
}
