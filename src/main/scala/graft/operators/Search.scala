package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query-side of the inverted index: the reference only BUILDS the index
  * (reference src/main.cpp — no query path exists); any consumer's next step
  * is boolean retrieval over it. These operators run on the postings
  * relation (word, doc_ids, df, letter) produced by [[InvertedIndex]].
  *
  * Scale design: the `word IN (...)` filter prunes the postings scan to the
  * query terms (predicate pushdown on the word column); the explode+groupBy
  * touches only the matched posting lists, never the whole index.
  */
object Search {

  /** Documents containing ALL query words (conjunctive boolean retrieval),
    * with terms cleaned by the reference tokenizer first. Returns
    * (doc_id) rows, ascending.
    */
  def andQuery(postings: DataFrame, words: Seq[String]): DataFrame = {
    val terms = cleanedTerms(words)
    postings
      .where(col("word").isin(terms: _*))
      .select(col("word"), explode(col("doc_ids")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("word")).as("n_terms"))
      .where(col("n_terms") === terms.size)
      .select(col("doc_id"))
      .orderBy("doc_id")
  }

  /** Documents containing ANY query word, with the number of distinct query
    * words matched (disjunctive retrieval + a trivial relevance signal).
    * Returns (doc_id, n_terms) ordered by n_terms DESC, doc_id ASC.
    */
  def orQuery(postings: DataFrame, words: Seq[String]): DataFrame = {
    val terms = cleanedTerms(words)
    postings
      .where(col("word").isin(terms: _*))
      .select(col("word"), explode(col("doc_ids")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("word")).as("n_terms"))
      .orderBy(desc("n_terms"), asc("doc_id"))
  }

  /** Apply the reference tokenizer to the query terms themselves, so
    * "Well-Known" matches the indexed "wellknown"; empty-cleaning terms are
    * dropped (they can match nothing).
    */
  private def cleanedTerms(words: Seq[String]): Seq[String] =
    words
      .map(w => new String(w.getBytes("UTF-8").flatMap { b =>
        val lower = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        if (lower >= 'a' && lower <= 'z') Some(lower) else None
      }, "UTF-8"))
      .filter(_.nonEmpty)
      .distinct
}
