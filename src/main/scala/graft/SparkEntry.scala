package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{InvertedIndex, Tokenize}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query: full inverted index over the sf0.001 documents table,
    * ranked (letter ASC, df DESC, word ASC). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = t(spark, "/root/testdata/sf0.001", "documents")
    InvertedIndex.rankedGlobal(
      InvertedIndex.postings(Tokenize.tokens(docs, "text", Seq("doc_id"))))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map()
}
