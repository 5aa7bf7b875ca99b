package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.{InvertedIndex, Tokenize}

/** Incremental maintenance must be indistinguishable from rebuilding. */
class IndexMaintenanceSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def snap(df: DataFrame) = df
    .select("word", "doc_ids", "df", "letter")
    .orderBy("word")
    .collect()
    .map(r => (r.getString(0), r.getSeq[Long](1), r.getInt(2), r.getString(3)))
    .toSeq

  private def index(d: DataFrame) = Engine.indexFromTable(d)

  test("merge(index(A), index(B)) == index(A union B), overlapping docs included") {
    val a = docs.where(col("doc_id") < 300)
    val b = docs.where(col("doc_id") >= 250) // overlap [250, 300)
    val merged  = InvertedIndex.mergeIndexes(index(a), index(b))
    val rebuilt = index(docs)
    assert(snap(merged) == snap(rebuilt))
  }

  test("remove(index(A), D) == index(A minus D)") {
    val d       = Seq(3L, 7L, 450L)
    val removed = InvertedIndex.removeDocs(index(docs), d)
    val rebuilt = index(docs.where(!col("doc_id").isin(d: _*)))
    assert(snap(removed) == snap(rebuilt))
  }

  test("removing every doc of a word drops the word") {
    import spark.implicits._
    val tiny = Seq((1L, "unique token"), (2L, "token shared")).toDF("doc_id", "text")
    val left = InvertedIndex.removeDocs(index(tiny), Seq(1L))
    val words = left.select("word").collect().map(_.getString(0)).sorted.toSeq
    assert(words == Seq("shared", "token"))
  }
}
