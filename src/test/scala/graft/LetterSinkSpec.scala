package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{InvertedIndex, Tokenize}
import graft.sources.LetterSink

/** The distributed letter sink must produce a letter-partitioned layout that
  * supports partition pruning on read — the at-scale path where exact
  * filenames stop mattering and parallel IO + pruning start mattering.
  */
class LetterSinkSpec extends SparkSpec {

  test("writePartitioned emits letter=* dirs and reads back with partition pruning") {
    val postings = InvertedIndex.postings(
      Tokenize.tokens(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text", Seq("doc_id")))
    val out = Files.createTempDirectory("graft-partsink").toString
    LetterSink.writePartitioned(postings, out)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("letter=")))

    val back = spark.read.text(out) // partition column `letter` inferred from layout
    val one  = back.where(col("letter") === "s")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("letter"),
      s"expected letter partition pruning in:\n$plan")
    // pruned read returns exactly the s-bucket lines, formatted word:[ids]
    val lines = one.select("value").collect().map(_.getString(0))
    assert(lines.nonEmpty && lines.forall(_.matches("[a-z]+:\\[[0-9 ]+\\]")))
    assert(lines.forall(_.startsWith("s")))
  }
}
