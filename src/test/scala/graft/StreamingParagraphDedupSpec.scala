package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Dedup
import graft.streaming.{DocStream, EventStream}

/** Pins the streaming paragraph-dedup twin ([[DocStream.paragraphVerdicts]])
  * against the batch operator ([[Dedup.paragraphDedup]]) on the planted
  * paragraph corpus, INCLUDING a cross-batch duplicate: the keeper arrives
  * in file/batch 1 and a later occurrence of the same paragraph arrives in
  * batch 2 — the verdict must come from keyed STATE, not batch-local data.
  */
class StreamingParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private def word(prefix: String, i: Int): String =
    prefix + ('a' + i / 26).toChar + ('a' + i % 26).toChar

  private lazy val parA      = (0 until 20).map(word("aaa", _))
  private lazy val parShared = (0 until 20).map(word("sha", _))
  private lazy val parB      = (0 until 20).map(word("bbb", _))
  private lazy val parD      = (0 until 20).map(word("ddd", _))

  // batch 1: docs 1-2 (keeper of the shared paragraph is doc 1)
  private lazy val wave1 = Seq(
    (1L, (parA ++ parShared).mkString(" ")),
    (2L, (parB ++ parShared).mkString(" ")))
  // batch 2: doc 3 re-carries the shared paragraph (cross-batch dup) and
  // doc 4 self-repeats parD (within-batch dup)
  private lazy val wave2 = Seq(
    (3L, (parShared ++ parD).mkString(" ")),
    (4L, (parD ++ parD).mkString(" ")))

  private def stage(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-par-stream")
    def writeOne(rows: Seq[(Long, String)], name: String, ts: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-par-wave")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.endsWith(".crc")).head
      val dst = dir.resolve(name)
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), dst)
      // file-source order is by modification time: pin it explicitly
      java.nio.file.Files.setLastModifiedTime(
        dst, java.nio.file.attribute.FileTime.fromMillis(ts))
    }
    writeOne(wave1, "a.parquet", 1000000000000L)
    writeOne(wave2, "b.parquet", 1000000060000L)
    dir.toString
  }

  test("streaming verdicts == batch paragraphDedup, keeper state crossing batches") {
    val dir = stage()
    val sch = "doc_id LONG, text STRING"
    val stream = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    EventStream.runToMemory(
      DocStream.paragraphVerdicts(spark, stream).toDF(), "par_stream",
      OutputMode.Update())
    val got = spark.table("par_stream")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pars"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("dup_pars"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = Dedup.paragraphDedup((wave1 ++ wave2).toDF("doc_id", "text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq,
      s"streaming != batch: got ${got.toSeq}, want ${want.toSeq}")
    // the cross-batch dup specifically: doc 3's shared paragraph must be
    // flagged against batch-1 state
    val d3 = spark.table("par_stream")
      .where(col("doc_id") === 3L && col("par_idx") === 0).collect()
    assert(d3.length == 1 && d3(0).getBoolean(2),
      s"doc 3 par 0 must be a dup via cross-batch state, got ${d3.toSeq}")
  }

  test("out-of-order ingest: a later-arriving LOWER okey does not unseat the keeper") {
    // doc 10 arrives first and keeps the shared paragraph; doc 5 (lower
    // okey) arrives in a later batch — arrival-order semantics demand it
    // be judged a DUP against the pre-update state (the pre-fix min-okey
    // refresh emitted a second keeper verdict here, retaining the
    // paragraph twice downstream)
    val dir = java.nio.file.Files.createTempDirectory("graft-par-ooo")
    def writeOne(rows: Seq[(Long, String)], name: String, ts: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-par-ooo-w")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.endsWith(".crc")).head
      val dst = dir.resolve(name)
      java.nio.file.Files.copy(java.nio.file.Paths.get(part), dst)
      java.nio.file.Files.setLastModifiedTime(
        dst, java.nio.file.attribute.FileTime.fromMillis(ts))
    }
    writeOne(Seq((10L, (parA ++ parShared).mkString(" "))), "a.parquet", 1000000000000L)
    writeOne(Seq((5L, (parB ++ parShared).mkString(" "))), "b.parquet", 1000000060000L)
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    EventStream.runToMemory(
      DocStream.paragraphVerdicts(spark, stream).toDF(), "par_ooo",
      OutputMode.Update())
    val verdicts = spark.table("par_ooo")
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getBoolean(2))).toMap
    assert(verdicts((10L, 1)) == false, "doc 10 (first arrival) keeps")
    assert(verdicts((5L, 1)) == true,
      "doc 5's later arrival must be a dup — exactly one keeper per paragraph")
    val keepers = spark.table("par_ooo")
      .where(col("par_idx") === 1 && !col("dup")).count()
    assert(keepers == 1L, s"exactly one keeper verdict ever, got $keepers")
  }

  test("the same function in batch mode equals the batch operator on the planted corpus") {
    val docs = (wave1 ++ wave2).toDF("doc_id", "text")
    val got = DocStream.paragraphVerdicts(spark, docs)
      .groupBy(col("doc_id"))
      .agg(sum(when(col("dup"), 1L).otherwise(0L)).as("dup_pars"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = Dedup.paragraphDedup(docs)
      .where(col("n_pars") > 0)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }
}
