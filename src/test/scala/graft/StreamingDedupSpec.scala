package graft

import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

class StreamingDedupSpec extends SparkSpec {

  test("streaming dedup keeps one row per event_id") {
    // stage the events file TWICE so duplicates actually exist in the stream
    val d = java.nio.file.Files.createTempDirectory("graft-dedup-stream")
    java.nio.file.Files.createSymbolicLink(
      d.resolve("a.parquet"), java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"), d.resolve("b.parquet"))

    val stream = EventStream.readEvents(spark, d.toString)
    EventStream.runToMemory(EventStream.dedupEvents(stream), "dedup", OutputMode.Append())
    val got = spark.table("dedup")
    val n   = got.count()
    val distinctIds = got.select("event_id").distinct().count()
    val want = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert(n == want, s"expected $want deduped rows, got $n")
    assert(distinctIds == n)
  }
}
