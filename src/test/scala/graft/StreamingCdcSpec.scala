package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.ChangeData

/** Streaming changelog apply: folding micro-batches of CDC events into a
  * running snapshot via foreachBatch must equal the one-shot batch MERGE
  * over the whole changelog — the table-maintenance twin of the
  * streaming-index-ingestion parity spec, and the property that lets a
  * 100 TB snapshot consume its changelog incrementally with bounded work
  * per batch (each micro-batch touches the snapshot once; old events are
  * never re-read).
  */
class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch changelog apply over micro-batches == one-shot batch MERGE") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    // two event files streamed one per micro-batch, in seq order: the
    // first updates 2 and deletes 3; the second re-inserts 3 and inserts 5
    val b1 = Seq((2L, "b1", 21.0, 1L, "U"), (3L, "c", 30.0, 2L, "D"))
    val b2 = Seq((3L, "c2", 33.0, 3L, "I"), (5L, "e", 50.0, 4L, "I"))
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-stream")
    b1.toDF("k", "s", "v", "seq", "op").coalesce(1).write.parquet(s"$dir/tmp1")
    b2.toDF("k", "s", "v", "seq", "op").coalesce(1).write.parquet(s"$dir/tmp2")
    val flat = java.nio.file.Files.createTempDirectory("graft-cdc-flat")
    Seq("tmp1", "tmp2").zipWithIndex.foreach { case (sub, i) =>
      val f = new java.io.File(s"$dir/$sub").listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = flat.resolve(s"$sub.parquet")
      java.nio.file.Files.copy(f.toPath, dst)
      // FileStreamSource orders batches by modification time; same-ms
      // copies tie and can arrive swapped — CDC parity requires batches
      // in event-time order (the natural changelog property), so pin it
      dst.toFile.setLastModified(System.currentTimeMillis() - 60000 + i * 30000)
    }
    var snapshot: DataFrame = base.localCheckpoint(true)
    val schema = b1.toDF("k", "s", "v", "seq", "op").schema
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(flat.toString)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        snapshot = ChangeData
          .applyChangelog(snapshot, batch, "k")
          .localCheckpoint(true)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val oneShot = ChangeData.applyChangelog(
      base, (b1 ++ b2).toDF("k", "s", "v", "seq", "op"), "k")
    assert(
      snapshot.orderBy("k").collect().map(_.toSeq).toSeq ==
        oneShot.orderBy("k").collect().map(_.toSeq).toSeq)
    // and the content is the expected MERGE result
    assert(snapshot.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq(1L -> "a", 2L -> "b1", 3L -> "c2", 4L -> "d", 5L -> "e"))
  }
}
