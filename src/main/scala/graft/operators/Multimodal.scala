package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media travel as opaque `BINARY` columns with typed metadata;
  * decode/feature-extraction runs per-partition in bounded batches.
  *
  * The actual codec step is STUBBED (this environment ships no image/audio
  * libraries): `decodeStub` produces a deterministic fake feature record
  * derived only from the bytes. Everything around it — schema, batch
  * iteration, partition sizing, column pruning — is the real distributed
  * plumbing a production decoder would plug into; swap `decodeStub`'s body
  * for a JNI/libvips/ffmpeg call and nothing else changes.
  *
  * Scale notes: decode is a narrow per-partition op (no shuffle); partitions
  * should be sized by `spark.sql.files.maxPartitionBytes` so one partition's
  * media fits executor memory. Feature vectors are far smaller than media, so
  * the pipeline projects media bytes away immediately after decode.
  */
object Multimodal {

  /** One media record: id + kind ("image"/"audio"/"video") + raw bytes +
    * caller-provided metadata.
    */
  case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte], meta: String)

  /** Deterministic fake "decoded features" (STUB — see object docs):
    * byte-derived pseudo width/height/duration and a 4-dim feature vector.
    */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_ms: Long,
      features: Array[Float])

  /** STUB decode: replace the body with a real codec call. Deterministic in
    * the input bytes so tests can pin outputs.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n   = r.bytes.length
    val sum = r.bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      n_bytes = n.toLong,
      width = 1 + (sum % 1920).toInt,
      height = 1 + ((sum / 7) % 1080).toInt,
      duration_ms = if (r.kind == "image") 0L else 1 + sum % 600000,
      features = Array(n.toFloat, (sum % 251).toFloat, (sum % 17).toFloat, (sum % 3).toFloat))
  }

  /** Distributed decode: batched per-partition iteration (the Scala analogue
    * of a Pandas-UDF `mapInPandas` — bounded memory per batch, no shuffle).
    */
  def decode(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would amortize codec init across this batch
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** "Resize" stub: keeps the plumbing shape of a bytes→bytes media
    * transform (e.g. image resize / audio resample) — truncation stands in
    * for the codec call.
    */
  def resizeStub(media: Dataset[MediaRecord], maxBytes: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(bytes = r.bytes.take(maxBytes)))
  }

  /** Frame-sampling stub for video: emit one record per sampled "frame"
    * (every `stride` bytes stands in for every Nth frame) — a 1→N generator
    * transform, the shape a real frame sampler has.
    */
  def sampleFramesStub(media: Dataset[MediaRecord], stride: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.bytes.grouped(stride).zipWithIndex.map { case (chunk, i) =>
        MediaRecord(r.media_id * 1000 + i, r.kind + "_frame", chunk, r.meta)
      }
    }
  }

  /** Build a demo media table from any binary-generating source: here, the
    * documents table's text bytes play the role of media payloads so the
    * plumbing is exercised on real distributed data.
    */
  def demoMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read
      .parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("bytes"),
        col("lang").as("meta"))
      .as[MediaRecord]
  }
}
