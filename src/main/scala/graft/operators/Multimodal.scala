package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media travel as opaque `BINARY` columns with typed metadata;
  * decode/feature-extraction runs per-partition in bounded batches.
  *
  * IMAGES are decoded for real: `javax.imageio` (pure JVM, ships with the
  * JDK) reads PNG payloads, and `demoMediaFromDocuments` synthesizes actual
  * PNGs whose dimensions derive from oracle-computable document properties —
  * so the driver's DuckDB oracle value-checks the whole encode→distribute→
  * decode roundtrip. Audio/video decode remains an honest STUB (this
  * environment ships no media codecs): deterministic byte-length-derived
  * records. Everything around the codec — schema, batch iteration,
  * partition sizing, column pruning — is the real distributed plumbing a
  * production decoder plugs into; swap the codec call and nothing else
  * changes.
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

  /** Synthesize a deterministic PNG: `width`×`height` RGB with a pixel
    * pattern seeded by `seed`. ImageIO's PNG encoder is deterministic for a
    * given JVM, and decoding recovers the exact dimensions — the roundtrip
    * the value oracle checks.
    */
  def synthPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, (((x * 31 + y * 17) + seed) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real image decode (pure JVM, PNG/JPEG/GIF/BMP via javax.imageio):
    * (width, height), or None for unparseable bytes.
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int)] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    Option(img).map(i => (i.getWidth, i.getHeight))
  }

  /** STUB decode for the kinds with no JVM codec (audio/video): a
    * deterministic record derived from the byte LENGTH only, so the DuckDB
    * oracle can recompute it from `octet_length` without decoding.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.bytes.length
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      n_bytes = n.toLong,
      width = 0,
      height = 0,
      duration_ms = if (r.kind == "image") 0L else 1 + (n.toLong * 131) % 600000,
      features = Array(n.toFloat, (n % 251).toFloat, (n % 17).toFloat, (n % 3).toFloat))
  }

  /** Distributed decode: batched per-partition iteration (the Scala analogue
    * of a Pandas-UDF `mapInPandas` — bounded memory per batch, no shuffle).
    * Images go through the REAL javax.imageio decoder (unparseable bytes
    * surface as width = height = -1 rather than a task failure); other
    * kinds through the deterministic stub.
    */
  def decode(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // ImageIO's global disk cache would serialize every decode through
      // temp-file I/O; in-memory streams are the right mode for batch decode
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would amortize codec init across this batch
        batch.iterator.map { r =>
          if (r.kind == "image") {
            val (w, h) = decodeImage(r.bytes).getOrElse((-1, -1))
            MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, w, h, 0L,
              Array(r.bytes.length.toFloat, w.toFloat, h.toFloat, (w.toLong * h).toFloat))
          } else decodeStub(r)
        }
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

  /** Build a demo media table from the documents table. Image rows carry
    * REAL synthesized PNGs whose dimensions derive from oracle-computable
    * document properties (`1 + doc_id mod 64` × `1 + utf8_length mod 64`),
    * so decoding them is a value-checkable roundtrip; audio/video rows
    * carry the text bytes as opaque payloads.
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
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          if (r.kind == "image") {
            val w = 1 + (r.media_id % 64).toInt
            val h = 1 + (r.bytes.length % 64)
            r.copy(bytes = synthPng(w, h, r.media_id))
          } else r
        }
      }
  }
}
