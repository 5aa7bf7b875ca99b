package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media travel as opaque `BINARY` columns with typed metadata;
  * decode/feature-extraction runs per-partition in bounded batches.
  *
  * IMAGES and AUDIO are decoded for real with the two codecs the JDK
  * itself ships: `javax.imageio` reads PNG payloads and
  * `javax.sound.sampled` reads WAV payloads. `demoMediaFromDocuments`
  * synthesizes actual PNGs/WAVs whose dimensions / frame counts derive
  * from oracle-computable document properties — so the driver's DuckDB
  * oracle value-checks the whole encode→distribute→decode roundtrip for
  * both kinds. VIDEO decode remains an honest STUB (no JVM video codec
  * exists): deterministic byte-length-derived records. Everything around
  * the codecs — schema, batch iteration, partition sizing, column
  * pruning — is the real distributed plumbing a production decoder plugs
  * into; swap the codec call and nothing else changes.
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

  /** Synthesize a deterministic 16-bit mono PCM WAV with `frames` samples at
    * `sampleRate` Hz (samples from a seeded LCG — content is irrelevant to
    * the duration oracle but must be reproducible). Hand-rolled RIFF header:
    * byte-deterministic across JVMs, and javax.sound parses it back.
    */
  def synthWav(frames: Int, sampleRate: Int = 1000, seed: Long = 0L): Array[Byte] = {
    val dataSize = frames * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var s = seed
    var i = 0
    while (i < frames) {
      s = s * 6364136223846793005L + 1442695040888963407L
      bb.putShort((s >>> 48).toShort)
      i += 1
    }
    bb.array()
  }

  /** Real audio decode (pure JVM WAV/AIFF/AU via javax.sound.sampled —
    * ships with the JDK exactly like ImageIO): (frame count, frame rate Hz),
    * or None for unparseable bytes.
    */
  def decodeAudio(bytes: Array[Byte]): Option[(Long, Int)] =
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try Some((in.getFrameLength, in.getFormat.getFrameRate.toInt))
      finally in.close()
    } catch { case _: Exception => None }

  /** STUB decode for the one kind with no JVM codec (video): a
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
    * Images go through the REAL javax.imageio decoder and audio through the
    * REAL javax.sound.sampled decoder (unparseable bytes surface as
    * width/height/duration = -1 rather than a task failure); video through
    * the deterministic stub (no JVM video codec exists).
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
          r.kind match {
            case "image" =>
              val (w, h) = decodeImage(r.bytes).getOrElse((-1, -1))
              MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, w, h, 0L,
                Array(r.bytes.length.toFloat, w.toFloat, h.toFloat, (w.toLong * h).toFloat))
            case "audio" =>
              val (frames, rate) = decodeAudio(r.bytes).getOrElse((-1L, 1))
              val durMs = if (frames < 0) -1L else frames * 1000L / rate
              MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, 0, 0, durMs,
                Array(r.bytes.length.toFloat, frames.toFloat, rate.toFloat, durMs.toFloat))
            case _ => decodeStub(r)
          }
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
    * document properties (`1 + doc_id mod 64` × `1 + utf8_length mod 64`)
    * and audio rows carry REAL synthesized 1 kHz WAVs whose frame count is
    * `1 + (utf8_length * 131) mod 60000` — so decoding either is a
    * value-checkable roundtrip (at 1 kHz, duration_ms == frames exactly);
    * video rows carry the text bytes as opaque payloads for the stub.
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
          r.kind match {
            case "image" =>
              val w = 1 + (r.media_id % 64).toInt
              val h = 1 + (r.bytes.length % 64)
              r.copy(bytes = synthPng(w, h, r.media_id))
            case "audio" =>
              val frames = 1 + ((r.bytes.length.toLong * 131) % 60000).toInt
              r.copy(bytes = synthWav(frames, sampleRate = 1000, seed = r.media_id))
            case _ => r
          }
        }
      }
  }
}
