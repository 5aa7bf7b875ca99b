package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The multimodal plumbing is real (schema, batching, partition behavior),
  * and so are all three codecs: IMAGE (javax.imageio over synthesized
  * PNGs), AUDIO (javax.sound.sampled over synthesized WAVs), and VIDEO
  * (javax.imageio's frame-addressable reader over synthesized animated
  * GIFs with per-frame delay metadata). These tests pin all three.
  */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("GIF synth → distribute → frame-metadata decode recovers dims, frame count, duration") {
    val bytes = Multimodal.synthGif(width = 13, height = 7, frames = 9, seed = 5L)
    assert(bytes.take(3).sameElements("GIF".getBytes("US-ASCII")), "synthGif must emit a real GIF header")
    assert(Multimodal.decodeVideo(bytes).contains((13, 7, 9, 900L)),
      "9 frames at 100 ms/frame must decode to 900 ms")
    assert(Multimodal.decodeVideo(Array[Byte](1, 2, 3)).isEmpty, "garbage bytes decode to None")
    // distributed: every video row's decoded frame count / duration matches
    // the synthesis formula (frames = 1 + 131·len mod 24, 100 ms/frame)
    val srcLen = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "octet_length(encode(text, 'UTF-8')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vids = Multimodal
      .decode(Multimodal.demoMediaFromDocuments(spark, dir).repartition(4), batchSize = 16)
      .collect().filter(_.kind == "video")
    assert(vids.nonEmpty)
    assert(vids.forall { f =>
      val n = srcLen(f.media_id).toLong
      f.duration_ms == (1 + (n * 131) % 24) * 100 &&
        f.width == 1 + (f.media_id % 32).toInt && f.height == 1 + (n % 32).toInt
    }, "decoded video dims/durations must equal the synthesis formulas")
  }

  test("WAV synth → distribute → javax.sound decode roundtrip recovers exact frame count") {
    val bytes = Multimodal.synthWav(frames = 12345, sampleRate = 1000, seed = 7L)
    assert(bytes.take(4).sameElements("RIFF".getBytes("US-ASCII")), "synthWav must emit a real RIFF header")
    assert(Multimodal.decodeAudio(bytes).contains((12345L, 1000)))
    assert(Multimodal.decodeAudio(Array[Byte](1, 2, 3)).isEmpty, "garbage bytes decode to None")
    // distributed: every audio row's decoded duration matches the synthesis
    // formula (1 kHz ⇒ duration_ms == frames == 1 + 131·len mod 60000)
    val media = Multimodal.demoMediaFromDocuments(spark, dir).repartition(4)
    val srcLen = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "octet_length(encode(text, 'UTF-8')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val audio = Multimodal.decode(media, batchSize = 16).collect().filter(_.kind == "audio")
    assert(audio.nonEmpty)
    assert(audio.forall(f => f.duration_ms == 1 + (srcLen(f.media_id).toLong * 131) % 60000),
      "decoded audio durations must equal the synthesis formula")
  }

  test("PNG synth → distribute → imageio decode roundtrip recovers exact dimensions") {
    val bytes = Multimodal.synthPng(37, 11, seed = 42L)
    assert(bytes.length > 8 &&
      (bytes.take(8).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)),
      "synthPng must emit a real PNG signature")
    assert(Multimodal.decodeImage(bytes).contains((37, 11)))
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3)).isEmpty, "garbage bytes decode to None")
    // distributed: every image row's decoded dims match the synthesis formulas
    val feats = Multimodal
      .decode(Multimodal.demoMediaFromDocuments(spark, dir).repartition(4), batchSize = 16)
      .collect()
    val imgs = feats.filter(_.kind == "image")
    assert(imgs.nonEmpty)
    assert(imgs.forall(f => f.width == 1 + (f.media_id % 64).toInt && f.width > 0 && f.height > 0),
      "decoded widths must equal the 1 + id mod 64 synthesis formula")
  }

  test("imageDHash: identical images hash equal, tiny edit stays near, unrelated far") {
    import spark.implicits._
    def noisy(w: Int, h: Int, seed: Long, flips: Int): Array[Byte] = {
      // re-encode the synth image with `flips` single-pixel perturbations
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.synthPng(w, h, seed)))
      (0 until flips).foreach { n =>
        img.setRGB(n % w, (n * 7) % h, img.getRGB(n % w, (n * 7) % h) ^ 0x080808)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", Multimodal.synthPng(48, 40, 5L), ""),
      Multimodal.MediaRecord(2L, "image", Multimodal.synthPng(48, 40, 5L), ""), // exact dup
      Multimodal.MediaRecord(3L, "image", noisy(48, 40, 5L, flips = 3), ""),    // near dup
      Multimodal.MediaRecord(4L, "image", Multimodal.synthPng(40, 48, 999L), ""), // unrelated
      Multimodal.MediaRecord(5L, "audio", Array[Byte](1, 2), "")                // filtered out
    ).toDS()
    val got = Multimodal.imageDHash(media)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1) << 32) | r.getLong(2))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(got.keySet == Set(1L, 2L, 3L, 4L), "images only")
    assert(got(1L) == got(2L), "byte-identical content must hash identically")
    assert(ham(got(1L), got(3L)) <= 8,
      s"3 flipped pixels should stay within a few bits, got ${ham(got(1L), got(3L))}")
    assert(ham(got(1L), got(4L)) > 8,
      s"unrelated image should be far, got ${ham(got(1L), got(4L))}")
  }

  test("image near-dup pairs: dHash feeds the pigeonhole pair generator directly") {
    import spark.implicits._
    import graft.operators.Dedup
    def noisy(seed: Long, flips: Int): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.synthPng(48, 40, seed)))
      (0 until flips).foreach(n => img.setRGB(n % 48, (n * 7) % 40,
        img.getRGB(n % 48, (n * 7) % 40) ^ 0x040404))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", Multimodal.synthPng(48, 40, 11L), ""),
      Multimodal.MediaRecord(2L, "image", noisy(11L, 2), ""),
      Multimodal.MediaRecord(3L, "image", Multimodal.synthPng(40, 48, 777L), "")
    ).toDS()
    // recombine the halves: the 64-bit signature rides the same pigeonhole
    // banding as text simhash (8 bands of 8 -> exact for dist < 8)
    val sigs = Multimodal.imageDHash(media)
      .select(col("media_id").as("doc_id"),
        (shiftleft(col("dhash_hi"), 32).bitwiseOR(col("dhash_lo"))).as("simhash"))
    val pairs = Dedup.simhashPairs(sigs, maxDist = 7, bands = 8, sigBits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)),
      s"near-identical images pair, unrelated do not: ${pairs.toSeq}")
  }

  test("imageNearDupPairs: exact dup at hamming 0, unrelated image absent") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", Multimodal.synthPng(48, 40, 21L), ""),
      Multimodal.MediaRecord(2L, "image", Multimodal.synthPng(48, 40, 21L), ""), // exact dup
      Multimodal.MediaRecord(3L, "image", Multimodal.synthPng(40, 48, 555L), "") // unrelated
    ).toDS()
    val pairs = Multimodal.imageNearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)),
      s"exact dup pairs at 0 bits, unrelated stays out: ${pairs.toSeq}")
  }

  test("decode runs distributed over binary columns with stable schema") {
    val media = Multimodal.demoMediaFromDocuments(spark, dir).repartition(4)
    val feats = Multimodal.decode(media, batchSize = 16)
    assert(feats.columns.toSeq ==
      Seq("media_id", "kind", "n_bytes", "width", "height", "duration_ms", "features"))
    val rows = feats.collect()
    assert(rows.length == media.count().toInt)
    // deterministic: same input → same features
    val again = Multimodal.decode(media, batchSize = 16).collect()
    assert(rows.map(_.media_id).sorted.sameElements(again.map(_.media_id).sorted))
    val byId      = rows.map(r => r.media_id -> r.features.toSeq).toMap
    val againById = again.map(r => r.media_id -> r.features.toSeq).toMap
    assert(byId == againById)
    // images get no duration; audio/video do
    assert(rows.filter(_.kind == "image").forall(_.duration_ms == 0L))
    assert(rows.filter(_.kind != "image").forall(_.duration_ms > 0L))
  }

  test("resizeImages halves decoded dimensions via a real codec roundtrip") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", Multimodal.synthPng(10, 7, seed = 3), "en"),
      Multimodal.MediaRecord(2L, "image", Multimodal.synthPng(1, 1, seed = 4), "en"),
      Multimodal.MediaRecord(3L, "audio", Multimodal.synthWav(100), "en")).toDS()
    val out = Multimodal.resizeImages(media, num = 1, den = 2).collect()
    val byId = out.map(r => r.media_id -> r).toMap
    // ceil(10/2) x ceil(7/2) = 5 x 4, recovered by DECODING the output PNG
    assert(Multimodal.decodeImage(byId(1L).bytes).contains((5, 4)))
    // 1x1 floors at 1x1, never 0
    assert(Multimodal.decodeImage(byId(2L).bytes).contains((1, 1)))
    // non-image records pass through byte-identical
    assert(byId(3L).bytes.sameElements(Multimodal.synthWav(100)))
  }

  test("sampleFrames extracts every stride-th frame as a decodable PNG") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", Multimodal.synthGif(6, 4, frames = 10, seed = 5), "en"),
      Multimodal.MediaRecord(2L, "video", Multimodal.synthGif(3, 3, frames = 1, seed = 6), "en"),
      Multimodal.MediaRecord(3L, "image", Multimodal.synthPng(5, 5, seed = 7), "en")).toDS()
    val frames = Multimodal.sampleFrames(media, stride = 4).collect()
    // ceil(10/4)=3 frames at indices 0,4,8 for clip 1; 1 frame for clip 2;
    // the image record contributes nothing
    assert(frames.map(f => (f.media_id, f.frame_idx)).sorted.toSeq ==
      Seq((1L, 0), (1L, 4), (1L, 8), (2L, 0)))
    // every extracted frame is a standalone PNG with the clip's dimensions
    assert(frames.filter(_.media_id == 1L)
      .forall(f => Multimodal.decodeImage(f.bytes).contains((6, 4))))
    assert(frames.filter(_.media_id == 2L)
      .forall(f => Multimodal.decodeImage(f.bytes).contains((3, 3))))
    // the carried (width, height) agree with a full roundtrip decode of the
    // emitted PNG — the parity q_multimodal_frames proved by re-decoding
    // every frame before r16 moved the dims into FrameRecord itself
    assert(frames.forall(f =>
      Multimodal.decodeImage(f.bytes).contains((f.width, f.height))))
  }

  test("downsampleAudio keeps every 4th sample at rate/4; non-audio passes through") {
    import spark.implicits._
    val wav = Multimodal.synthWav(1001, sampleRate = 1000, seed = 7L)
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", wav, "en"),
      Multimodal.MediaRecord(2L, "image", Multimodal.synthPng(5, 5, 2L), "en")
    ).toDS()
    val out = Multimodal.downsampleAudio(media, factor = 4).collect().sortBy(_.media_id)
    // real codec roundtrip: ceil(1001/4) = 251 frames at 250 Hz
    assert(Multimodal.decodeAudio(out(0).bytes).contains((251L, 250)))
    // decimation kept the RIGHT samples: frame i of the output == frame 4i
    // of the input (16-bit LE PCM starts at byte 44 in both WAVs)
    def sample(bytes: Array[Byte], i: Int): Int =
      java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort(44 + i * 2)
    (0 until 10).foreach { i =>
      assert(sample(out(0).bytes, i) == sample(wav, i * 4), s"output frame $i")
    }
    // the image record is byte-identical
    assert(out(1).bytes.sameElements(Multimodal.synthPng(5, 5, 2L)))
  }

  test("videoNearDupPairs: identical clips share every sampled frame, unrelated absent") {
    import spark.implicits._
    val clip = Multimodal.synthGif(width = 11, height = 9, frames = 13, seed = 42L)
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", clip, "en"),
      Multimodal.MediaRecord(2L, "video", clip, "en"),                                  // exact dup
      Multimodal.MediaRecord(3L, "video", Multimodal.synthGif(11, 9, 13, 999L), "en"),  // unrelated
      Multimodal.MediaRecord(4L, "image", Multimodal.synthPng(5, 5, 1L), "en")          // wrong kind
    ).toDS()
    val got = Multimodal.videoNearDupPairs(media, stride = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 13 frames at stride 4 -> sampled {0,4,8,12} = 4 frames, all shared
    assert(got.toSeq == Seq((1L, 2L, 4L)), s"only the planted dup pair, all 4 frames: ${got.toSeq}")
  }

  test("audioFingerprint matches an independent formula mirror through the WAV roundtrip") {
    import spark.implicits._
    // independent mirror: energies straight from the sample formula,
    // never touching the codec
    def expected(frames: Int, id: Long): (Long, Long) = {
      val e = new Array[Long](65)
      (0 until frames).foreach { i =>
        e((i.toLong * 65 / frames).toInt) += math.abs(((i.toLong * 131 + id * 17) % 65536) - 32768)
      }
      val h = (0 until 64).foldLeft(0L)((acc, k) => if (e(k + 1) > e(k)) acc | (1L << k) else acc)
      (h >>> 32, h & 0xffffffffL)
    }
    val clips = Seq((1L, 65), (2L, 66), (3L, 1000), (4L, 60064))
    val media = clips.map { case (id, n) =>
      Multimodal.MediaRecord(id, "audio", Multimodal.synthWavPattern(n, 1000, id), "en")
    }.toDS()
    val got = Multimodal.audioFingerprint(media)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    clips.foreach { case (id, n) =>
      assert(got(id) == expected(n, id), s"clip $id ($n frames)")
    }
    // halves are unsigned 32-bit
    got.values.foreach { case (hi, lo) =>
      assert(hi >= 0 && hi <= 0xffffffffL && lo >= 0 && lo <= 0xffffffffL)
    }
  }

  test("audioFingerprint is amplitude-invariant and content-sensitive") {
    import spark.implicits._
    // same waveform at half gain: every energy comparison is preserved,
    // so the hash must not move — the property that makes it a
    // fingerprint rather than a checksum
    def wavHalved(frames: Int, id: Long): Array[Byte] = {
      val full = Multimodal.synthWavPattern(frames, 1000, id)
      val bb = java.nio.ByteBuffer.wrap(full).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until frames).foreach { i =>
        bb.putShort(44 + i * 2, (bb.getShort(44 + i * 2) / 2).toShort)
      }
      full
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", Multimodal.synthWavPattern(2000, 1000, 9L), "en"),
      Multimodal.MediaRecord(2L, "audio", wavHalved(2000, 9L), "en"),
      Multimodal.MediaRecord(3L, "audio", Multimodal.synthWavPattern(2000, 1000, 777L), "en"),
      Multimodal.MediaRecord(4L, "audio", Array[Byte](1, 2, 3), "en") // undecodable: dropped
    ).toDS()
    val got = Multimodal.audioFingerprint(media)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "corrupt clip must be dropped, not crash")
    assert(got(1L) == got(2L), "half-gain copy must fingerprint identically")
    assert(got(1L) != got(3L), "different content must fingerprint differently")
  }

  test("imageStats: hand-computed 2x1 stats; bigger image == formula mirror through the codec") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", Multimodal.synthPng(2, 1, 0L), "en"),
      Multimodal.MediaRecord(2L, "image", Multimodal.synthPng(9, 7, 123L), "en"),
      Multimodal.MediaRecord(3L, "audio", Array[Byte](1, 2, 3), "en")
    ).toDS()
    val got = Multimodal.imageStats(media)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getSeq[Long](5))))
      .toMap
    // 2x1 seed 0: grays 0 and 3 -> mean 1.5, sigma 1.5, one bin -> entropy 0
    assert(got(1L)._1 == 2L && got(1L)._2 == 1.5 && got(1L)._3 == 1.5 && got(1L)._4 == 0.0,
      s"hand 2x1: ${got(1L)}")
    assert(got(1L)._5 == Seq(2L) ++ Seq.fill(15)(0L), s"hist 2x1: ${got(1L)._5}")
    // 9x7 seed 123: recompute everything from the synthesis formula
    def r(v: Double, n: Int): Double = { val f = math.pow(10, n); math.floor(v * f + 0.5) / f }
    val grays = for (y <- 0 until 7; x <- 0 until 9) yield {
      val v = ((x * 31 + y * 17) + 123L).toInt & 0xffffff
      (299 * ((v >> 16) & 255) + 587 * ((v >> 8) & 255) + 114 * (v & 255)) / 1000
    }
    val n = grays.size.toDouble
    val hist = (0 until 16).map(b => grays.count(_ / 16 == b).toLong)
    val se = hist.filter(_ > 0).map(c =>
      math.floor(-(c / n) * math.log(c / n) * 1e6 + 0.5).toLong).sum
    val mean = grays.sum / n
    assert(got(2L) == ((63L, r(mean, 4),
      r(math.sqrt(grays.map(g => g.toLong * g).sum / n - mean * mean), 4),
      r(se / 1e6, 6), hist)), s"9x7 mirror: ${got(2L)}")
  }

  test("videoSceneCuts: single-frame clip is one scene; cuts agree with the dHash stream") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", Multimodal.synthGif(16, 16, 1, 5L), "en"),
      Multimodal.MediaRecord(2L, "video", Multimodal.synthGif(16, 16, 6, 5L), "en"),
      Multimodal.MediaRecord(3L, "image", Multimodal.synthPng(5, 5, 1L), "en")
    ).toDS()
    val got = Multimodal.videoSceneCuts(media, minHamming = 1)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((1L, 0L, 1L)), s"single frame: ${got(1L)}")
    // composition check: cuts at minHamming=1 == count of consecutive
    // frame-hash pairs that differ, recomputed from the operator's own
    // building blocks (sampleFrames + imageDHash)
    val frames = Multimodal
      .sampleFrames(media.filter(_.media_id == 2L), stride = 1)
      .map(f => Multimodal.MediaRecord(f.frame_idx.toLong, "image", f.bytes, ""))
    val hashes = Multimodal.imageDHash(frames)
      .orderBy("media_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val wantCuts = hashes.sliding(2).count(p => p(0) != p(1)).toLong
    assert(got(2L) == ((6L, wantCuts, wantCuts + 1L)), s"6-frame clip: ${got(2L)} vs $wantCuts")
  }

  test("audioVad: hand-built burst pattern segments exactly; constant clip reads all-quiet") {
    import spark.implicits._
    def wavWith(samples: Seq[Int]): Array[Byte] = {
      val bytes = Multimodal.synthWavPattern(samples.size, 1000, 0L)
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.zipWithIndex.foreach { case (s, i) => bb.putShort(44 + i * 2, s.toShort) }
      bytes
    }
    val media = Seq(
      // windows of 2: energies 0, 20, 0, 20 vs mean 5/sample -> two
      // 1-window bursts
      Multimodal.MediaRecord(1L, "audio", wavWith(Seq(0, 0, 10, 10, 0, 0, 10, 10)), "en"),
      // energies 0, 20, 20, 0 -> one 2-window burst
      Multimodal.MediaRecord(2L, "audio", wavWith(Seq(0, 0, 10, 10, 10, 10, 0, 0)), "en"),
      // constant: no window strictly above the clip mean
      Multimodal.MediaRecord(3L, "audio", wavWith(Seq.fill(6)(5)), "en")
    ).toDS()
    val got = Multimodal.audioVad(media, winLen = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) == ((4L, 2L, 2L, 1L)), s"alternating bursts: ${got(1L)}")
    assert(got(2L) == ((4L, 2L, 1L, 2L)), s"contiguous burst: ${got(2L)}")
    assert(got(3L) == ((3L, 0L, 0L, 0L)), s"constant clip: ${got(3L)}")
  }
}
