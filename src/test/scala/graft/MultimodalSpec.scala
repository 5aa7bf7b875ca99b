package graft

import graft.operators.Multimodal

/** The multimodal plumbing is real (schema, batching, partition behavior);
  * only the codec body is stubbed — these tests pin the plumbing.
  */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

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

  test("resize truncates payloads; frame sampling is 1->N") {
    val media   = Multimodal.demoMediaFromDocuments(spark, dir)
    val resized = Multimodal.resizeStub(media, maxBytes = 10)
    assert(resized.collect().forall(_.bytes.length <= 10))
    val n      = media.count()
    val frames = Multimodal.sampleFramesStub(media, stride = 50)
    assert(frames.count() > n) // every doc > 50 bytes yields multiple frames
  }
}
