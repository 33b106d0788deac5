package graft

import graft.sources.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.fakeMediaFromDocs(
    Tables.documents(spark, sf001))

  test("fake media table has binary payloads and typed metadata") {
    val rows = media.limit(5).collect()
    assert(rows.forall(_.bytes.nonEmpty))
    assert(rows.forall(r => Set("image", "audio", "video")(r.kind)))
    assert(rows.filter(_.kind == "audio").forall(_.meta.sampleRate == 16000))
  }

  test("feature extraction: deterministic, fixed dim, L1-normalized") {
    val f1 = Multimodal.extractFeatures(media, 16).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media, 16).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 == f2) // deterministic across runs
    assert(f1.values.forall(_.length == 16))
    assert(f1.values.forall(v => math.abs(v.sum - 1.0f) < 1e-3))
  }

  test("partition count preserved through extraction (no shuffle)") {
    val m = media.repartition(7)
    assert(Multimodal.extractFeatures(m).rdd.getNumPartitions == 7)
  }

  test("resize stub touches only images and rewrites metadata") {
    val out = Multimodal.resizeStub(media, 32, 32).collect()
    assert(out.filter(_.kind == "image").forall(r =>
      r.meta.width == 32 && r.meta.height == 32))
    val orig = media.collect().map(r => r.media_id -> r).toMap
    assert(out.filter(_.kind != "image").forall(r =>
      r.meta == orig(r.media_id).meta))
  }

  test("frame sampling shrinks video payloads only") {
    val orig = media.collect().map(r => r.media_id -> r.bytes.length).toMap
    val out = Multimodal.frameSampleStub(media, 4).collect()
    assert(out.filter(_.kind == "video").forall(r => r.bytes.length <= orig(r.media_id)))
    assert(out.filter(_.kind != "video").forall(r => r.bytes.length == orig(r.media_id)))
  }
}
