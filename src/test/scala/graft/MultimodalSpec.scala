package graft

import graft.sources.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.fakeMediaFromDocs(
    Tables.documents(spark, sf001))

  test("real media: PNG/BMP/WAV payloads decode back to the closed-form sums") {
    val decoded = Multimodal.decodeFeatures(
        Multimodal.realMediaFromDocs(Tables.documents(spark, sf001)))
      .collect().map(d => d.media_id -> d).toMap
    assert(decoded.nonEmpty)
    decoded.values.foreach { d =>
      val id = d.media_id
      val (n, expect) = (id % 3) match {
        case 2 =>
          val n = 200 + id % 100
          (n, (0L until n).map(i => (id * 131 + 11 * i) % 65536 - 32768).sum)
        case _ =>
          val n = (8 + id % 16) * (8 + id % 8)
          (n, (0L until n).map(i => (id * 31 + 7 * i) % 256).sum)
      }
      assert(d.n_units == n, s"media $id units")
      assert(d.unit_sum == expect, s"media $id sum (${d.kind})")
    }
    // the payloads really are the binary formats they claim to be
    val rows = Multimodal.realMediaFromDocs(Tables.documents(spark, sf001))
      .limit(9).collect()
    rows.foreach { r =>
      val magicOk = r.kind match {
        case "png" => r.bytes.take(4).sameElements(Array(0x89, 'P', 'N', 'G').map(_.toByte))
        case "bmp" => r.bytes.take(2).sameElements("BM".getBytes)
        case "wav" => r.bytes.take(4).sameElements("RIFF".getBytes)
      }
      assert(magicOk, s"media ${r.media_id} ${r.kind} magic bytes")
    }
  }

  test("jpeg tier: real JFIF payloads, decode error within one gray level") {
    // skip marker, not a silent pass: a JDK without a JPEG ImageIO
    // codec cancels this test visibly (this container's JDK has one)
    assume(Multimodal.jpegAvailable, "no JPEG codec in ImageIO — tier unavailable")
    val jm = Multimodal.jpegMediaFromDocs(Tables.documents(spark, sf001))
    val rows = jm.limit(5).collect()
    rows.foreach { r =>
      // JFIF/EXIF magic: FF D8 (SOI)
      assert((r.bytes(0) & 0xFF) == 0xFF && (r.bytes(1) & 0xFF) == 0xD8,
        s"media ${r.media_id} jpeg magic")
      assert(r.kind == "jpeg" && r.meta.width > 0 && r.meta.height > 0)
    }
    val err = Multimodal.decodeJpegError(jm).collect()
    assert(err.length == Tables.documents(spark, sf001).count())
    // measured: worst max_abs_err is 1 gray level at quality 1.0
    // (JpegScan); deterministic, so these are pins
    err.foreach { r =>
      assert(r.getAs[Int]("max_abs_err") <= 2,
        s"media ${r.getAs[Long]("media_id")}: err ${r.getAs[Int]("max_abs_err")}")
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Long]("n_units") == (8 + id % 16) * (8 + id % 8))
    }
  }

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
