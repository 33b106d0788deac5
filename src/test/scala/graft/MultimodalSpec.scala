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

  test("real resize: box-pooled payloads decode to the closed-form sums") {
    val real = Multimodal.realMediaFromDocs(Tables.documents(spark, sf001))
    val resized = Multimodal.resizeBox(real, factor = 2)
    val decoded = Multimodal.decodeFeatures(
        resized.filter(_.kind != "wav")).collect()
    assert(decoded.nonEmpty)
    decoded.foreach { d =>
      val id = d.media_id
      val w = (8 + id % 16).toInt
      val h = (8 + id % 8).toInt
      val (wo, ho) = (w / 2, h / 2)
      def g(i: Long) = (id * 31 + 7 * i) % 256
      val expect = (for (oy <- 0 until ho; ox <- 0 until wo) yield
        (g((2L * oy) * w + 2 * ox) + g((2L * oy) * w + 2 * ox + 1) +
         g((2L * oy + 1) * w + 2 * ox) + g((2L * oy + 1) * w + 2 * ox + 1)) / 4).sum
      assert(d.n_units == wo.toLong * ho, s"media $id resized units")
      assert(d.unit_sum == expect, s"media $id resized sum (${d.kind})")
    }
    // format preserved (magic bytes), metadata floor-halved, wav untouched
    val rows = resized.limit(12).collect()
    val orig = real.collect().map(r => r.media_id -> r).toMap
    rows.foreach { r =>
      r.kind match {
        case "png" =>
          assert(r.bytes.take(4).sameElements(Array(0x89, 'P', 'N', 'G').map(_.toByte)))
          assert(r.meta.width == orig(r.media_id).meta.width / 2)
        case "bmp" =>
          assert(r.bytes.take(2).sameElements("BM".getBytes))
          assert(r.meta.height == orig(r.media_id).meta.height / 2)
        case "wav" =>
          assert(r.bytes.sameElements(orig(r.media_id).bytes), "wav passthrough")
      }
    }
  }

  test("real feature extraction: decoded-pixel gray histograms match the closed form") {
    val imgs = Multimodal.realMediaFromDocs(Tables.documents(spark, sf001))
      .filter(_.kind != "wav")
    val hist = Multimodal.grayHistogram(imgs, bins = 8).collect()
      .groupBy(_.getAs[Long]("media_id"))
    assert(hist.nonEmpty)
    hist.foreach { case (id, rows) =>
      assert(rows.length == 8, s"media $id: all bins emitted")
      val n = (8 + id % 16) * (8 + id % 8)
      val expect = (0L until n).map(i => (id * 31 + 7 * i) % 256)
        .groupBy(g => (g / 32).toInt).view.mapValues(_.size.toLong).toMap
      rows.foreach { r =>
        val b = r.getAs[Int]("bin")
        assert(r.getAs[Long]("n_px") == expect.getOrElse(b, 0L),
          s"media $id bin $b")
      }
      assert(rows.map(_.getAs[Long]("n_px")).sum == n, s"media $id total px")
    }
  }

  test("real frame sampling: kept WAV frames decode to the closed-form sums") {
    val real = Multimodal.realMediaFromDocs(Tables.documents(spark, sf001))
    val sampled = Multimodal.frameSampleWav(real, frameLen = 32, everyN = 3)
    val decoded = Multimodal.decodeFeatures(
        sampled.filter(_.kind == "wav")).collect()
    assert(decoded.nonEmpty)
    decoded.foreach { d =>
      val id = d.media_id
      val n = 200 + id % 100
      val kept = (0L until n).filter(i => (i / 32) % 3 == 0)
      val expect = kept.map(i => (id * 131 + 11 * i) % 65536 - 32768).sum
      assert(d.n_units == kept.length, s"clip $id kept samples")
      assert(d.unit_sum == expect, s"clip $id kept sum")
    }
    // images pass through byte-identically; durations shrink on wav
    val orig = real.collect().map(r => r.media_id -> r).toMap
    sampled.limit(12).collect().foreach { r =>
      if (r.kind != "wav")
        assert(r.bytes.sameElements(orig(r.media_id).bytes), "image passthrough")
      else assert(r.meta.durationMs < orig(r.media_id).meta.durationMs)
    }
  }

  test("frame sampling shrinks video payloads only") {
    val orig = media.collect().map(r => r.media_id -> r.bytes.length).toMap
    val out = Multimodal.frameSampleStub(media, 4).collect()
    assert(out.filter(_.kind == "video").forall(r => r.bytes.length <= orig(r.media_id)))
    assert(out.filter(_.kind != "video").forall(r => r.bytes.length == orig(r.media_id)))
  }
}
