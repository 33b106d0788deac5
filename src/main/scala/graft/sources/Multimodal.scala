package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside an opaque media payload. */
case class MediaMeta(kind: String, width: Int, height: Int,
    sampleRate: Int, durationMs: Long)

/** A multimodal row: opaque binary payload + typed metadata. */
case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
    meta: MediaMeta)

/** Extracted feature record. */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
    features: Array[Float])

/** Real-decode output: unit = pixel (images) or sample (audio). */
case class MediaDecoded(media_id: Long, kind: String, n_units: Long,
    unit_sum: Long)

/** Multimodal-column plumbing (north star): image/audio/video handled as
  * opaque `binary` columns with typed metadata, features extracted by
  * per-partition batch processing.
  *
  * Two decode tiers live here:
  *  - REAL decoders for the formats the JDK itself can handle —
  *    PNG/BMP via javax.imageio and 16-bit PCM WAV via
  *    javax.sound.sampled ([[realMediaFromDocs]]/[[decodeFeatures]],
  *    the m2 oracle path);
  *  - a STUB byte-histogram (`fakeDecode`) standing in for codecs the
  *    container lacks (JPEG/video) — it keeps the exact production
  *    shape: schema, binary payload handling, `mapPartitions` batch
  *    iteration (one decoder instance per partition, the pattern a
  *    JNI/FFmpeg decoder would use), partition-count preservation.
  * At 100 TB the binary column rides in Parquet as-is; decode
  * parallelism == partition count; no shuffle is introduced.
  */
object Multimodal {

  /** Build a deterministic fake media table from the documents table
    * (payload = utf-8 bytes of text; metadata derived from doc fields). */
  def fakeMediaFromDocs(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val bytes = text.getBytes(StandardCharsets.UTF_8)
        MediaRow(id, kind, bytes,
          MediaMeta(kind, width = (nChars % 640).toInt, height = (nChars % 480).toInt,
            sampleRate = if (kind == "audio") 16000 else 0,
            durationMs = nChars * 10))
      }
  }

  /** STUB decoder: deterministic 16-bin byte histogram, L1-normalized.
    * A real implementation would decode the payload (JPEG/PCM/frames)
    * here — one decoder instance per partition, streaming the iterator. */
  private def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) % dim) += 1f; i += 1 }
    val total = math.max(bytes.length, 1).toFloat
    var j = 0
    while (j < dim) { hist(j) /= total; j += 1 }
    hist
  }

  /** Feature extraction over partitions — the batch shape of a real
    * decoder pipeline (init-once-per-partition, iterate, emit). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // real pipeline: open decoder/codec context here, once per partition
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong,
          fakeDecode(r.bytes, dim))
      }
      // and close it here (wrap iterator if the codec held resources)
    }
  }

  // ---- REAL media: deterministic generation + real decoders ----------
  //
  // The container has no native codecs, but the JDK itself ships two:
  // javax.imageio (PNG/BMP) and javax.sound.sampled (WAV PCM). Payloads
  // are generated with CLOSED-FORM pixel/sample values — gray(i) =
  // (id*31 + 7i) mod 256, sample(i) = (id*131 + 11i) mod 65536 - 32768 —
  // so the DuckDB oracle can recompute the decoded-value sums from the
  // formulas alone: the m2 hash gate fails iff the PNG/BMP/WAV encode or
  // decode path corrupts a single pixel or sample.

  /** Encode 16-bit mono PCM samples as a canonical 44-byte-header WAV
    * (s16le). Shared by the generator and [[frameSampleWav]] so both
    * sides of the sample→bytes→sample loop use one byte layout. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val n = samples.length
    val bytes = new Array[Byte](44 + n * 2)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(36 + n * 2)
    bb.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(16); bb.putShort(1); bb.putShort(1)
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes(StandardCharsets.US_ASCII))
    bb.putInt(n * 2)
    var i = 0
    while (i < n) { bb.putShort(samples(i)); i += 1 }
    bytes
  }

  /** Deterministic REAL media from doc ids: PNG and BMP images (gray
    * ramp pixels) and 16-bit mono PCM WAV clips. */
  def realMediaFromDocs(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      (id % 3) match {
        case 2 =>
          val n = (200 + id % 100).toInt
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = (((id * 131 + 11L * i) % 65536) - 32768).toShort
            i += 1
          }
          MediaRow(id, "wav", encodeWav(samples, 16000),
            MediaMeta("wav", 0, 0, 16000, n * 1000L / 16000))
        case k =>
          val fmt = if (k == 0) "png" else "bmp"
          val w = (8 + id % 16).toInt
          val h = (8 + id % 8).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < w * h) {
            val g = ((id * 31 + 7L * i) % 256).toInt
            img.setRGB(i % w, i / w, (g << 16) | (g << 8) | g)
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, bos)
          MediaRow(id, fmt, bos.toByteArray, MediaMeta(fmt, w, h, 0, 0))
      }
    }
  }

  /** Real decode (one decoder context per partition, streaming): images
    * through javax.imageio, WAV through javax.sound.sampled. Emits the
    * unit count (pixels|samples) and the EXACT integer sum of decoded
    * values — the closed forms above make both oracle-checkable. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaDecoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // same disk-cache kill as decodeJpegError (r12): without it every
      // ImageIO.read from a byte stream writes a temp FILE per image
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        r.kind match {
          case "png" | "bmp" =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.bytes))
            require(img != null, s"media ${r.media_id}: undecodable ${r.kind}")
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                sum += img.getRGB(x, y) & 0xFF // gray: B == G == R
                x += 1
              }
              y += 1
            }
            MediaDecoded(r.media_id, r.kind,
              img.getWidth.toLong * img.getHeight, sum)
          case "wav" =>
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.bytes))
            val data = ais.readAllBytes()
            ais.close()
            val bb = java.nio.ByteBuffer.wrap(data)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            var sum = 0L
            var i = 0
            val n = data.length / 2
            while (i < n) { sum += bb.getShort(i * 2); i += 1 }
            MediaDecoded(r.media_id, r.kind, n.toLong, sum)
          case other =>
            throw new IllegalArgumentException(s"no decoder for kind '$other'")
        }
      }
    }
  }

  // ---- JPEG: the lossy tier ------------------------------------------
  //
  // The JDK's ImageIO also ships a JPEG codec (probed at runtime — a
  // stripped-down headless JDK may lack it). JPEG decode of a given
  // payload is deterministic but NOT closed-form invertible: the DCT
  // quantization loses pixel exactness, so the m4 gate pairs the exact
  // closed-form unit COUNT with a bounded-error flag on the decoded
  // values instead of m2's exact-sum hash.

  /** True iff this JDK's ImageIO can both write and read JPEG. */
  def jpegAvailable: Boolean =
    javax.imageio.ImageIO.getWriterFormatNames.exists(_.equalsIgnoreCase("jpeg")) &&
      javax.imageio.ImageIO.getReaderFormatNames.exists(_.equalsIgnoreCase("jpeg"))

  /** Deterministic JPEG media from doc ids: the same gray closed form
    * as the PNG/BMP generator — gray(i) = (id·31 + 7i) mod 256 —
    * encoded at maximum quality (explicit writer param; `ImageIO.write`
    * would default to 0.75 and widen the decode error the m4 gate
    * bounds). */
  def jpegMediaFromDocs(docs: DataFrame): Dataset[MediaRow] = {
    require(jpegAvailable, "no JPEG codec in this JDK's ImageIO")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      // one writer instance per partition — the decoder-context shape
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(1.0f)
      val out = ids.map { id =>
        val w = (8 + id % 16).toInt
        val h = (8 + id % 8).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < w * h) {
          val g = ((id * 31 + 7L * i) % 256).toInt
          img.setRGB(i % w, i / w, (g << 16) | (g << 8) | g)
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
        ios.close()
        MediaRow(id, "jpeg", bos.toByteArray, MediaMeta("jpeg", w, h, 0, 0))
      }
      // writer.dispose() after the iterator drains
      new Iterator[MediaRow] {
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h) writer.dispose()
          h
        }
        def next(): MediaRow = out.next()
      }
    }
  }

  /** Decode JPEG payloads and measure the lossy-decode error against
    * the closed-form ideal pixels: per image, the pixel count plus the
    * mean and max absolute gray error. Deterministic (same codec, same
    * payload ⇒ same pixels), so the measured bounds are pinned, not
    * flaky. */
  def decodeJpegError(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // r12 decode-path cost fixes (value-identical — the registered m4
      // row is hash-gated): ImageIO's default stream cache writes a
      // TEMP FILE PER IMAGE (the m4 drift's disk dependence — an
      // arithmetic cal0 can't see disk latency); one reader per
      // partition skips the per-image reader-registry search, the same
      // decoder-context shape as the encode side's writer; bulk getRGB
      // replaces w*h per-pixel calls with one (identical conversion
      // path, so identical values).
      // setUseCache mutates GLOBAL JVM state on the executor — any other
      // ImageIO user in the same JVM loses stream-file caching too. The
      // encode side sets the same flag, so within this library the
      // setting is uniform; an embedding application that needs cached
      // ImageIO streams elsewhere must isolate executors.
      javax.imageio.ImageIO.setUseCache(false)
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("jpeg").next()
      val out = rows.map { r =>
        require(r.kind == "jpeg", s"media ${r.media_id}: expected jpeg, got ${r.kind}")
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.bytes))
        reader.setInput(iis, true, true)
        val img = try reader.read(0) finally iis.close()
        require(img != null, s"media ${r.media_id}: undecodable jpeg")
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var sumErr = 0L
        var maxErr = 0
        var i = 0
        while (i < w * h) {
          val ideal = ((r.media_id * 31 + 7L * i) % 256).toInt
          val got = px(i) & 0xFF // gray: B == G == R ± codec noise
          val e = math.abs(got - ideal)
          sumErr += e
          if (e > maxErr) maxErr = e
          i += 1
        }
        (r.media_id, w.toLong * h, sumErr.toDouble / (w * h), maxErr)
      }
      // reader.dispose() at partition end (the encode side's writer
      // shape): native decoder resources are otherwise held until GC
      new Iterator[(Long, Long, Double, Int)] {
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h) reader.dispose()
          h
        }
        def next(): (Long, Long, Double, Int) = out.next()
      }
    }.toDF("media_id", "n_units", "mean_abs_err", "max_abs_err")
  }

  // ---- REAL resize / frame-sample -----------------------------------
  //
  // The two transform stages of a media curation pipeline, on the same
  // real-codec tier as m2: decode the actual payload, transform the
  // decoded units with EXACT integer arithmetic, re-encode in the same
  // (lossless) container. Because the transforms are closed-form over
  // closed-form inputs, the DuckDB oracle recomputes the transformed
  // sums symbolically — the m5/m6 gates fail iff any leg of
  // encode→decode→transform→re-encode→decode drops or corrupts a unit.
  // Per-partition decoder contexts, no shuffle, partition-parallel at
  // any corpus size — the binary column never moves.

  /** REAL image resize: exact box downsample by integer `factor`.
    * Output pixel (ox,oy) = floor(mean of the factor×factor input block
    * at (factor·ox, factor·oy)); a trailing remainder row/column is
    * cropped (floor-division output dims — the usual crop-then-pool
    * semantics). PNG/BMP rows are decoded, downsampled, re-encoded in
    * their own format; other kinds pass through untouched. */
  def resizeBox(media: Dataset[MediaRow], factor: Int = 2): Dataset[MediaRow] = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp file per image
      rows.map { r =>
        r.kind match {
          case "png" | "bmp" =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.bytes))
            require(img != null, s"media ${r.media_id}: undecodable ${r.kind}")
            val w = img.getWidth
            val h = img.getHeight
            val wo = w / factor
            val ho = h / factor
            require(wo > 0 && ho > 0,
              s"media ${r.media_id}: ${w}x$h too small for factor $factor")
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            val out = new java.awt.image.BufferedImage(
              wo, ho, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var oy = 0
            while (oy < ho) {
              var ox = 0
              while (ox < wo) {
                var s = 0
                var dy = 0
                while (dy < factor) {
                  var dx = 0
                  val base = (oy * factor + dy) * w + ox * factor
                  while (dx < factor) { s += px(base + dx) & 0xFF; dx += 1 }
                  dy += 1
                }
                val g = s / (factor * factor) // floor: all terms >= 0
                out.setRGB(ox, oy, (g << 16) | (g << 8) | g)
                ox += 1
              }
              oy += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, r.kind, bos)
            r.copy(bytes = bos.toByteArray,
              meta = r.meta.copy(width = wo, height = ho))
          case _ => r
        }
      }
    }
  }

  /** REAL audio frame sampling: decode WAV PCM, keep every `everyN`-th
    * frame of `frameLen` samples (frames 0, N, 2N, …; a trailing
    * partial frame participates like any other), re-encode as WAV.
    * Non-wav kinds pass through untouched. */
  def frameSampleWav(media: Dataset[MediaRow], frameLen: Int,
      everyN: Int): Dataset[MediaRow] = {
    require(frameLen >= 1 && everyN >= 1,
      s"frameLen/everyN must be >= 1, got $frameLen/$everyN")
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      if (r.kind != "wav") r
      else {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.bytes))
        val data = ais.readAllBytes()
        ais.close()
        val bb = java.nio.ByteBuffer.wrap(data)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = data.length / 2
        val kept = Array.newBuilder[Short]
        var i = 0
        while (i < n) {
          if ((i / frameLen) % everyN == 0) kept += bb.getShort(i * 2)
          i += 1
        }
        val samples = kept.result()
        val rate = if (r.meta.sampleRate > 0) r.meta.sampleRate else 16000
        r.copy(bytes = encodeWav(samples, rate),
          meta = r.meta.copy(durationMs = samples.length * 1000L / rate))
      }
    }
  }

  /** REAL feature extraction over DECODED pixels: per-image gray
    * histogram (bin = gray · bins / 256), all bins emitted including
    * empty ones. The real-tier twin of the stub byte-histogram
    * [[extractFeatures]]: same init-once-per-partition batch shape, but
    * the units being binned come out of the actual image codec, so the
    * m7 gate covers decode AND binning. Integer counts only — exactly
    * oracle-checkable. */
  def grayHistogram(media: Dataset[MediaRow], bins: Int = 8): DataFrame = {
    require(bins >= 1 && 256 % bins == 0,
      s"bins must divide 256, got $bins")
    val spark = media.sparkSession
    import spark.implicits._
    val width = 256 / bins
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        require(r.kind == "png" || r.kind == "bmp",
          s"media ${r.media_id}: grayHistogram expects an image, got ${r.kind}")
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.bytes))
        require(img != null, s"media ${r.media_id}: undecodable ${r.kind}")
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val hist = new Array[Long](bins)
        var i = 0
        while (i < w * h) { hist((px(i) & 0xFF) / width) += 1L; i += 1 }
        (0 until bins).map(b => (r.media_id, r.kind, b, hist(b)))
      }
    }.toDF("media_id", "kind", "bin", "n_px")
  }

  /** STUB frame sampling for the codec-less tier: every nth byte-block
    * stands in for every nth frame of a VIDEO payload (no video codec in
    * this container; the real-audio twin is [[frameSampleWav]]). */
  def frameSampleStub(media: Dataset[MediaRow], everyN: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      if (r.kind != "video") r
      else r.copy(bytes = r.bytes.grouped(64).zipWithIndex
        .collect { case (blk, i) if i % everyN == 0 => blk }
        .flatten.toArray)
    }
  }
}
