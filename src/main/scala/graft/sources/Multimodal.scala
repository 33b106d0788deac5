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

  /** Deterministic REAL media from doc ids: PNG and BMP images (gray
    * ramp pixels) and 16-bit mono PCM WAV clips. */
  def realMediaFromDocs(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      (id % 3) match {
        case 2 =>
          val n = (200 + id % 100).toInt
          val bytes = new Array[Byte](44 + n * 2)
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          // canonical 44-byte PCM WAV header, mono 16 kHz s16le
          bb.put("RIFF".getBytes(StandardCharsets.US_ASCII))
          bb.putInt(36 + n * 2)
          bb.put("WAVE".getBytes(StandardCharsets.US_ASCII))
          bb.put("fmt ".getBytes(StandardCharsets.US_ASCII))
          bb.putInt(16); bb.putShort(1); bb.putShort(1)
          bb.putInt(16000); bb.putInt(32000); bb.putShort(2); bb.putShort(16)
          bb.put("data".getBytes(StandardCharsets.US_ASCII))
          bb.putInt(n * 2)
          var i = 0
          while (i < n) {
            bb.putShort((((id * 131 + 11L * i) % 65536) - 32768).toShort)
            i += 1
          }
          MediaRow(id, "wav", bytes, MediaMeta("wav", 0, 0, 16000, n * 1000L / 16000))
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

  /** STUB image resize: recomputes metadata, payload passthrough-truncated
    * deterministically (a real impl would re-encode pixels). */
  def resizeStub(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      if (r.kind != "image") r
      else {
        val keep = math.min(r.bytes.length, math.max(1, w * h / 64))
        r.copy(bytes = r.bytes.take(keep),
          meta = r.meta.copy(width = w, height = h))
      }
    }
  }

  /** STUB frame sampling: every nth byte-block stands in for every nth
    * frame of a video payload. */
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
