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

/** Multimodal-column plumbing (north star): image/audio/video handled as
  * opaque `binary` columns with typed metadata, features extracted by
  * per-partition batch processing.
  *
  * The decode step is a STUB — this container has no image/audio codecs,
  * so `fakeDecode` derives a deterministic 16-dim byte-histogram feature
  * instead of running a real decoder. Everything around it is the real
  * Spark mechanics a production pipeline needs: schema shape, binary
  * payload handling, `mapPartitions` batch iteration (one JVM-side
  * decoder instance per partition, the same pattern a JNI/FFmpeg/JPEG
  * decoder would use), and partition-count preservation. At 100 TB the
  * binary column rides in Parquet as-is; decode parallelism == partition
  * count; no shuffle is introduced.
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
