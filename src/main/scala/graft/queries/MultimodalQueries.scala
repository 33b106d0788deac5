package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.Multimodal

/** Multimodal-column queries (north star), oracle-gated end to end.
  * m1/m3 run on deterministic text-byte payloads (binary-column
  * mechanics: fingerprints, dedup — no codec involved); m2 runs REAL
  * codecs (JDK PNG/BMP/WAV) over generated media whose pixel/sample
  * values follow closed forms the DuckDB oracle recomputes symbolically
  * — see Multimodal's scaladoc for the two tiers.
  */
object MultimodalQueries {

  /** M1: the payload + metadata surface — binary byte length, md5
    * payload fingerprint, struct metadata fields. One scan, pure
    * projection, no shuffle (sort is oracle-only). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.fakeMediaFromDocs(Tables.documents(spark, dir)).toDF()
      .select(col("media_id"), col("kind"),
        length(col("bytes")).cast("long").as("n_bytes"),
        md5(col("bytes")).as("fp"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.durationMs").as("duration_ms"))
      .orderBy("media_id")

  /** DuckDB re-derives payload facts from the source text: the payload
    * IS encode(text), so octet_length/md5 line up bitwise, and the
    * metadata formulas mirror fakeMediaFromDocs. */
  val mediaMetaSql: String =
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS fp,
      |  CAST(n_chars % 640 AS INT) AS width,
      |  CAST(n_chars % 480 AS INT) AS height,
      |  n_chars * 10 AS duration_ms
      |FROM documents ORDER BY media_id""".stripMargin

  /** M2: REAL decode through the per-partition pipeline — PNG and BMP
    * payloads decoded with javax.imageio, WAV PCM with
    * javax.sound.sampled. The generated pixels/samples follow closed
    * forms (Multimodal.realMediaFromDocs), so DuckDB recomputes the
    * decoded-value sums symbolically: the hash gate fails iff the
    * encode→bytes→decode loop corrupts a single pixel or sample. All
    * sums are exact integers — no float tolerance anywhere. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(
        Multimodal.realMediaFromDocs(Tables.documents(spark, dir))).toDF()
      .orderBy("media_id")

  /** M3: exact payload dedup — the binary-column twin of d1: identical
    * media bytes collapse to one keeper via an md5-of-bytes fingerprint
    * groupBy (one hash shuffle of fingerprints, never payloads — at
    * 100 TB the bytes stay where they are and only 16-byte digests
    * move). No codec involvement: byte-identical dedup is the first
    * pass of any media pipeline and needs only the payload. */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame =
    Multimodal.fakeMediaFromDocs(Tables.documents(spark, dir)).toDF()
      .groupBy(md5(col("bytes")).as("fp"))
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  val mediaDedupSql: String =
    """SELECT md5(text) AS fp, min(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** M4: JPEG — the LOSSY codec tier. Payloads are max-quality JPEGs of
    * the same gray closed form as m2's PNG/BMP; decode is deterministic
    * but not closed-form invertible (DCT quantization), so the gate
    * pairs the EXACT closed-form pixel count with a bounded-error flag:
    * measured worst-case |decoded − ideal| is 1 gray level across every
    * SF (max-quality tables on smooth ramps; JpegScan is the harness),
    * gated at ≤ 2 — a codec/colorspace regression (e.g. losing the
    * explicit quality=1.0 param, or chroma subsampling kicking in)
    * shows up as tens of levels. Requires a JPEG-capable ImageIO
    * (probed: Multimodal.jpegAvailable — present in this JDK; a
    * stripped JDK fails loudly at require, not with a wrong answer). */
  def jpegDecode(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeJpegError(
        Multimodal.jpegMediaFromDocs(Tables.documents(spark, dir)))
      .select(col("media_id"), col("n_units"),
        (col("max_abs_err") <= 2).as("err_ok"))
      .orderBy("media_id")

  val jpegDecodeSql: String =
    """SELECT doc_id AS media_id,
      |  (8 + doc_id % 16) * (8 + doc_id % 8) AS n_units,
      |  TRUE AS err_ok
      |FROM documents ORDER BY media_id""".stripMargin

  /** M5: REAL image resize — decode the PNG/BMP payloads, exact 2×2 box
    * downsample (floor mean, remainder row/column cropped), re-encode in
    * the same lossless format, then decode the RESIZED payloads and sum
    * their pixels. Every leg — generator encode, decode, pooling
    * arithmetic, re-encode, second decode — sits under the hash gate,
    * because DuckDB recomputes the pooled sums from the gray closed form
    * alone. Exact integers end to end; no tolerance. */
  def mediaResize(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(
        Multimodal.resizeBox(
          Multimodal.realMediaFromDocs(Tables.documents(spark, dir))
            .filter(col("kind") =!= "wav"), factor = 2)).toDF()
      .orderBy("media_id")

  /** The pooled-pixel closed form: output pixel (ox,oy) of image id is
    * (Σ_{dx,dy∈{0,1}} gray(id, (2oy+dy)·w + 2ox+dx)) // 4 with
    * gray(id,i) = (id·31 + 7i) mod 256; dims floor-halve. range(200)
    * bounds the correlated scan (wo·ho ≤ 11·7). */
  val mediaResizeSql: String =
    """SELECT media_id, kind, CAST(wo * ho AS BIGINT) AS n_units,
      |  CAST((SELECT SUM((
      |      (media_id*31 + 7*((2*(j.range//wo))*w + 2*(j.range%wo)))   % 256
      |    + (media_id*31 + 7*((2*(j.range//wo))*w + 2*(j.range%wo)+1)) % 256
      |    + (media_id*31 + 7*((2*(j.range//wo)+1)*w + 2*(j.range%wo)))   % 256
      |    + (media_id*31 + 7*((2*(j.range//wo)+1)*w + 2*(j.range%wo)+1)) % 256
      |  ) // 4) FROM range(200) j WHERE j.range < wo * ho) AS BIGINT) AS unit_sum
      |FROM (SELECT doc_id AS media_id,
      |        CASE WHEN doc_id % 3 = 0 THEN 'png' ELSE 'bmp' END AS kind,
      |        8 + doc_id % 16 AS w,
      |        (8 + doc_id % 16) // 2 AS wo,
      |        (8 + doc_id % 8) // 2 AS ho
      |      FROM documents WHERE doc_id % 3 < 2)
      |ORDER BY media_id""".stripMargin

  /** M6: REAL audio frame sampling — decode the WAV PCM payloads, keep
    * every 3rd frame of 32 samples (frames 0,3,6,…; the trailing
    * partial frame included), re-encode as WAV, then decode the SAMPLED
    * payloads and sum the surviving samples. Same end-to-end discipline
    * as m5: the oracle recomputes kept-count and kept-sum from the
    * sample closed form, so a dropped frame, an off-by-one at a frame
    * boundary, or a header/byte-order slip in the re-encode flips the
    * gate. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(
        Multimodal.frameSampleWav(
          Multimodal.realMediaFromDocs(Tables.documents(spark, dir))
            .filter(col("kind") === "wav"), frameLen = 32, everyN = 3)).toDF()
      .orderBy("media_id")

  /** Kept sample i of clip id: i < 200 + id mod 100 and ⌊i/32⌋ ≡ 0
    * (mod 3); value (id·131 + 11i) mod 65536 − 32768. */
  val frameSampleSql: String =
    """SELECT doc_id AS media_id, 'wav' AS kind,
      |  (SELECT COUNT(*) FROM range(400) i
      |   WHERE i.range < 200 + doc_id % 100 AND (i.range // 32) % 3 = 0
      |  ) AS n_units,
      |  CAST((SELECT SUM((doc_id*131 + 11*i.range) % 65536 - 32768)
      |   FROM range(400) i
      |   WHERE i.range < 200 + doc_id % 100 AND (i.range // 32) % 3 = 0
      |  ) AS BIGINT) AS unit_sum
      |FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""".stripMargin

  /** M7: REAL feature extraction — per-image 8-bin gray histogram over
    * DECODED pixels (empty bins included). Completes the
    * decode/feature-extract/resize/frame-sample set on the real-codec
    * tier: the oracle recomputes every bin count from the gray closed
    * form, so a binning slip or a decode corruption on any single
    * pixel flips the hash. */
  def grayHist(spark: SparkSession, dir: String): DataFrame =
    Multimodal.grayHistogram(
        Multimodal.realMediaFromDocs(Tables.documents(spark, dir))
          .filter(col("kind") =!= "wav"), bins = 8)
      .orderBy("media_id", "bin")

  val grayHistSql: String =
    """SELECT media_id, kind, CAST(b.range AS INT) AS bin,
      |  (SELECT COUNT(*) FROM range(400) i
      |   WHERE i.range < w * h
      |     AND ((media_id*31 + 7*i.range) % 256) // 32 = b.range
      |  ) AS n_px
      |FROM (SELECT doc_id AS media_id,
      |        CASE WHEN doc_id % 3 = 0 THEN 'png' ELSE 'bmp' END AS kind,
      |        8 + doc_id % 16 AS w, 8 + doc_id % 8 AS h
      |      FROM documents WHERE doc_id % 3 < 2), range(8) b
      |ORDER BY media_id, bin""".stripMargin

  val mediaFeaturesSql: String =
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
      |       WHEN 1 THEN 'bmp' ELSE 'wav' END AS kind,
      |  CASE WHEN doc_id % 3 = 2 THEN 200 + doc_id % 100
      |       ELSE (8 + doc_id % 16) * (8 + doc_id % 8) END AS n_units,
      |  CAST(CASE WHEN doc_id % 3 = 2 THEN
      |    (SELECT SUM((doc_id*131 + 11*i.range) % 65536 - 32768)
      |     FROM range(400) i WHERE i.range < 200 + doc_id % 100)
      |  ELSE
      |    (SELECT SUM((doc_id*31 + 7*i.range) % 256)
      |     FROM range(400) i
      |     WHERE i.range < (8 + doc_id % 16) * (8 + doc_id % 8))
      |  END AS BIGINT) AS unit_sum
      |FROM documents ORDER BY media_id""".stripMargin
}
