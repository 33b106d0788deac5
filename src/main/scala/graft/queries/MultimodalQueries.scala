package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.sources.Multimodal

/** Multimodal-column queries (north star), oracle-gated end to end. The
  * payloads are deterministic fakes (utf-8 text bytes — this container
  * has no codecs; see Multimodal's scaladoc), which is exactly what
  * makes a DuckDB oracle possible: every Spark mechanic in the path is
  * real — binary columns, struct metadata, typed Datasets, per-partition
  * mapPartitions feature extraction — while the "decode" is derivable
  * from the source text in SQL.
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

  /** M2: the per-partition feature-extraction path (mapPartitions,
    * decoder-per-partition shape). f0 = first byte-histogram bin. The
    * docs corpus is pure ASCII (byte == codepoint), so the oracle can
    * recompute the bin by counting chars with ord % 16 == 0 — among
    * the printable ASCII set those are exactly [ 0@P`p]. Both sides
    * divide in FLOAT (REAL cast in DuckDB), so the quotient is
    * bit-identical with no rounding at all. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
        Multimodal.fakeMediaFromDocs(Tables.documents(spark, dir))).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        element_at(col("features"), 1).cast(DoubleType).as("f0"))
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

  val mediaFeaturesSql: String =
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(CAST(len(regexp_extract_all(text, '[ 0@P`p]')) AS REAL)
      |       / CAST(length(text) AS REAL) AS DOUBLE) AS f0
      |FROM documents ORDER BY media_id""".stripMargin
}
