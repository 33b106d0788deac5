package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis primitives for the training-data-pipeline surface
  * (north star in BASELINE.json): token counting, quality scoring,
  * language-ID heuristic, document fingerprinting.
  *
  * Everything is built from codegen'd Spark built-ins (regexp_extract_all,
  * split, md5, xxhash64) — no UDFs — so the expressions stay inside
  * whole-stage codegen and scale linearly with the scan. Each formula is
  * written in one fixed association order and mirrored verbatim in the
  * DuckDB oracle SQL so double arithmetic is bit-identical.
  */
object Text {

  /** Whitespace-token count: number of \S+ matches. */
  def nTokens(c: Column): Column =
    size(regexp_extract_all(c, lit("\\S+"), lit(0)))

  /** GPT-2-style pretokenizer regex (contractions, letter runs, digit
    * runs, punctuation runs, whitespace) — the "BPE-ish" token count. */
  val BPE_RE: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  def nBpeTokens(c: Column): Column =
    size(regexp_extract_all(c, lit(BPE_RE), lit(0)))

  /** Canonical form: lowercase, collapse whitespace, trim. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Content fingerprint = md5 of the canonical form (exact-dedup key). */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** 64-bit fingerprint for compact storage / bucketing. */
  def fingerprint64(c: Column): Column = xxhash64(normalize(c))

  /** Count of whole-word matches from a marker list. */
  def markerCount(c: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(c), lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /** Count of matches anywhere — for unsegmented scripts: `\b` is
    * ASCII-word-char based (in both engines), so `\b的\b` can never
    * match inside CJK text and a boundary-anchored count leaves the zh
    * branch dead. Occurrence count IS the signal for such scripts. */
  def markerCountAnywhere(c: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(c), lit("(" + words.mkString("|") + ")"), lit(0)))

  val EN = Seq("the", "and", "of", "to", "is")
  val ES = Seq("el", "la", "los", "que", "y")
  val DE = Seq("der", "die", "und", "nicht", "das")
  val FR = Seq("le", "les", "et", "une", "dans")
  val ZH = Seq("的", "是", "不")

  /** Winnowing document fingerprints (the rolling-hash fingerprint
    * family, per the MOSS winnowing scheme): hash every word k-gram,
    * slide a window of `w` consecutive k-gram hashes, keep each window's
    * minimum, dedupe. Near-duplicate documents share most fingerprints;
    * the selected set is position-robust (insertions shift at most the
    * windows they touch). Pure built-ins — scales as one shuffle-free
    * scan. */
  def winnowFingerprints(c: Column, k: Int = 3, w: Int = 4): Column =
    graft.plans.TextOps.winnow(split(lower(c), " "), k, w)

  /** Marker-vote language ID with a fixed tie-break order (en, es, de,
    * fr, zh). The container has no langid model; this is the classic
    * function-word heuristic, deterministic and oracle-expressible. */
  def langId(c: Column): Column = {
    val en = markerCount(c, EN); val es = markerCount(c, ES)
    val de = markerCount(c, DE); val fr = markerCount(c, FR)
    val zh = markerCountAnywhere(c, ZH) // CJK: no \b boundaries exist
    when(en >= es && en >= de && en >= fr && en >= zh, "en")
      .when(es >= de && es >= fr && es >= zh, "es")
      .when(de >= fr && de >= zh, "de")
      .when(fr >= zh, "fr")
      .otherwise("zh")
  }

  /** Heuristic quality score in [0,1]: stopword density + low punctuation
    * + length. Formula mirrored exactly in TextQueries oracle SQL. */
  def qualityScore(c: Column): Column = {
    val nChars = length(c).cast(DoubleType)
    val nTok = greatest(nTokens(c), lit(1)).cast(DoubleType)
    val nPunct = size(regexp_extract_all(c, lit("[.,;:!?]"), lit(0))).cast(DoubleType)
    val nStop = markerCount(c, Seq("the", "a", "an", "and", "of", "to", "in", "is", "it"))
      .cast(DoubleType)
    val stopRatio = nStop / nTok
    val punctRatio = nPunct / nChars
    lit(0.4) * least(stopRatio * lit(5.0), lit(1.0)) +
      lit(0.3) * (lit(1.0) - least(punctRatio * lit(20.0), lit(1.0))) +
      lit(0.3) * least(nTok / lit(100.0), lit(1.0))
  }
}
