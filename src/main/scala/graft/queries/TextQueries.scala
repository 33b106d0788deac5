package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables
import graft.functions.Text

/** Text-analysis queries over `documents` (north-star surface): token
  * counting, quality scoring, language ID, content fingerprinting. All
  * pure codegen'd expressions over a single scan — at 100 TB these are
  * embarrassingly parallel with no shuffle at all (except final sort,
  * which only exists for oracle determinism).
  */
object TextQueries {

  /** T1: token + char counts per document. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast(LongType).as("n_chars_calc"),
        Text.nTokens(col("text")).cast(LongType).as("n_tokens"))
      .orderBy("doc_id")

  val tokenCountSql: String =
    """SELECT doc_id, lang,
      |  CAST(length(text) AS BIGINT) AS n_chars_calc,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** T2: heuristic quality score (formula mirrored in SQL verbatim). */
  def quality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        Text.nTokens(col("text")).cast(LongType).as("n_tokens"),
        Text.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  val qualitySql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
      |  0.4 * LEAST((CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
      |              / CAST(GREATEST(len(regexp_extract_all(text, '\S+')), 1) AS DOUBLE)) * 5.0, 1.0)
      |  + 0.3 * (1.0 - LEAST((CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
      |              / CAST(length(text) AS DOUBLE)) * 20.0, 1.0))
      |  + 0.3 * LEAST(CAST(GREATEST(len(regexp_extract_all(text, '\S+')), 1) AS DOUBLE) / 100.0, 1.0) AS quality
      |FROM documents ORDER BY doc_id""".stripMargin

  /** T3: marker-vote language ID vs the labeled lang column. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), Text.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  val langIdSql: String =
    """WITH s AS (SELECT doc_id, lang,
      |  len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) AS en,
      |  len(regexp_extract_all(lower(text), '\b(el|la|los|que|y)\b')) AS es,
      |  len(regexp_extract_all(lower(text), '\b(der|die|und|nicht|das)\b')) AS de,
      |  len(regexp_extract_all(lower(text), '\b(le|les|et|une|dans)\b')) AS fr,
      |  len(regexp_extract_all(lower(text), '(的|是|不)')) AS zh
      |FROM documents)
      |SELECT doc_id, lang,
      |  CASE WHEN en >= es AND en >= de AND en >= fr AND en >= zh THEN 'en'
      |       WHEN es >= de AND es >= fr AND es >= zh THEN 'es'
      |       WHEN de >= fr AND de >= zh THEN 'de'
      |       WHEN fr >= zh THEN 'fr'
      |       ELSE 'zh' END AS lang_pred
      |FROM s ORDER BY doc_id""".stripMargin

  /** T5: BPE-ish token counting (GPT-2 pretokenizer regex). */
  def bpeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        Text.nBpeTokens(col("text")).cast(LongType).as("n_bpe"),
        Text.nTokens(col("text")).cast(LongType).as("n_ws"))
      .orderBy("doc_id")

  val bpeTokensSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text,
      |    '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) AS BIGINT) AS n_bpe,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws
      |FROM documents ORDER BY doc_id""".stripMargin

  /** T6: winnowing rolling-hash fingerprints. The hashes themselves are
    * not SQL-expressible, so the oracle gate is the t10 TRUE-flag trick:
    * every document's single-pass expression result is compared against
    * [[graft.functions.CrossCheck.winnowRef]] (an independent
    * collections reimplementation) and the DuckDB side asserts the
    * per-document parity flag as literal TRUE — the hash gate fails iff
    * any document's fingerprints diverge. A structural bound (#fps <=
    * #k-grams, which IS SQL-derivable) rides along as a second flag. */
  def winnow(spark: SparkSession, dir: String): DataFrame = {
    val refUdf = udf((text: String) => graft.functions.CrossCheck.winnowRef(text, 3, 4))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        Text.winnowFingerprints(col("text")).as("fps"))
      .select(col("doc_id"),
        (col("fps") === refUdf(col("text"))).as("winnow_parity_ok"),
        (size(col("fps")) <= greatest(
          size(split(col("text"), " ", -1)) - lit(2), lit(0))).as("winnow_bound_ok"))
      .orderBy("doc_id")
  }

  val winnowSql: String =
    """SELECT doc_id, TRUE AS winnow_parity_ok, TRUE AS winnow_bound_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  /** T7: duplicated word-3-gram repetition stats — the RefinedWeb/C4
    * repetition filter signal. One single-pass expression per row
    * (plans.RepetitionStats): no explode, no shuffle; the counts stay
    * integers so the ratio divides identically in both engines. */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.plans.TextOps.repetitionStats(
          regexp_extract_all(col("text"), lit("\\S+"), lit(0)), 3).as("r"))
      .select(col("doc_id"),
        col("r.n_grams").as("n_grams"),
        (col("r.n_grams") - col("r.n_distinct")).as("n_dup"),
        round((col("r.n_grams") - col("r.n_distinct")).cast(DoubleType) /
          greatest(col("r.n_grams"), lit(1L)).cast(DoubleType), 6).as("dup_ratio"))
      .orderBy("doc_id")

  val repetitionSql: String =
    """WITH g AS (
      |  SELECT doc_id,
      |    list_transform(range(1, greatest(len(l)-1, 1)),
      |                   i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS grams
      |  FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS l FROM documents)
      |)
      |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
      |  CAST(len(grams) - len(list_distinct(grams)) AS BIGINT) AS n_dup,
      |  round(CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
      |        / greatest(len(grams), 1), 6) AS dup_ratio
      |FROM g ORDER BY doc_id""".stripMargin

  /** T8: corpus-wide character-pair statistics — the scoring pass of BPE
    * vocabulary learning (each merge step picks the most frequent
    * adjacent pair; this is that ranking, distributed). Two explodes +
    * one count shuffle whose cardinality is the SYMBOL-PAIR space (a few
    * hundred for lowercase ASCII), not the corpus — the shape that lets
    * a 100 TB corpus vote on a tokenizer. */
  def bpePairs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .select(col("w"), explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substr(w, i, 2)").as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(50)

  val bpePairsSql: String =
    """WITH tok AS (
      |  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
      |), p AS (
      |  SELECT substr(w, CAST(t.i AS INT), 2) AS pair
      |  FROM tok, UNNEST(range(1, length(w))) AS t(i)
      |  WHERE length(w) >= 2
      |)
      |SELECT pair, COUNT(*) AS n FROM p
      |GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin

  /** T9: full BPE tokenize — learn a 30-merge table from the corpus
    * word histogram (one distributed count + driver-side Sennrich loop,
    * graft.functions.Bpe), then apply it map-side per document. The
    * learned segmentation is iterative + histogram-dependent, so not
    * SQL-expressible; the oracle gate emits (a) the SQL-derivable word
    * and non-space char counts, (b) `bpe_parity_ok`: the expression's
    * count equals [[graft.functions.CrossCheck.bpeCountRef]] (an
    * independently coded greedy encoder), and (c) `bpe_bounds_ok`: the
    * structural invariant n_words <= n_bpe <= n_chars_nospace. DuckDB
    * asserts both flags as literal TRUE. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = graft.functions.Bpe.learn(docs, "text", numMerges = 30)
    val rank = merges.zipWithIndex.toMap
    val refUdf = udf((text: String) => graft.functions.CrossCheck.bpeCountRef(text, rank))
    docs.select(col("doc_id"), col("text"),
        graft.functions.Bpe.encodeCount(split(lower(col("text")), " "), merges)
          .as("n_bpe"),
        Text.nTokens(col("text")).cast(LongType).as("n_words"),
        length(regexp_replace(col("text"), " ", "")).cast(LongType)
          .as("n_chars_nospace"))
      .select(col("doc_id"), col("n_words"), col("n_chars_nospace"),
        (col("n_bpe") === refUdf(col("text"))).as("bpe_parity_ok"),
        (col("n_words") <= col("n_bpe") && col("n_bpe") <= col("n_chars_nospace"))
          .as("bpe_bounds_ok"))
      .orderBy("doc_id")
  }

  val bpeEncodeSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
      |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_nospace,
      |  TRUE AS bpe_parity_ok, TRUE AS bpe_bounds_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  /** T13: UNIGRAM-LM tokenize (SentencePiece's alternative to BPE) —
    * learn a 200-piece inventory from the corpus word histogram (one
    * distributed count + driver EM over the histogram,
    * graft.functions.Unigram), then Viterbi-segment every document
    * map-side. Learned probabilities are iterative float math → not
    * SQL-expressible; the gate mirrors t9's: SQL-derivable word and
    * char counts plus (a) `uni_parity_ok` — the expression's count
    * equals [[graft.functions.CrossCheck.unigramCountRef]] (an
    * independent memoized-recursion Viterbi), and (b) `uni_bounds_ok`
    * — n_words <= n_pieces <= n_chars_nospace. DuckDB asserts both
    * flags as literal TRUE. */
  def unigramEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val model = graft.functions.Unigram.learn(docs, "text", vocabSize = 200)
    val refUdf = udf((text: String) =>
      graft.functions.CrossCheck.unigramCountRef(text, model))
    docs.select(col("doc_id"), col("text"),
        graft.functions.Unigram.encodeCount(split(lower(col("text")), " "), model)
          .as("n_uni"),
        Text.nTokens(col("text")).cast(LongType).as("n_words"),
        length(regexp_replace(col("text"), " ", "")).cast(LongType)
          .as("n_chars_nospace"))
      .select(col("doc_id"), col("n_words"), col("n_chars_nospace"),
        (col("n_uni") === refUdf(col("text"))).as("uni_parity_ok"),
        (col("n_words") <= col("n_uni") && col("n_uni") <= col("n_chars_nospace"))
          .as("uni_bounds_ok"))
      .orderBy("doc_id")
  }

  val unigramEncodeSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
      |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_nospace,
      |  TRUE AS uni_parity_ok, TRUE AS uni_bounds_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  /** T10: heavy hitters through a COUNT-MIN SKETCH — completes the
    * sketch family (HLL a11, MinHash d2, SimHash d3, Bloom d8, winnow
    * t6). The sketch folds distributively (mergeable per-partition
    * buffers); the top-10 exact counts ride a word-count aggregation.
    * The ORACLE TRICK: the output carries `cms_ok` = (exact <= estimate
    * <= exact + eps*N) — the CMS guarantee — and the DuckDB side emits
    * literal TRUE, so the driver's hash gate fails iff the sketch ever
    * violates its error bound. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .where(length(col("w")) > 0)
    val cms = tok.stat.countMinSketch("w", eps = 0.0001, confidence = 0.99, seed = 42)
    val top = tok.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(10).collect()
    top.map { r =>
      val (w, n) = (r.getString(0), r.getLong(1))
      val est = cms.estimateCount(w)
      (w, n, est >= n && est <= n + (0.0001 * cms.totalCount()).ceil.toLong)
    }.toSeq.toDF("w", "n", "cms_ok")
      .orderBy(col("n").desc, col("w"))
  }

  val heavyHittersSql: String =
    """SELECT w, n, true AS cms_ok FROM (
      |  SELECT w, COUNT(*) AS n
      |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      |  WHERE length(w) > 0 GROUP BY w)
      |ORDER BY n DESC, w LIMIT 10""".stripMargin

  /** F8: spelling-variant pairs — distinct corpus words within edit
    * distance 2 (typo/inflection clustering, the string-similarity leg
    * of the dedup family). The self-join is VOCABULARY-sized (bounded,
    * not corpus-sized) — at a web-scale vocabulary you'd block on
    * (length, first char) before the quadratic compare; here the plain
    * theta join is honest for a bounded dictionary. */
  def editPairs(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .where(length(col("w")) > 0).distinct()
    vocab.select(col("w").as("wa"))
      .join(vocab.select(col("w").as("wb")), col("wa") < col("wb"))
      .where(levenshtein(col("wa"), col("wb")) <= 2)
      .select(col("wa"), col("wb"),
        levenshtein(col("wa"), col("wb")).cast(LongType).as("dist"))
      .orderBy("wa", "wb")
  }

  val editPairsSql: String =
    """WITH v AS (SELECT DISTINCT w
      |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      |  WHERE length(w) > 0)
      |SELECT a.w AS wa, b.w AS wb, CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
      |FROM v a JOIN v b ON a.w < b.w
      |WHERE levenshtein(a.w, b.w) <= 2
      |ORDER BY wa, wb""".stripMargin

  /** T4: md5 content fingerprint of the canonical text form. */
  def fingerprintQ(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  val fingerprintSql: String =
    """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** T14: PER-SOURCE LEXICAL PROFILE — the corpus-health report a
    * multi-source mix is tuned against: vocabulary size (distinct
    * types), token volume, hapax count (frequency-1 types — the Zipf
    * tail; collapsing hapax share flags boilerplate/templated sources),
    * and top-10 type mass (head concentration — the Zipf head; a
    * too-heavy head flags chrome/navigation text). All INTEGER outputs
    * by construction, so the cross-engine gate is exact with no float
    * rounding surface at all (the t11 lesson, applied at design time).
    *
    * Scale shape: one explode + a map-side-combined (source, term)
    * count — the shuffle carries term-frequency rows (vocab-sized per
    * source, never corpus-row-sized); the ranking window partitions by
    * source over those same vocab-sized rows. Linear in token count. */
  def lexicalStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(spark, dir)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("t"))
      .where(col("t") =!= "")
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("f"))
    val topMass = tf
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("f").desc, col("t"))))
      .where(col("rk") <= 10)
      .groupBy(col("source")).agg(sum(col("f")).as("top10_mass"))
    tf.groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("f")).as("n_tokens"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .join(topMass, Seq("source"))
      .orderBy("source")
  }

  val lexicalStatsSql: String =
    """WITH tok AS (SELECT source, unnest(string_split(lower(text), ' ')) AS t
      |             FROM documents),
      |tf AS (SELECT source, t, COUNT(*) AS f FROM tok WHERE t <> ''
      |       GROUP BY 1, 2),
      |top AS (SELECT source, SUM(f) AS top10_mass FROM (
      |          SELECT source, f,
      |            row_number() OVER (PARTITION BY source
      |                               ORDER BY f DESC, t) AS rk
      |          FROM tf) WHERE rk <= 10 GROUP BY source)
      |SELECT tf.source, CAST(COUNT(*) AS BIGINT) AS n_types,
      |  CAST(SUM(f) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  CAST(ANY_VALUE(top.top10_mass) AS BIGINT) AS top10_mass
      |FROM tf JOIN top ON tf.source = top.source
      |GROUP BY tf.source ORDER BY tf.source""".stripMargin
}
