package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables

/** Corpus search + language-model scoring (north star): BM25 keyword
  * retrieval and a corpus-trained bigram-LM perplexity signal — the two
  * remaining "query the training corpus" surfaces after ANN (sim*) and
  * n-gram overlap (d*).
  *
  * Scale design:
  *  - BM25 computes per-term tf MAP-SIDE from the token array (the query
  *    term list is a handful of literals — no explode, no posting-list
  *    shuffle); the only aggregates are a one-row corpus-stats row
  *    (N, avg length, per-term df) that broadcasts back, and the final
  *    TakeOrdered top-k. At 100 TB the stats row is index-time metadata;
  *    the scoring pass stays one scan with zero data-sized shuffles.
  *  - The bigram LM's count tables are corpus-level aggregates over a
  *    BOUNDED vocabulary (vocab² keys at most, ~1k here), so training is
  *    one map-side-combined count shuffle whose output is model-sized,
  *    not corpus-sized, and scoring joins the broadcast model map-side.
  *    An unbounded-vocab corpus would swap the broadcasts for hash joins
  *    keyed on the gram — same plan shape, still linear.
  */
object SearchQueries {

  private val Terms = Seq("spark", "merge", "window")
  private val K1 = 1.2
  private val B = 0.75

  /** SEARCH1: BM25 top-20 documents for a fixed 3-term query.
    * Robertson/Spärck Jones BM25 with k1=1.2, b=0.75; idf is the
    * "+1" variant (Lucene-style, always positive). Score rounded to 6dp
    * on both sides; the formula is written with identical operation
    * order in SQL so the doubles agree bitwise before rounding. */
  def bm25(spark: SparkSession, dir: String): DataFrame =
    bm25Scored(spark, dir)
      .select(col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)

  val bm25Sql: String = {
    val tfCols = Terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE) AS tf$i" }.mkString(",\n      |    ")
    val dfCols = Terms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val score = Terms.indices.map(i =>
      s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * (tf$i * ${K1 + 1.0}) / " +
        s"(tf$i + $K1 * (1.0 - $B + $B * len / avglen))").mkString("\n      |    + ")
    s"""WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       |t AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS len,
       |    $tfCols
       |  FROM tok),
       |s AS (SELECT COUNT(*) AS n, AVG(len) AS avglen, $dfCols FROM t)
       |SELECT doc_id, round(
       |    $score, 6) AS score
       |FROM t CROSS JOIN s
       |WHERE tf0 + tf1 + tf2 > 0
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  /** SEARCH2: the same BM25 query answered from a PERSISTED inverted
    * index (term-hash-bucketed posting lists + stats sidecar) — build
    * once, probe the query terms' buckets via partition pruning. Shares
    * search1's oracle: index serving must reproduce the full-scan
    * results exactly. */
  def invertedIndexSearch(spark: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("graft_inv_q_")
      .toString + "/idx"
    graft.operators.InvertedIndex.build(
      Tables.documents(spark, dir), "doc_id", "text", path)
    graft.operators.InvertedIndex.search(spark, path, Terms, k = 20,
      k1 = K1, b = B)
  }

  /** SEARCH3: HYBRID retrieval — reciprocal-rank fusion (Cormack et
    * al., SIGIR'09) of the BM25 keyword ranking and the embedding-cosine
    * ranking, the standard two-tower serving combine (every RAG /
    * curation stack fuses sparse + dense exactly this way; RRF needs no
    * score calibration between the two systems, only ranks).
    *
    * Per system: top-[[FuseDepth]] list, rank = row_number over the
    * 6dp-ROUNDED score (rounding first makes ranks engine-stable — the
    * sim11 argmax trick applied to ranking); embeddings pair with
    * documents by id (vec_id ≙ doc_id). Fusion: full outer join of the
    * two bounded lists, score = Σ 1/(60 + rank) over the lists the doc
    * appears in (60 is the paper's k), top-20 by (6dp-rounded fused
    * score, doc_id).
    *
    * Scale shape: each system contributes a TakeOrdered(FuseDepth) off
    * its own scan — BM25 map-side tf + broadcast stats (search1's plan),
    * cosine map-side dot vs a broadcast query vector (sim1's plan). The
    * fusion join touches 2×FuseDepth rows — output-sized, never the
    * corpus. At 100 TB both lists come from their serving indexes
    * (search2's inverted index, sim10's IVF-PQ) with identical fusion. */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kw = bm25Scored(spark, dir)
      .select(col("doc_id"), round(col("score"), 6).as("s"))
      .orderBy(col("s").desc, col("doc_id")).limit(FuseDepth)
      .withColumn("rk_kw",
        row_number().over(Window.orderBy(col("s").desc, col("doc_id"))))
      .select(col("doc_id"), col("rk_kw"))
    val emb = Tables.embeddings(spark, dir)
    val vec = graft.operators.Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", queryId = 0L, k = FuseDepth)
      .select(col("id").as("doc_id"), round(col("cos"), 6).as("c"))
      .orderBy(col("c").desc, col("doc_id")).limit(FuseDepth)
      .withColumn("rk_vec",
        row_number().over(Window.orderBy(col("c").desc, col("doc_id"))))
      .select(col("doc_id"), col("rk_vec"))
    kw.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(coalesce(lit(1.0) / (lit(RrfK) + col("rk_kw")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("rk_vec")), lit(0.0)), 8).as("rrf"),
        coalesce(col("rk_kw"), lit(0)).cast(LongType).as("rk_kw"),
        coalesce(col("rk_vec"), lit(0)).cast(LongType).as("rk_vec"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  private val FuseDepth = 100
  private val RrfK = 60

  /** search1's scored corpus (doc_id, score) before top-k — shared by
    * [[bm25]] and [[rrfFusion]] so the two stay one formula. */
  private def bm25Scored(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .select(col("doc_id") +: size(col("w")).cast(DoubleType).as("len") +:
        Terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("w"), x => x === t)).cast(DoubleType).as(s"tf$i")
        }: _*)
    val statCols = count(lit(1)).as("n") +: avg(col("len")).as("avglen") +:
      Terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = tf.agg(statCols.head, statCols.tail: _*)
    val score: Column = Terms.indices.map { i =>
      val idf = log((col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5) + 1.0)
      idf * (col(s"tf$i") * (K1 + 1.0)) /
        (col(s"tf$i") + lit(K1) * (lit(1.0 - B) + lit(B) * col("len") / col("avglen")))
    }.reduce(_ + _)
    tf.crossJoin(broadcast(stats))
      .where(Terms.indices.map(i => col(s"tf$i")).reduce(_ + _) > 0)
      .select(col("doc_id"), score.as("score"))
  }

  val rrfFusionSql: String = {
    val tfCols = Terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE) AS tf$i" }.mkString(",\n      |    ")
    val dfCols = Terms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val score = Terms.indices.map(i =>
      s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * (tf$i * ${K1 + 1.0}) / " +
        s"(tf$i + $K1 * (1.0 - $B + $B * len / avglen))").mkString("\n      |    + ")
    s"""WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
       |t AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS len,
       |    $tfCols
       |  FROM tok),
       |s AS (SELECT COUNT(*) AS n, AVG(len) AS avglen, $dfCols FROM t),
       |kw0 AS (SELECT doc_id, round(
       |    $score, 6) AS sc
       |  FROM t CROSS JOIN s WHERE tf0 + tf1 + tf2 > 0
       |  ORDER BY sc DESC, doc_id LIMIT $FuseDepth),
       |kw AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY sc DESC, doc_id) AS rk_kw FROM kw0),
       |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
       |vec0 AS (SELECT e.vec_id AS doc_id,
       |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS c
       |  FROM embeddings e, q WHERE e.vec_id <> 0
       |  ORDER BY c DESC, doc_id LIMIT $FuseDepth),
       |vec AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY c DESC, doc_id) AS rk_vec FROM vec0)
       |SELECT COALESCE(kw.doc_id, vec.doc_id) AS doc_id,
       |  round(COALESCE(CAST(1.0 AS DOUBLE) / ($RrfK + rk_kw), 0) +
       |        COALESCE(CAST(1.0 AS DOUBLE) / ($RrfK + rk_vec), 0), 8) AS rrf,
       |  COALESCE(rk_kw, 0) AS rk_kw, COALESCE(rk_vec, 0) AS rk_vec
       |FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id
       |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
  }

  /** LM1: corpus-trained bigram language model, add-one smoothing —
    * per-document average negative log-likelihood (the KenLM-style
    * perplexity quality signal: high nll = out-of-distribution text).
    * p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V); nll = avg(-ln p) over the
    * document's bigrams. Counts stay integers until the one division, so
    * both engines divide identical values. */
  def bigramPpl(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    val big = tok.where(size(col("w")) >= 2)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), size(col("w")) - 1)).as("i"))
      .select(col("doc_id"), element_at(col("w"), col("i")).as("w1"),
        element_at(col("w"), col("i") + 1).as("w2"))
    val uni = tok.select(explode(col("w")).as("wd"))
      .groupBy(col("wd")).agg(count(lit(1)).as("cu"))
    val bc = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val v = uni.agg(count(lit(1)).as("v"))
    big
      .join(broadcast(bc), Seq("w1", "w2"))
      .join(broadcast(uni.withColumnRenamed("wd", "w1")), Seq("w1"))
      .crossJoin(broadcast(v))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        round(avg(-log((col("cb") + lit(1.0)) / (col("cu") + col("v")))), 6).as("nll"))
      .orderBy("doc_id")
  }

  val bigramPplSql: String =
    """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |big AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      |        FROM tok, UNNEST(range(1, len(w))) AS u(i) WHERE len(w) >= 2),
      |uni AS (SELECT wd, COUNT(*) AS cu
      |        FROM (SELECT unnest(w) AS wd FROM tok) GROUP BY wd),
      |bc AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY 1, 2),
      |v AS (SELECT COUNT(*) AS v FROM uni)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  round(AVG(-ln((cb + 1.0) / (cu + v))), 6) AS nll
      |FROM big JOIN bc USING (w1, w2) JOIN uni ON big.w1 = uni.wd CROSS JOIN v
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Test-only reference for LM1: same model, scored through shuffle
    * joins (no broadcast hints) — gates that the broadcast plan and the
    * shuffle plan agree bitwise. */
  private[graft] def bigramPplViaShuffle(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    val big = tok.where(size(col("w")) >= 2)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), size(col("w")) - 1)).as("i"))
      .select(col("doc_id"), element_at(col("w"), col("i")).as("w1"),
        element_at(col("w"), col("i") + 1).as("w2"))
    val uni = tok.select(explode(col("w")).as("wd"))
      .groupBy(col("wd")).agg(count(lit(1)).as("cu"))
    val bc = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val v = uni.agg(count(lit(1)).as("v"))
    big.join(bc.hint("shuffle_hash"), Seq("w1", "w2"))
      .join(uni.withColumnRenamed("wd", "w1").hint("shuffle_hash"), Seq("w1"))
      .crossJoin(v)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        round(avg(-log((col("cb") + lit(1.0)) / (col("cu") + col("v")))), 6).as("nll"))
      .orderBy("doc_id")
  }

  /** SEARCH4: PHRASE search ("fast table" at consecutive positions)
    * served from the POSITIONAL inverted index
    * (InvertedIndex.buildPositional/phraseSearch — Lucene's posting
    * layout): the scan prunes to the query terms' hash-bucket
    * partitions, and matching is posting-list intersection on shifted
    * positions — bounded by the terms' document frequencies, never a
    * corpus scan. The oracle recomputes phrase occurrences directly
    * from the text, so the gate proves index build + intersection
    * serve exactly what the definition says. */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory("graft_posidx_")
      .toString + "/idx"
    graft.operators.InvertedIndex.buildPositional(
      Tables.documents(spark, dir), "doc_id", "text", path)
    graft.operators.InvertedIndex.phraseSearch(spark, path,
        Seq("fast", "table"), k = 20)
      .orderBy(col("phrase_tf").desc, col("doc_id"))
  }

  val phraseSearchSql: String =
    """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |m AS (SELECT doc_id,
      |        len(list_filter(range(1, len(w)),
      |            i -> w[i] = 'fast' AND w[i+1] = 'table')) AS tf
      |      FROM tok)
      |SELECT doc_id, CAST(tf AS BIGINT) AS phrase_tf
      |FROM m WHERE tf > 0
      |ORDER BY tf DESC, doc_id LIMIT 20""".stripMargin
}
