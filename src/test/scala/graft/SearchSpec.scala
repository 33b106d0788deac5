package graft

import graft.queries.{DedupQueries, PipelineQueries, SearchQueries}

/** Search + LM scoring + bloom decontamination + PII scrub (round-2 tail
  * surface). Each no-oracle-independent property is gated here; the
  * driver's DuckDB hash gate covers the exact values.
  */
class SearchSpec extends SparkSpec {

  test("bm25 returns ranked results with positive scores and a stable order") {
    val rows = SearchQueries.bm25(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sorted.reverse), "scores must be non-increasing")
    // ties broken by doc_id ascending
    val pairs = rows.map(r => (r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
    pairs.sliding(2).foreach {
      case Array((s1, d1), (s2, d2)) =>
        assert(s1 > s2 || (s1 == s2 && d1 < d2))
      case _ =>
    }
  }

  test("bm25 tf equals the explode-based posting-list count") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf001)
    // independent formulation: explode tokens, count 'spark' per doc
    val posting = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("t"))
      .where(col("t") === "spark")
      .groupBy("doc_id").count()
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
    val hof = docs
      .select(col("doc_id"),
        size(filter(split(lower(col("text")), " "), x => x === "spark")).as("tf"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("tf").toLong).toMap
    assert(hof.filter(_._2 > 0) == posting)
  }

  test("inverted index: serving equals the full-scan BM25 query; probe prunes buckets") {
    val viaScan = SearchQueries.bm25(spark, sf001).collect().toSeq
    val path = java.nio.file.Files.createTempDirectory("inv_idx_spec_").toString + "/idx"
    graft.operators.InvertedIndex.build(
      Tables.documents(spark, sf001), "doc_id", "text", path)
    val probe = graft.operators.InvertedIndex.search(
      spark, path, Seq("spark", "merge", "window"), k = 20)
    val plan = probe.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters"), plan)
    assert("bkt.* IN ".r.findFirstIn(plan).isDefined || plan.contains("bkt#"), plan)
    assert(probe.collect().toSeq == viaScan)
  }

  test("bigram LM: broadcast and shuffle-join plans agree after rounding") {
    val a = SearchQueries.bigramPpl(spark, sf001).collect().toSeq
    val b = SearchQueries.bigramPplViaShuffle(spark, sf001).collect().toSeq
    assert(a == b)
  }

  test("bigram LM nll is bounded by the add-one-smoothing worst case") {
    val rows = SearchQueries.bigramPpl(spark, sf001).collect()
    assert(rows.nonEmpty)
    // p >= 1/(max_cu + V) and p <= 1 => 0 <= nll <= ln(total_tokens + V)
    rows.foreach { r =>
      val nll = r.getAs[Double]("nll")
      assert(nll >= 0.0 && nll < 20.0)
      assert(r.getAs[Long]("n_bigrams") > 0)
    }
  }

  test("rrf fusion: blends both rankings, bounded lists, rank-1 docs dominate") {
    val out = graft.queries.SearchQueries.rrfFusion(spark, sf001).collect()
    assert(out.length == 20)
    // fused docs must come from at least one system, and a doc present
    // in BOTH lists outscores the same ranks seen singly
    out.foreach { r =>
      assert(r.getAs[Long]("rk_kw") > 0 || r.getAs[Long]("rk_vec") > 0)
      val expect = (if (r.getAs[Long]("rk_kw") > 0) 1.0 / (60 + r.getAs[Long]("rk_kw")) else 0.0) +
        (if (r.getAs[Long]("rk_vec") > 0) 1.0 / (60 + r.getAs[Long]("rk_vec")) else 0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-8)
    }
    // descending fused score with doc_id tiebreak
    val scores = out.map(r => (-r.getAs[Double]("rrf"), r.getAs[Long]("doc_id")))
    assert(scores.sameElements(scores.sorted), "not RRF-ordered")
    // both systems contribute to the fused top-20 on this corpus
    assert(out.exists(_.getAs[Long]("rk_kw") > 0))
    assert(out.exists(_.getAs[Long]("rk_vec") > 0))
  }

  test("ppl filter: ~thirds bucketing, thresholds honored, head is lowest-nll") {
    val out = graft.queries.PipelineQueries.pplFilter(spark, sf001).collect()
    val byBucket = out.groupBy(_.getAs[String]("bucket"))
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // buckets are nll-ordered intervals: max(head) <= min(middle) etc.
    def nlls(b: String) = byBucket(b).map(_.getAs[Double]("nll"))
    assert(nlls("head").max <= nlls("middle").min)
    assert(nlls("middle").max <= nlls("tail").min)
    // sample-calibrated thirds: each bucket holds a nontrivial share
    // (exact thirds only of the SAMPLE, so allow generous slack)
    val n = out.length.toDouble
    Seq("head", "middle", "tail").foreach { b =>
      val share = byBucket(b).length / n
      assert(share > 0.15 && share < 0.55, s"$b share $share")
    }
  }

  test("bloom decontamination equals the exact broadcast path at any fpp") {
    val exact = DedupQueries.decontaminate(spark, sf001).collect().toSeq
    val bloom = DedupQueries.bloomDecontaminate(spark, sf001).collect().toSeq
    assert(bloom == exact)
    // a deliberately awful fpp still verifies exactly
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf001)
    val sloppy = graft.operators.Dedup.bloomContamination(
        docs.where(col("doc_id") % 10 =!= 0), docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 8, thrNum = 1, thrDen = 2, fpp = 0.5)
      .select(col("id").as("doc_id"), col("n_shared"), col("n_grams"), col("frac_r"))
      .orderBy("doc_id").collect().toSeq
    assert(sloppy == exact)
  }

  test("pii scrub leaves no digits and counts every redaction") {
    val rows = PipelineQueries.piiScrub(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(!red.exists(_.isDigit), s"unredacted digits in: $red")
    }
    // every customer name carries exactly one digit run
    assert(rows.filter(_.getAs[String]("src") == "customer")
      .forall(_.getAs[Long]("n_hits") == 1L))
  }
}
