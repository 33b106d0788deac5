package graft

import graft.queries.SqlSurface

/** Dual-face parity: every oracle SQL statement that is expressible in
  * Spark's dialect must produce BITWISE-identical rows to the DataFrame
  * API implementation of the same query. (The excluded names use
  * DuckDB-only functions — string_split, quantile_cont, time_bucket,
  * isodow, unnest, json_extract, list comprehensions — and are covered
  * against DuckDB itself by the driver's hash gate.)
  */
class SqlParitySpec extends SparkSpec {

  private val duckdbOnly = Set(
    "a8_percentiles", "d1_exact_dedup", "d2_minhash_lsh", "d4_ngram_jaccard",
    "d5_cosine_neardup", "f5_calendar", "f7_json", "l1_explode",
    "sim1_topk_cosine", "t1_token_count", "t2_quality", "t3_langid",
    "t4_fingerprint", "t5_bpe_tokens", "w4_sliding_window",
    // round-2 additions: list_transform/list_distinct (t7, pipe1),
    // UNNEST(range) lateral + list subscripts (sim4), 1-arg encode +
    // len-of-regexp-list (m1, m2), HUGEINT // division (pipe3),
    // list_cosine_similarity (sim5)
    "t7_repetition", "pipe1_quality_filter", "pipe3_token_pack",
    "sim4_centroids", "sim5_topk_batch", "m1_media_meta", "m2_media_features",
    // m5/m6/m7: correlated range() scans + `//` integer division
    "m5_resize_box", "m6_frame_sample", "m7_gray_hist",
    // d6: string_split + UNNEST(range) lateral
    "d6_decontaminate",
    // sim6/sim8/sim9/sim10 share sim1's list_cosine_similarity oracle;
    // d10's gate counts the exact pair set with it too
    "sim6_ivf_index", "sim8_rp_topk", "sim9_pq_topk", "sim10_ivfpq",
    "d10_semdedup",
    // pipe4/t8/d7 (+d9, sharing d7's SQL): UNNEST(range) lateral,
    // string_split, recursive CTE
    "pipe4_mixture", "t8_bpe_pairs", "d7_dedup_clusters", "d9_clusters_star",
    // d11: string_split + w[i:i+7] slice + UNNEST(range) lateral
    "d11_dup_spans",
    // pipe8: recursive CTE + string_split (d7's cluster rebuild)
    "pipe8_leakage_split",
    // a14: bare VARCHAR cast + DuckDB md5-over-string
    "a14_quantile_sketch",
    // round-2 tail: string_split/list_filter (search1, lm1, d8 shares
    // d6's SQL), 4-arg regexp_replace + len() (pipe5),
    // generate_series+unnest grid (a12); unnest vocab (t10, f8)
    "a12_ohlcv_dense", "t10_cms_heavy_hitters", "f8_edit_pairs",
    // cohort1: // integer division + date_diff arg order
    "cohort1_retention",
    "search1_bm25", "search2_inverted_index", "lm1_bigram_ppl",
    "d8_bloom_decontaminate", "pipe5_pii_scrub",
    // g1: // integer division; pipe7 composes pipe1's list_transform sig;
    // ts2: DuckDB puts IGNORE NULLS inside the call parens, Spark outside
    "g1_pagerank", "pipe7_end_to_end", "ts2_tick_rule",
    // round-3 gates: list_cosine_similarity/DOUBLE[] (sim2/sim3),
    // len-of-regexp-list (t9); the other new TRUE-flag gates (a11, d3,
    // t6, f4, sim7) are ANSI and stay in
    "sim2_lsh_ann", "sim3_ivf_ann", "t9_bpe_encode",
    // s6c: epoch_ns + TINYINT literals
    "s6c_native_fullwidth",
    // skew3: the hot series is deeper than Spark's WITH RECURSIVE
    // level limit (100); DuckDB recurses fine
    "skew3_ewma_hot",
    // round-4: unnest(generate_series) lateral + list slicing (pipe9),
    // unnest + '0x'-prefixed hex cast (pipe10), list_cosine_similarity
    // (sim11)
    "pipe9_chunk", "pipe10_dsir", "sim11_cluster_sample",
    // round-5: string_split (pipe11), list_filter +
    // list_cosine_similarity (search3)
    "pipe11_ppl_filter", "search3_rrf_fusion",
    // t11/d12: string_split + UNNEST(range) lateral (+ recursive CTE)
    "t11_boilerplate", "d12_canonical_keep",
    // pipe12: '0x'-prefixed hex cast (dq3's median SQL is ANSI, stays in)
    "pipe12_order_shard",
    // sim12 shares sim1's list_cosine_similarity oracle
    "sim12_sq_topk",
    // t13: len-of-regexp-list (t9's SQL shape)
    "t13_unigram_encode",
    // sim13: list_cosine_similarity filtered oracle
    "sim13_filtered_ann",
    // search4: string_split + list_filter lambda
    "search4_phrase",
    // round-6: d13 string_split + list(ORDER BY) + indexed list_filter
    // lambda; ml2 string_split + list_filter; d14/t14 string_split +
    // unnest (sim14's SQL is ANSI, stays in)
    "d13_span_remove", "ml2_text_classifier", "d14_source_overlap",
    "t14_lexical_stats",
    // pipe13: '0x'-prefixed hex cast + UBIGINT (pipe12's class);
    // a15: quantile_cont (a8's class)
    "pipe13_weighted_sample", "a15_approx_percentiles",
    // stream1: reuses pipe1's list_transform repetition signature
    // (and the query side is a streaming execution — the parity this
    // spec checks is covered batch-side by pipe1/pipe5)
    "stream1_curate")

  test("oracle SQL runs verbatim via spark.sql and matches the DataFrame API") {
    SqlSurface.registerViews(spark, sf001)
    val names = (SparkEntry.oracleSql.keySet -- duckdbOnly).toSeq.sorted
    assert(names.size >= 45, s"expected wide SQL-dialect overlap, got $names")
    val mismatches = names.flatMap { n =>
      val viaSql = spark.sql(SparkEntry.oracleSql(n)).collect().toSeq
      val viaApi = SparkEntry.queries(n)(spark, sf001).collect().toSeq
      if (viaSql == viaApi) None else Some(n)
    }
    assert(mismatches.isEmpty, s"SQL/DataFrame mismatch: $mismatches")
  }

  test("the read-only SQL door (SqlGate, r13) answers the whole Spark-dialect corpus bitwise-identically") {
    // Every statement the session-view face runs must come back
    // identical through the serving door's parse/gate/substitute path —
    // joins, EXISTS/IN subqueries, grouping sets, windows, CTEs all
    // cross the UnresolvedRelation rewrite here, so a substitution bug
    // (dropped alias, missed subquery, case issue) fails by NAME.
    SqlSurface.registerViews(spark, sf001)
    // events: the registered view pre-converts raw nanos to µs
    // timestamps (Tables.events); the door serves raw paths, so stage
    // the converted table once, as a server root would hold it
    val staged = java.nio.file.Files.createTempDirectory("sqlgate_ev_")
      .toString + "/events"
    Tables.events(spark, sf001).write.parquet(staged)
    val tmap = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
      .map(n => n -> s"$sf001/$n.parquet").toMap + ("events" -> staged)
    val names = (SparkEntry.oracleSql.keySet -- duckdbOnly).toSeq.sorted
    val mismatches = names.flatMap { n =>
      val viaGate = SqlGate.run(spark, SparkEntry.oracleSql(n), tmap)
        .collect().toSeq
      val viaSql = spark.sql(SparkEntry.oracleSql(n)).collect().toSeq
      if (viaGate == viaSql) None else Some(n)
    }
    assert(mismatches.isEmpty, s"SqlGate/spark.sql mismatch: $mismatches")
  }
}
