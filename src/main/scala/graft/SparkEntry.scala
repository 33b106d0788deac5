package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is one operator from SURVEY.md §2 (or a
  * north-star extension); [[oracleSql]] holds the DuckDB-equivalent SQL for
  * the hash-match correctness gate. Column names and aliases are kept
  * identical on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing"       -> Tpch.q1Pricing _,
    "q3_shipping"      -> Tpch.q3Shipping _,
    "q5_region"        -> Tpch.q5Region _,
    "q10_returned"     -> Tpch.q10Returned _,
    "s1_scan_range"    -> Events.scanRange _,
    "p5_filter_in"     -> Events.filterIn _,
    "a4_ohlcv_resample"-> Events.ohlcvResample _,
    "a2_sum_count"     -> Events.sumCount _,
    "j1_join_inner"    -> Relational.joinInner _,
    "j2_join_left"     -> Relational.joinLeft _,
    "j3_join_semi"     -> Relational.joinSemi _,
    "j4_join_anti"     -> Relational.joinAnti _,
    "j5_join_theta"    -> Relational.joinTheta _,
    "j7_join_range"    -> Relational.joinRange _,
    "a8_percentiles"   -> Relational.percentiles _,
    "j6_join_asof"     -> Windows.asofJoin _,
    "j8_join_asof_native" -> Windows.asofJoinNative _,
    "o1_topk"          -> Relational.topK _,
    "set1_union"       -> Relational.setUnion _,
    "set2_intersect"   -> Relational.setIntersect _,
    "set3_except"      -> Relational.setExcept _,
    "a5_rollup"        -> Relational.rollupAgg _,
    "a7_cube"          -> Relational.cubeAgg _,
    "a9_grouping_sets" -> Relational.groupingSetsAgg _,
    "a10_pivot"        -> Relational.pivotAgg _,
    "l1_explode"       -> Relational.explodeWords _,
    "q18_having"       -> Relational.havingAgg _,
    "sq1_scalar_subquery" -> Relational.scalarSubquery _,
    "a6_distinct"      -> Relational.distinctAgg _,
    "w1_window_rank"   -> Windows.windowRank _,
    "w2_window_lag"    -> Windows.windowLag _,
    "w3_window_moving" -> Windows.windowMoving _,
    "w4_sliding_window"-> Windows.slidingWindow _,
    "t1_token_count"   -> TextQueries.tokenCount _,
    "t2_quality"       -> TextQueries.quality _,
    "t3_langid"        -> TextQueries.langId _,
    "t4_fingerprint"   -> TextQueries.fingerprintQ _,
    "d1_exact_dedup"   -> DedupQueries.exactDedup _,
    "d2_minhash_lsh"   -> DedupQueries.minhashLsh _,
    "d3_simhash"       -> DedupQueries.simhashPairs _,
    "d4_ngram_jaccard" -> DedupQueries.ngramJaccard _,
    "d5_cosine_neardup"-> SimilarityQueries.cosineNearDup _,
    "sim1_topk_cosine" -> SimilarityQueries.topKCosine _,
    "sim2_lsh_ann"     -> SimilarityQueries.lshAnn _,
    "sim3_ivf_ann"     -> SimilarityQueries.ivfAnn _,
    "t5_bpe_tokens"    -> TextQueries.bpeTokens _,
    "t6_winnow"        -> TextQueries.winnow _,
    "f5_calendar"      -> Scalar.calendarQ _,
    "f4_currency"      -> Scalar.currencyQ _,
    "f7_json"          -> Scalar.jsonExtract _,
    "c1_symbols"       -> Scalar.symbolsQ _,
    "c2_minmax_ts"     -> Scalar.minMaxTs _,
    "a1_fold_aggregator" -> Scalar.foldAggregator _,
    "a1_fold_mappartitions" -> Scalar.foldMapPartitions _,
    "s5_ztable_roundtrip" -> Scalar.ztableRoundtrip _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing"        -> Tpch.q1Sql,
    "q3_shipping"       -> Tpch.q3Sql,
    "q5_region"         -> Tpch.q5Sql,
    "q10_returned"      -> Tpch.q10Sql,
    "s1_scan_range"     -> Events.scanRangeSql,
    "p5_filter_in"      -> Events.filterInSql,
    "a4_ohlcv_resample" -> Events.ohlcvResampleSql,
    "a2_sum_count"      -> Events.sumCountSql,
    "j1_join_inner"     -> Relational.joinInnerSql,
    "j2_join_left"      -> Relational.joinLeftSql,
    "j3_join_semi"      -> Relational.joinSemiSql,
    "j4_join_anti"      -> Relational.joinAntiSql,
    "j5_join_theta"     -> Relational.joinThetaSql,
    "j7_join_range"     -> Relational.joinRangeSql,
    "a8_percentiles"    -> Relational.percentilesSql,
    "j6_join_asof"      -> Windows.asofJoinSql,
    "j8_join_asof_native" -> Windows.asofJoinSql,
    "o1_topk"           -> Relational.topKSql,
    "set1_union"        -> Relational.setUnionSql,
    "set2_intersect"    -> Relational.setIntersectSql,
    "set3_except"       -> Relational.setExceptSql,
    "a5_rollup"         -> Relational.rollupAggSql,
    "a7_cube"           -> Relational.cubeAggSql,
    "a9_grouping_sets"  -> Relational.groupingSetsSql,
    "a10_pivot"         -> Relational.pivotAggSql,
    "l1_explode"        -> Relational.explodeWordsSql,
    "q18_having"        -> Relational.havingAggSql,
    "sq1_scalar_subquery" -> Relational.scalarSubquerySql,
    "a6_distinct"       -> Relational.distinctAggSql,
    "w1_window_rank"    -> Windows.windowRankSql,
    "w2_window_lag"     -> Windows.windowLagSql,
    "w3_window_moving"  -> Windows.windowMovingSql,
    "w4_sliding_window" -> Windows.slidingWindowSql,
    "t1_token_count"    -> TextQueries.tokenCountSql,
    "t2_quality"        -> TextQueries.qualitySql,
    "t3_langid"         -> TextQueries.langIdSql,
    "t4_fingerprint"    -> TextQueries.fingerprintSql,
    "t5_bpe_tokens"     -> TextQueries.bpeTokensSql,
    "d1_exact_dedup"    -> DedupQueries.exactDedupSql,
    "d2_minhash_lsh"    -> DedupQueries.jaccardPairsSql,
    "d4_ngram_jaccard"  -> DedupQueries.jaccardPairsSql,
    "d5_cosine_neardup" -> SimilarityQueries.cosineNearDupSql,
    "sim1_topk_cosine"  -> SimilarityQueries.topKCosineSql,
    "f5_calendar"       -> Scalar.calendarSql,
    "f7_json"           -> Scalar.jsonExtractSql,
    "c1_symbols"        -> Scalar.symbolsSql,
    "c2_minmax_ts"      -> Scalar.minMaxTsSql,
    "a1_fold_aggregator" -> Scalar.foldSql,
    "a1_fold_mappartitions" -> Scalar.foldMpSql,
    "s5_ztable_roundtrip" -> Scalar.ztableRoundtripSql,
    // d3_simhash, sim2_lsh_ann (xxhash64-based) and f4_currency
    // (sig-fig formatter) are not SQL-expressible → rows-only checks.
  )
}
