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
  )
}
