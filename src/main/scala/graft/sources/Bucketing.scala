package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) table layout — the 100 TB path for fact⋈fact
  * joins.
  *
  * The reference co-locates by construction: one shared symbol dictionary
  * and identical partition grids across tables (`src/schema.rs:31`,
  * `src/table/read.rs:13-23`) mean two tables agree on key layout without
  * any runtime movement. Spark's equivalent is bucketing: write both
  * facts bucketed and sorted on the join key, and the sort-merge join
  * plans with ZERO exchanges and zero per-query sorts — the shuffle is
  * paid once at write time, amortized over every subsequent join.
  * BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table registered
    * in the session catalog at an explicit path (external table, so data
    * lives where all other graft tables live). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    // repartition on the bucket key first: one file per bucket (instead
    // of inputPartitions x buckets small files), which is also what lets
    // the scan trust sortBy order and elide the per-query sort
    df.repartition(buckets, df.col(key))
      .write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the catalog,
    * so this must go through the table name, not the path). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
