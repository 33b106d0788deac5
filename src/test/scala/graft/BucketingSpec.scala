package graft

import java.nio.file.Files

import graft.sources.Bucketing

/** The write-once-shuffle-never join: both facts bucketed+sorted on the
  * join key must sort-merge join with no exchange and no sort — at
  * 100 TB this is the difference between a full-cluster shuffle per
  * query and none. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with zero exchanges and zero sorts") {
    val dir = Files.createTempDirectory("graft_buckets").toString
    Bucketing.writeBucketed(Tables.lineitem(spark, sf001),
      "lineitem_b", s"$dir/lineitem_b", "l_orderkey", 8)
    Bucketing.writeBucketed(Tables.orders(spark, sf001),
      "orders_b", s"$dir/orders_b", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // one file per bucket (Bucketing repartitions on write) + this flag
      // lets the scan expose the written sort order and skip the sort
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val joined = Bucketing.table(spark, "lineitem_b")
        .join(Bucketing.table(spark, "orders_b"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!"Exchange hashpartitioning".r.findAllIn(plan).hasNext, plan)
      assert(!plan.contains("+- Sort "), plan)
      // and it actually returns the right cardinality
      assert(joined.count() ==
        Tables.lineitem(spark, sf001).join(Tables.orders(spark, sf001),
          org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.sql("DROP TABLE IF EXISTS orders_b")
    }
  }
}
