package graft

import graft.functions.Fold
import graft.Tables

/** Dual-path consistency in the reference's style
  * (/root/reference/tests/main.rs: rust loop vs julia engine): the plain
  * DataFrame agg, the typed Aggregator, and the mapPartitions fold must
  * all agree exactly. */
class FoldSpec extends SparkSpec {

  test("aggregator == mapPartitions == DataFrame agg (exact)") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf001)
    val plain = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_val"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val agg = Fold.aggregatorSum(li, "l_returnflag", "l_quantity")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val mp = Fold.mapPartitionsSum(li, "l_returnflag", "l_quantity")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("sum_val")).toMap
    assert(agg == plain)
    assert(mp == plain)
  }
}
