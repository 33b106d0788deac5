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

  test("ewma: recurrence exact per series, isolated across keys, layout-independent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = for (k <- Seq("a", "b", "c"); t <- 1 to 50)
      yield (k, t.toLong, (t * 7 % 13) + (if (k == "b") 100.0 else 0.0))
    // adversarial layout: series interleaved and split across partitions
    val df = rows.sortBy(_._2).toDF("k", "t", "x").repartition(7)
    val got = graft.operators.TimeSeries
      .ewma(df, Seq("k"), Seq("t"), "x", alpha = 0.25)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // driver-side reference fold
    val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
      var s = 0.0
      rs.sortBy(_._2).zipWithIndex.map { case ((_, t, x), i) =>
        s = if (i == 0) x else 0.25 * x + 0.75 * s
        (k, t) -> s
      }
    }
    assert(got.size == rows.size)
    want.foreach { case (key, v) =>
      assert(got(key) == v, s"mismatch at $key") // bitwise: exact binary alpha
    }
  }

  test("ewma and sampling handle empty and single-row inputs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val empty = Seq.empty[(String, Long, Double)].toDF("k", "t", "x")
    assert(graft.operators.TimeSeries
      .ewma(empty, Seq("k"), Seq("t"), "x", 0.25).count() == 0)
    assert(graft.operators.Sampling
      .topKPerGroup(empty.select(col("k"), col("t").as("id")),
        Seq("k"), md5(col("id").cast("string")), "id", 3).count() == 0)
    val one = Seq(("a", 1L, 7.0)).toDF("k", "t", "x")
    val r = graft.operators.TimeSeries
      .ewma(one, Seq("k"), Seq("t"), "x", 0.25).head()
    assert(r.getDouble(3) == 7.0) // y0 = x0
  }
}
