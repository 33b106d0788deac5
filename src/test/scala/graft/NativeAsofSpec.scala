package graft

import java.sql.Timestamp

class NativeAsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(t: Int) = new Timestamp(1700000000000L + t * 1000L)

  test("single left row, empty right") {
    val left = Seq((0L, ts(0), 0L)).toDF("id", "ts", "k")
    val right = Seq.empty[(Long, Timestamp, Long, Double)].toDF("rid", "r_ts", "rk", "v")
    val out = graft.plans.AsOfJoinNative
      .asof(left, right, "k", "rk", "ts", "r_ts", "rid").collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("v")))
  }

  test("basic match and tie") {
    val left = Seq((0L, ts(10), 1L), (1L, ts(5), 1L), (2L, ts(1), 2L)).toDF("id", "ts", "k")
    val right = Seq(
      (100L, ts(5), 1L, 1.0), (101L, ts(5), 1L, 2.0), (102L, ts(7), 1L, 3.0))
      .toDF("rid", "r_ts", "rk", "v")
    val out = graft.plans.AsOfJoinNative
      .asof(left, right, "k", "rk", "ts", "r_ts", "rid")
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("v") == 3.0)  // id 0 @10 -> rid 102 @7
    assert(out(1).getAs[Double]("v") == 2.0)  // id 1 @5 -> tie, max rid 101
    assert(out(2).isNullAt(out(2).fieldIndex("v"))) // k=2 no right
  }
}
