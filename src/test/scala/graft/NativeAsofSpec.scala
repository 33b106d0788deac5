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

  test("null keys and timestamps follow SQL semantics (no epoch-0 aliasing)") {
    // Right rows with a null ts/key must be dropped (a null ts unboxes to
    // 0L and would otherwise act as epoch 0); left rows with one are
    // emitted null-padded, never matched against other nulls.
    val left = Seq(
      (0L, Some(ts(10)), Some(1L)),
      (1L, None: Option[Timestamp], Some(1L)),
      (2L, Some(ts(10)), None: Option[Long])).toDF("id", "ts", "k")
    val right = Seq(
      (100L, Some(ts(5)), Some(1L), 1.0),
      (101L, None: Option[Timestamp], Some(1L), 99.0),  // null ts
      (102L, Some(ts(1)), None: Option[Long], 98.0))    // null key
      .toDF("rid", "r_ts", "rk", "v")
    val out = graft.plans.AsOfJoinNative
      .asof(left, right, "k", "rk", "ts", "r_ts", "rid")
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("v") == 1.0)  // only the non-null right row
    assert(out(1).isNullAt(out(1).fieldIndex("v")))  // null left ts
    assert(out(2).isNullAt(out(2).fieldIndex("v")))  // null left key
  }

  test("null TIE: native and composed implementations elect the same winner") {
    // among equal (key, ts) right rows, the composed AsOfJoin orders
    // the tiebreak asc_nulls_last and keeps the last — a null-tie row
    // beats any value. The native exec must agree (j8 shares j6's
    // oracle), so its tie sort is pinned NullsLast too.
    val left = Seq((0L, ts(10), 1L)).toDF("id", "ts", "k")
    val right = Seq(
      (Some(100L), ts(10), 1L, 5.0),
      (None: Option[Long], ts(10), 1L, 99.0)).toDF("rid", "r_ts", "rk", "v")
    val native = graft.plans.AsOfJoinNative
      .asof(left, right, "k", "rk", "ts", "r_ts", "rid").head.getAs[Double]("v")
    val composed = graft.operators.AsOfJoin
      .asof(left, right.withColumnRenamed("r_ts", "ts").withColumnRenamed("rk", "k"),
        "k", "ts", "ts", Seq("v"), "rid", "r_").head.getAs[Double]("r_v")
    assert(native == composed && native == 99.0)
  }

  test("mismatched key/ts types fail at plan time, not silently mid-job") {
    val left = Seq((0L, ts(10), 1)).toDF("id", "ts", "k") // k: Int
    val right = Seq((100L, ts(5), 1L, 1.0)).toDF("rid", "r_ts", "rk", "v") // rk: Long
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinNative.asof(left, right, "k", "rk", "ts", "r_ts", "rid")
    }
    assert(e.getMessage.contains("key types differ"))
    val e2 = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinNative.asof(
        left.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("date")),
        right, "id", "rid", "ts", "r_ts", "rid")
    }
    assert(e2.getMessage.contains("long/timestamp"))
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
