package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof picks latest right row at-or-before left ts, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A"),
      (2L, ts("2024-01-01 11:00:00"), "A"),
      (3L, ts("2024-01-01 09:00:00"), "B"))
      .toDF("id", "ts", "k")
    val right = Seq(
      (100L, ts("2024-01-01 09:30:00"), "A", 1.0),
      (101L, ts("2024-01-01 10:30:00"), "A", 2.0),
      (102L, ts("2024-01-01 12:00:00"), "B", 3.0))
      .toDF("rid", "ts", "k", "v")

    val out = AsOfJoin.asof(left, right, "k", "ts", "ts",
      Seq("v"), "rid", "r_").orderBy("id").collect()

    assert(out(0).getAs[Double]("r_v") == 1.0)       // 10:00 -> 09:30 row
    assert(out(1).getAs[Double]("r_v") == 2.0)       // 11:00 -> 10:30 row
    assert(out(2).getAs[Timestamp]("r_ts") == null)  // B: no right <= 09:00
  }

  test("equal timestamps are inclusive and ties break by highest tiebreak") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "A")).toDF("id", "ts", "k")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A", 10.0),
      (2L, ts("2024-01-01 10:00:00"), "A", 20.0))
      .toDF("rid", "ts", "k", "v")
    val out = AsOfJoin.asof(left, right, "k", "ts", "ts",
      Seq("v"), "rid", "r_").collect()
    assert(out.head.getAs[Double]("r_v") == 20.0)
  }

  test("tolerance nulls matches older than the staleness bound (inclusive)") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A"),  // match 1h old  -> kept
      (2L, ts("2024-01-01 12:00:00"), "A"),  // match 3h old  -> dropped
      (3L, ts("2024-01-01 11:00:00"), "A"))  // match exactly 2h old -> kept
      .toDF("id", "ts", "k")
    val right = Seq((100L, ts("2024-01-01 09:00:00"), "A", 5.0))
      .toDF("rid", "ts", "k", "v")
    val out = AsOfJoin.asof(left, right, "k", "ts", "ts",
        Seq("v"), "rid", "r_",
        toleranceMicros = Some(2L * 3600L * 1000000L))
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("r_v") == 5.0)
    assert(out(1).getAs[Any]("r_v") == null)
    assert(out(1).getAs[Any]("r_ts") == null)
    assert(out(2).getAs[Double]("r_v") == 5.0)
  }
}
