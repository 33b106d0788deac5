package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.TimeParse

class TimeParseSpec extends SparkSpec {
  import spark.implicits._

  test("parses integer nanos, RFC-3339, and plain dates (reference F1)") {
    val out = Seq(
      "1704103200000000000",          // 2024-01-01 10:00:00 UTC in nanos
      "2024-01-01T10:00:00",          // RFC-3339
      "2024-01-01 10:00:00",          // ISO-ish
      "2024-01-01")                   // %Y-%m-%d
      .toDF("s").select(TimeParse.parseTs(col("s")).as("ts"))
      .collect().map(_.getAs[Timestamp]("ts"))
    assert(out(0) == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(out(1) == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(out(2) == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(out(3) == Timestamp.valueOf("2024-01-01 00:00:00"))
  }

  test("garbage parses to null, not an exception") {
    val out = Seq("not a time").toDF("s")
      .select(TimeParse.parseTs(col("s")).as("ts")).collect()
    assert(out.head.isNullAt(0))
  }

  test("ns→µs truncation is exact beyond 2^53 (integral, not double, division)") {
    // Epoch nanos ~1.7e18 are not representable in double (ulp = 256 ns
    // there); `/ 1000` in Column algebra is double division and drifts by
    // ±1µs for some inputs. Sweep odd offsets and compare to exact Long div.
    val base = 1704103200000000000L
    val ns = (0 until 4096).map(i => base + i.toLong * 997L)
    val got = ns.toDF("ns")
      .select(col("ns"), unix_micros(TimeParse.nanosToTs(col("ns"))).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.foreach { n => assert(got(n) == n / 1000L, s"ns=$n") }
  }

  test("nanos roundtrip at microsecond fidelity") {
    val df = Seq(1704103200123456789L).toDF("ns")
    val back = df.select(TimeParse.tsToNanos(TimeParse.nanosToTs(col("ns"))).as("ns2"))
      .head.getLong(0)
    assert(back == 1704103200123456000L) // ns floored to µs, like DuckDB
  }
}
