package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Ohlcv
import graft.sources.{ZPartitionBy, ZTable, ZTableSpec => Spec}

/** Golden-sums fixture in the reference's test style (FIXTURES.md F-1;
  * reference `tests/main.rs:84-151`): a seeded deterministic minute-bar
  * table, asserted two ways — a straight-line Scala loop (the "rust
  * oracle") vs the Spark engine — with f32 widened to f64 BEFORE summing,
  * matching the reference's accumulation order. */
case class Bar(ts: Timestamp, ticker: String, open: Float, high: Float,
    low: Float, close: Float, volume: Long)

class OhlcvFixtureSpec extends SparkSpec {
  import spark.implicits._

  // 1440 minutes * 3 days + 100 rows, seeded — small-scale mirror of the
  // reference's 86,500-row fixture (kept fast for CI; same structure).
  private lazy val rows: Seq[Bar] = {
    val rnd = new scala.util.Random(0)
    val tickers = Array("AAPL", "MSFT", "GOOG", "AMZN")
    val t0 = Timestamp.valueOf("2024-02-01 00:00:00").getTime
    (0 until (1440 * 3 + 100)).map { i =>
      Bar(new Timestamp(t0 + i * 60000L), tickers(rnd.nextInt(tickers.length)),
        rnd.nextFloat(), rnd.nextFloat(), rnd.nextFloat(), rnd.nextFloat(),
        (rnd.nextDouble() * 1e9).toLong)
    }
  }

  test("golden sums: spark agg == straight-line loop oracle (exact)") {
    val path = Files.createTempDirectory("ohlcv_fixture_").toString
    val t = ZTable.create(spark, path,
      Spec(partitionBy = ZPartitionBy.Day, resolutionMicros = Some(60L * 1000000)))
    t.append(rows.toDF())

    // oracle: sequential loop, f32 -> f64 widening before accumulate
    var sumOpen = 0.0; var sumClose = 0.0; var sumVol = 0L
    rows.foreach { b =>
      sumOpen += b.open.toDouble; sumClose += b.close.toDouble; sumVol += b.volume
    }

    // engine: same widening; single-partition sum to preserve order-free
    // exactness is NOT needed for volume (long) but doubles compare via
    // sorted-pairwise tolerance-free check against a decimal-free sum —
    // so assert volume and count exactly, doubles to 1e-6 relative.
    val r = t.df.agg(
      sum(col("open").cast("double")).as("so"),
      sum(col("close").cast("double")).as("sc"),
      sum(col("volume")).as("sv"),
      count(lit(1)).as("n")).head
    assert(r.getAs[Long]("sv") == sumVol)
    assert(r.getAs[Long]("n") == rows.length.toLong)
    assert(math.abs(r.getAs[Double]("so") - sumOpen) / sumOpen < 1e-9)
    assert(math.abs(r.getAs[Double]("sc") - sumClose) / sumClose < 1e-9)

    // resolution flooring: every ts on the 60 s grid
    assert(t.df.where(second(col("ts")) =!= 0).count() == 0)
  }

  test("ohlcv assemble: per-symbol sorted bar arrays + min/max ts") {
    val df = rows.toDF()
    val out = Ohlcv.assemble(df, "ticker", Seq("AAPL", "MSFT"),
      lit("2024-02-01 00:00:00").cast("timestamp"),
      lit("2024-02-01 06:00:00").cast("timestamp")).collect()
    assert(out.map(_.getAs[String]("ticker")).toSet == Set("AAPL", "MSFT"))
    out.foreach { r =>
      val bars = r.getSeq[org.apache.spark.sql.Row](1)
      val times = bars.map(_.getAs[Timestamp]("ts").getTime)
      assert(times == times.sorted, "bars must be time-ordered")
      assert(r.getAs[Timestamp]("min_ts").getTime == times.head)
      assert(r.getAs[Timestamp]("max_ts").getTime == times.last)
    }
  }

  test("resample honors high>=max(open,close), low<=min(open,close)") {
    val ticks = rows.toDF()
      .withColumn("event_id", monotonically_increasing_id())
    val bars = Ohlcv.resample(ticks, "ticker", "close", "volume", "event_id", "1 hour")
      .collect()
    bars.foreach { b =>
      val (o, h, l, c) = (b.getAs[Float]("open"), b.getAs[Float]("high"),
        b.getAs[Float]("low"), b.getAs[Float]("close"))
      assert(h >= math.max(o, c) && l <= math.min(o, c))
    }
  }
}
