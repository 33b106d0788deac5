package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Event, Ingest}
import graft.sources.ZTableSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(id: Long, t: String, typ: String, v: Double) =
    Event(id, ts(t), id % 10, typ, v)

  test("streaming ingest writes date-partitioned parquet (AvailableNow)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      ev(1, "2024-01-01 10:00:01", "click", 1.0),
      ev(2, "2024-01-02 10:00:02", "click", 2.0))
    val out = Files.createTempDirectory("stream_out_").toString
    val ckpt = Files.createTempDirectory("stream_ckpt_").toString
    val q = Ingest.ingestStream(mem.toDF(), out, ckpt, ZTableSpec())
    q.awaitTermination(60000)
    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    assert(back.select("p_date").distinct().count() == 2)
  }

  test("streaming OHLCV bars after watermark close") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Ingest.streamingOhlcv(mem.toDF(), "1 minute", "0 seconds")
      .writeStream.format("memory").queryName("bars_test")
      .outputMode(OutputMode.Append).start()
    mem.addData(
      ev(1, "2024-01-01 10:00:01", "click", 10.0),
      ev(2, "2024-01-01 10:00:30", "click", 30.0),
      ev(3, "2024-01-01 10:00:50", "click", 20.0))
    q.processAllAvailable()
    // advance watermark past the first window
    mem.addData(ev(4, "2024-01-01 10:02:00", "click", 99.0))
    q.processAllAvailable()
    val bars = spark.table("bars_test").collect()
    q.stop()
    assert(bars.length == 1)
    val b = bars.head
    assert(b.getAs[Double]("open") == 10.0)
    assert(b.getAs[Double]("high") == 30.0)
    assert(b.getAs[Double]("low") == 10.0)
    assert(b.getAs[Double]("close") == 20.0)
    assert(b.getAs[Long]("n") == 3L)
  }

  test("enforceOrder drops out-of-order rows per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Ingest.enforceOrder(mem.toDS())
      .writeStream.format("memory").queryName("ordered_test")
      .outputMode(OutputMode.Append).start()
    mem.addData(ev(1, "2024-01-01 10:00:10", "click", 1.0))
    q.processAllAvailable()
    mem.addData(
      ev(2, "2024-01-01 10:00:05", "click", 2.0),  // late -> dropped
      ev(3, "2024-01-01 10:00:20", "click", 3.0))  // ok
    q.processAllAvailable()
    val ids = spark.table("ordered_test").collect().map(_.getAs[Long]("event_id")).toSet
    q.stop()
    assert(ids == Set(1L, 3L))
  }

  test("runningTotals carries exact state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Ingest.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("running_test")
      .outputMode(OutputMode.Update).start()
    mem.addData(ev(1, "2024-01-01 10:00:01", "click", 1.10))
    q.processAllAvailable()
    mem.addData(ev(2, "2024-01-01 10:00:02", "click", 2.20))
    q.processAllAvailable()
    val last = spark.table("running_test").collect().last
    q.stop()
    assert(last.getAs[Long]("n") == 2L)
    assert(last.getAs[Long]("sumCents") == 330L)
  }
}
