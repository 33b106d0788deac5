package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

/** Manual harness: serve a seeded demo bar table and open
  * `http://127.0.0.1:18080/chart/demo?col=sym&price=v&size=v&width=1%20hour`
  * to eyeball the candlestick page.
  * `sbt "Test/runMain graft.tools.ChartDemo"` */
object ChartDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("chart-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("chart_demo_").toString
    val rnd = new scala.util.Random(7)
    val t0 = Timestamp.valueOf("2024-03-01 09:30:00").getTime
    var px = Map("ACME" -> 100.0, "ZORP" -> 40.0)
    val rows = (0 until 600).flatMap { i =>
      px.keys.toSeq.sorted.map { s =>
        val p0 = px(s)
        val p1 = p0 * (1 + (rnd.nextDouble() - 0.5) * 0.01)
        px += s -> p1
        (new Timestamp(t0 + i * 60000L), s, p1.toFloat,
          ((rnd.nextDouble() * 900) + 100).toLong)
      }
    }
    val t = graft.sources.ZTable.create(spark, s"$root/demo",
      graft.sources.ZTableSpec(partitionBy = graft.sources.ZPartitionBy.Day))
    t.append(rows.toDF("ts", "sym", "v", "size"))
    val server = new graft.GraftServer(spark, root, 18080)
    server.start()
    println(s"CHARTDEMO ready on http://127.0.0.1:18080/chart/demo")
    Thread.sleep(args.headOption.map(_.toLong).getOrElse(600000L))
    server.stop()
    spark.stop()
  }
}
