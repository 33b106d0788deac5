package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off measurement of ml2's training accuracy / loss ratio across
  * SFs — the numbers documented on PipelineQueries.TextClfAccBound.
  * `sbt "Test/runMain graft.tools.Ml2Measure"` */
object Ml2Measure {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("ml2-measure")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
        val (n, nPos, acc, lossT, loss0) = graft.queries.PipelineQueries
          .textClfStats(spark, s"/root/testdata/$sf")
        println(f"ML2 $sf n=$n pos=$nPos acc=$acc%.4f " +
          f"lossT=$lossT%.4f loss0=$loss0%.4f ratio=${lossT / loss0}%.3f")
      }
    } finally spark.stop()
  }
}
