package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.Multimodal

/** Measures the JPEG lossy-decode error distribution that m4's gate
  * bounds. `sbt "Test/runMain graft.tools.JpegScan"` */
object JpegScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      println("JPEG available: " + Multimodal.jpegAvailable)
      for (sf <- Seq("sf0.001", "sf0.01")) {
        val docs = Tables.documents(spark, s"/root/testdata/$sf")
        val err = Multimodal.decodeJpegError(Multimodal.jpegMediaFromDocs(docs))
        val row = err.agg(max(col("mean_abs_err")), max(col("max_abs_err")),
          avg(col("mean_abs_err")), count(lit(1))).head
        println(f"JPEG $sf worst_mean=${row.getDouble(0)}%.2f worst_max=${row.getInt(1)} " +
          f"avg_mean=${row.getDouble(2)}%.2f n=${row.getLong(3)}")
      }
    } finally spark.stop()
  }
}
