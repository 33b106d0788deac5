package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.IvfIndex

/** Measures the `_stats.json` separation statistic (and the beta it
  * derives) on the regimes betaFromSep anchors: the driver embeddings
  * corpora (near-isotropic) and the 16-cluster stress corpus — the
  * harness behind the SepIso/SepClustered constants in IvfIndex.
  * `sbt "Test/runMain graft.tools.SepScan"` */
object SepScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("sep-scan")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val tmp = java.nio.file.Files.createTempDirectory("sepscan_").toString
      for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
        val emb = Tables.embeddings(spark, s"/root/testdata/$sf")
        val idx = s"$tmp/iso_$sf"
        IvfIndex.build(emb, "vec_id", "embedding", 16, idx)
        val sep = IvfIndex.loadSep(idx).get
        println(f"SEPSCAN corpus=$sf%-8s sep=$sep%.4f beta=${IvfIndex.betaFromSep(sep)}%.2f")
      }
      for (mult <- Seq(1, 10)) {
        ScaleStress.embClustered(spark, mult, s"$tmp/embK$mult")
        val embK = spark.read.parquet(s"$tmp/embK$mult")
        val idx = s"$tmp/clu_$mult"
        IvfIndex.build(embK, "vec_id", "embedding", 16, idx)
        val sep = IvfIndex.loadSep(idx).get
        println(f"SEPSCAN corpus=clustered${mult}x sep=$sep%.4f beta=${IvfIndex.betaFromSep(sep)}%.2f")
      }
    } finally spark.stop()
  }
}
