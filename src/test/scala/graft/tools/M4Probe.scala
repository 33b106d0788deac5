package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Round-12 adjudication probe for the m4_jpeg_decode drift (fold's
  * worst row two rounds running — 1.37× baseline at r11 — with code
  * untouched since r5): an ISOLATED cold session running just the
  * registered row min-of-8, plus an encode-only A/B so the decode tail
  * can be separated from the synth/encode head. If the isolated min
  * lands near the committed baseline (1.353 s), the fold's number is
  * sweep-neighborhood noise (m4 runs mid-fold behind 100+ queries'
  * block-store churn), not a real regression. */
object M4Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("m4-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // same warmup shape as Bench: touch the input once
    Tables.documents(spark, dir).count()
    // A: the full registered row (encode + decode + error check)
    val full = (1 to 8).map { i =>
      val s = timed {
        graft.queries.MultimodalQueries.jpegDecode(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"PROBE m4_full rep$i $s%.3fs")
      s
    }
    // B: encode-only (the synth head the decode rides on) — the delta
    // A-B is the actual ImageIO decode + error-check tail
    val enc = (1 to 8).map { i =>
      val s = timed {
        graft.sources.Multimodal
          .jpegMediaFromDocs(Tables.documents(spark, dir))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"PROBE m4_encode rep$i $s%.3fs")
      s
    }
    println(f"PROBE m4_full min=${full.min}%.3fs encode min=${enc.min}%.3fs " +
      f"decode_tail=${full.min - enc.min}%.3fs baseline=1.353s " +
      f"ratio=${full.min / 1.353}%.2f")
    spark.stop()
  }
}
