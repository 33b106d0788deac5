package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Offline tuning harness for the sim2/sim3 recall gates: prints the
  * measured recall of each ANN configuration against the exact ≥0.3
  * cosine pair set at every SF. Run via
  * `sbt "Test/runMain graft.tools.RecallScan"`. Not part of the suite —
  * the numbers it prints are what the gate-bound scaladocs cite.
  */
object RecallScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("recall-scan")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
        val dir = s"/root/testdata/$sf"
        val emb = Tables.embeddings(spark, dir)
        val exact = Similarity.cosinePairs(emb, "vec_id", "embedding", 0.3)
          .select("ida", "idb").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        def recall(df: org.apache.spark.sql.DataFrame): Double = {
          val got = df.select("ida", "idb").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          require(got.subsetOf(exact), s"false pairs: ${(got -- exact).take(5)}")
          got.size.toDouble / exact.size
        }
        def timed(f: => Double): (Double, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        // run twice: first pass pays codegen/JIT, second is the warm
        // number comparable to the bench's min-over-passes
        for (l <- Seq(16, 12, 10)) {
          val (r, cold) = timed(recall(Similarity.lshNeighborPairsMulti(
            emb, "vec_id", "embedding", numPlanes = 6, numTables = l,
            threshold = 0.3, multiProbe = true)))
          val (_, warm) = timed(recall(Similarity.lshNeighborPairsMulti(
            emb, "vec_id", "embedding", numPlanes = 6, numTables = l,
            threshold = 0.3, multiProbe = true)))
          println(f"RECALL $sf n_true=${exact.size} " +
            f"lsh_mp${l}x6=$r%.4f (cold $cold%.2fs warm $warm%.2fs)")
        }
        val (ivf6, ivfCold) = timed(recall(Similarity.ivfNeighborPairs(
          emb, "vec_id", "embedding", numCells = 16, threshold = 0.3, nProbe = 6)))
        val (_, ivfWarm) = timed(recall(Similarity.ivfNeighborPairs(
          emb, "vec_id", "embedding", numCells = 16, threshold = 0.3, nProbe = 6)))
        println(f"RECALL $sf n_true=${exact.size} " +
          f"ivf_np6=$ivf6%.4f (cold $ivfCold%.2fs warm $ivfWarm%.2fs)")
      }
    } finally spark.stop()
  }
}
