package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Phase profiler for the multiprobe LSH path at sf0.1 — splits the
  * candidate-generation cost from the exact-verify cost and dumps the
  * physical plan so join strategies are visible.
  * `sbt "Test/runMain graft.tools.LshProfile"` */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("lsh-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dir = "/root/testdata/sf0.1"
      val emb = Tables.embeddings(spark, dir)
      def timed[T](tag: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
        r
      }
      if (args.length >= 2) {
        // candidate-stage-only profile at an explicit banding (e.g. the
        // planner-sized 11x79 that used to blow janino's method limit)
        val (p, t) = (args(0).toInt, args(1).toInt)
        val cands = Similarity.lshCandidates(
          emb, "vec_id", "embedding", p, t, multiProbe = true)
        timed(s"cands_${p}x${t}_cold")(println("cands=" + cands.count()))
        timed(s"cands_${p}x${t}_warm")(println("cands=" + cands.count()))
      } else {
        val full = Similarity.lshNeighborPairsMulti(
          emb, "vec_id", "embedding", 6, 16, 0.3, multiProbe = true)
        // warm up
        timed("full_cold")(full.count())
        timed("full_warm")(full.count())
        val cands = Similarity.lshCandidates(
          emb, "vec_id", "embedding", 6, 16, multiProbe = true)
        timed("cands_cold")(println("cands=" + cands.count()))
        timed("cands_warm")(println("cands=" + cands.count()))
      }
    } finally spark.stop()
  }
}
