package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** One-off timing breakdown for the g1_pagerank bench row: edge
  * construction vs the pagerank loop vs the output tail, under the
  * round-8 pin-cadence change. */
object G1Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("g1-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    Tables.orders(spark, dir).count()
    Tables.lineitem(spark, dir).count()
    // full registered row, as the bench times it
    for (i <- 1 to 3) {
      timed(s"g1_full rep$i") {
        graft.queries.GraphQueries.pagerankSuppliers(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    // components
    val edges = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + 1000000L).as("dst"))
      .distinct()
    timed("edges materialize (count)") { edges.count() }
    val cached = edges.persist()
    timed("edges cache fill") { cached.count() }
    for (i <- 1 to 3) {
      val rounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
      timed(s"pagerank(cached edges) rep$i") {
        val pr = graft.operators.Graph.pagerank(cached, 3,
          onRound = (r, s) => rounds += (r -> s))
        pr.write.format("noop").mode("overwrite").save()
        pr.unpersist()
      }
      println("PROBE rounds " +
        rounds.map { case (r, s) => f"r$r=$s%.2f" }.mkString(" "))
    }
    // A/B: the identical 3-round tower, lazily noop-written (the old
    // code's shape) vs localCheckpoint-materialized (the pin)
    import org.apache.spark.sql.DataFrame
    def tower(): (DataFrame, DataFrame, DataFrame) = {
      val sym = cached.select(col("src"), col("dst"))
        .union(cached.select(col("dst").as("src"), col("src").as("dst")))
      val nodes = sym.select(col("src").as("id")).distinct().persist()
      val n = nodes.count()
      val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
      val withDeg = sym.join(deg, "src").persist()
      val base = (15L * graft.operators.Graph.Scale) / (100L * n)
      var ranks = nodes.select(col("id"), lit(graft.operators.Graph.Scale / n).as("r"))
      for (_ <- 1 to 3) {
        val contrib = withDeg
          .join(ranks, col("src") === col("id"))
          .select(col("dst").as("cid"), expr("r div deg").as("c"))
          .groupBy(col("cid")).agg(sum(col("c")).as("cs"))
        ranks = nodes
          .join(contrib, col("id") === col("cid"), "left")
          .select(col("id"),
            (lit(base) + expr("(85 * coalesce(cs, CAST(0 AS BIGINT))) div 100")).as("r"))
      }
      (ranks, nodes, withDeg)
    }
    for (i <- 1 to 2) {
      val (lazyT, n1, w1) = tower()
      timed(s"tower lazy noop rep$i") {
        lazyT.write.format("noop").mode("overwrite").save()
      }
      n1.unpersist(); w1.unpersist()
      val (pinT, n2, w2) = tower()
      timed(s"tower localCheckpoint rep$i") {
        val p = pinT.localCheckpoint()
        p.unpersist()
      }
      n2.unpersist(); w2.unpersist()
    }
    spark.stop()
  }
}
