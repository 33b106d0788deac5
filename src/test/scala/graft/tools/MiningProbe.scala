package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r13: stage-level decomposition of the jaccardPairs mining pipeline. */
object MiningProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, sfDir)
    docs.count()
    def t(name: String)(f: => Unit): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[mine] $name%-34s ${best}%7.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val sh0 = graft.operators.Dedup.shingles(docs, "doc_id", "text", 3)
    t("shingles raw (no dedup)") { noop(graft.operators.Dedup.shingles(docs, "doc_id", "text", 3, dedup = false)) }
    t("shingles distinct") { noop(sh0) }
    val hot = sh0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .where(col("df") > 500).select(col("sh"))
    val sh = sh0.join(hot, Seq("sh"), "left_anti")
    t("sh (distinct + hot anti)") { noop(sh) }
    val a = sh.select(col("id").as("ida"), col("sh"))
    val b = sh.select(col("id").as("idb"), col("sh"))
    val inter = a.join(b, Seq("sh")).where(col("ida") < col("idb"))
      .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("inter"))
    t("inter (self-join + agg)") { noop(inter) }
    t("full jaccardPairs") {
      noop(graft.operators.Dedup.jaccardPairs(sh0, 4, 5, maxDocFreq = 500))
    }
    t("full jaccardPairs + orderBy") {
      noop(graft.operators.Dedup.jaccardPairs(sh0, 4, 5, maxDocFreq = 500)
        .select(col("ida"), col("idb"), col("jaccard")).orderBy("ida", "idb"))
    }
    spark.stop()
  }
}
