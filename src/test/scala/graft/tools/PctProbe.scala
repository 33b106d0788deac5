package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r13: isolate the exact-percentile aggregate's cost vs a plain agg
  * and vs a sort-based order-statistics formulation. */
object PctProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.lineitem(spark, sfDir)
    li.count()
    def t(name: String)(f: => Unit): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[pct] $name%-34s ${best}%7.3f s")
    }
    t("plain sum agg") {
      li.groupBy(col("l_returnflag")).agg(sum(col("l_extendedprice")))
        .write.format("noop").mode("overwrite").save()
    }
    t("exact percentile agg") {
      li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.5D, 0.95D))"))
        .write.format("noop").mode("overwrite").save()
    }
    t("approx_percentile acc=10000") {
      li.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 10000)"))
        .write.format("noop").mode("overwrite").save()
    }
    t("approx_percentile acc=1000") {
      li.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 1000)"))
        .write.format("noop").mode("overwrite").save()
    }
    t("window order-stat formulation") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("f").orderBy("x")
      val ranked = li.select(col("l_returnflag").as("f"),
          col("l_extendedprice").as("x"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("f")))
      ranked.where(
          col("rn") === floor((col("n") - 1) * 0.5) + 1 ||
          col("rn") === ceil((col("n") - 1) * 0.5) + 1 ||
          col("rn") === floor((col("n") - 1) * 0.95) + 1 ||
          col("rn") === ceil((col("n") - 1) * 0.95) + 1)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
