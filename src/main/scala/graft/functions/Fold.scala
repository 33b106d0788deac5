package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The fold surface — Spark-native replacement for the reference's
  * universal "arbitrary Julia folded over partitions" query engine
  * (reference `src/server/query.rs:147-232`, SURVEY.md §2.10).
  *
  * Where zdb hands the user raw column vectors per partition plus
  * module-global accumulators (racy, single-process), the Spark shapes are:
  *  (a) typed `Aggregator[IN,BUF,OUT]` — partial aggregation + merge,
  *      distributed and deterministic;
  *  (b) `mapPartitions` — per-partition imperative code emitting partial
  *      results, combined by a normal groupBy. Both run map-side partial
  *      work exactly like zdb's per-partition folds, then merge — but
  *      across 1000 executors instead of one process.
  *
  * Exactness: accumulates cents as Long (the 2-dp test data is exact in
  * cents), so results are order-independent and match a DECIMAL oracle.
  */
object Fold {

  /** Exact sum of a 2-dp double, accumulated in cents. */
  object ExactCentsSum extends Aggregator[(String, Double), Long, Double] {
    def zero: Long = 0L
    def reduce(b: Long, a: (String, Double)): Long = b + math.round(a._2 * 100)
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Double = r / 100.0
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Single-column face of ExactCentsSum for SQL registration (a typed
    * Aggregator keyed by groupByKey can't be called from SQL; a
    * value-only Aggregator wrapped in functions.udaf can). */
  object ExactCentsSumValue extends Aggregator[Double, Long, Double] {
    def zero: Long = 0L
    def reduce(b: Long, a: Double): Long = b + math.round(a * 100)
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Double = r / 100.0
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** (a) Typed-Aggregator fold: per-group exact sum. */
  def aggregatorSum(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(valCol).cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .agg(ExactCentsSum.toColumn.name("sum_val"))
      .toDF(keyCol, "sum_val")
  }

  /** (b) mapPartitions escape hatch: imperative per-partition partials
    * (the literal shape of a zdb Julia scan fn), merged by groupBy. */
  def mapPartitionsSum(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val partials = df.select(col(keyCol).cast("string"), col(valCol).cast("double"))
      .as[(String, Double)]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
        it.foreach { case (k, v) =>
          val (s, n) = acc.getOrElse(k, (0L, 0L))
          acc(k) = (s + math.round(v * 100), n + 1)
        }
        acc.iterator.map { case (k, (s, n)) => (k, s, n) }
      }
      .toDF(keyCol, "cents", "n")
    partials.groupBy(col(keyCol))
      .agg((sum(col("cents")).cast("double") / 100.0).as("sum_val"),
        sum(col("n")).as("n_rows"))
  }

  /** Register UDFs usable from spark.sql — the host-language function
    * surface (reference delegates this to Julia's stdlib, SURVEY.md F7). */
  def registerAll(spark: SparkSession): Unit = {
    Calendar.register(spark)
    Format.register(spark)
    graft.plans.GraftExtensions.register(spark)
  }
}
