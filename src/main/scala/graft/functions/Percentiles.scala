package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT grouped percentiles via distributed sort + order statistics —
  * a drop-in replacement for the built-in `percentile()` aggregate on
  * DOUBLE columns (r13 optimization, guide §1.2/item 4 "expressions and
  * codegen"): the ImperativeAggregate buffers every distinct value per
  * group in an OpenHashMap and merges those maps single-threaded per
  * group on the reducers — measured 1.48 s where one whole-stage-codegen
  * window sort + a tiny order-statistics aggregate takes 0.84 s on the
  * same input (PctProbe, sf0.1 lineitem).
  *
  * BITWISE parity with `Percentile.getPercentile` (the oracle gate
  * hashes these doubles exactly):
  *  - order statistics over the non-null values, 1-indexed, so
  *    row_number over the sorted group == the aggregate's accumulated
  *    counts (ties: identical values, identical order stats);
  *  - position = (n − 1) * p computed long * double like the aggregate;
  *  - lower/higher = floor/ceil of the position (long, like
  *    `position.floor.toLong`), and the interpolation replicates the
  *    aggregate's exact arithmetic INCLUDING its two no-interpolation
  *    short-circuits (integral position; equal bracketing keys — the
  *    algebraically-equal blend can differ in the last ulp, so the
  *    branch matters);
  *  - blend = (higher − position) * lowerKey + (position − lower) *
  *    higherKey, same promotions, same operation order.
  *
  * Scale shape: one hash exchange + in-partition sort of (group, value)
  * pairs — the same shuffle any sort-based group computation pays,
  * spilling gracefully where the value-buffering aggregate OOMs on a
  * giant group — then an output-sized aggregate over only the bracketing
  * rows. Groups whose values are ALL null are kept with NULL percentiles
  * (r14) — same as the built-in and the DuckDB oracle.
  */
object Percentiles {

  /** One row per group: (groupCol, <name> double per requested
    * percentile). `valCol` must be DOUBLE (the callers' money/value
    * columns are); null values are ignored like the built-in's. */
  def exactBy(df: DataFrame, groupCol: String, valCol: Column,
      ps: Seq[(String, Double)]): DataFrame = {
    // NULL values ride through the window ordered LAST instead of being
    // pre-filtered (r14, ADVICE): non-null rows keep the identical
    // row_number (nulls sort after them) and n__ counts only non-null
    // values, so every group with data is BITWISE unchanged — but a
    // group whose values are ALL null now keeps a representative row
    // (rn__ = 1, n__ = 0, picked by the `needed` clause below) and
    // emits NULL percentiles, matching the built-in percentile() and
    // the DuckDB quantile_cont oracle, where the old pre-filter dropped
    // the group entirely. No extra pass: the only cost is the (rare)
    // null rows crossing the one existing exchange.
    val base = df.select(col(groupCol).as("g__"), valCol.as("x__"))
    val ranked = base
      .withColumn("rn__", row_number().over(
        Window.partitionBy("g__").orderBy(col("x__").asc_nulls_last)))
      .withColumn("n__", count(col("x__")).over(Window.partitionBy("g__")))
    def posOf(p: Double): Column = (col("n__") - 1).cast("double") * lit(p)
    val needed = ps.map { case (_, p) =>
      col("rn__") === floor(posOf(p)) + 1 || col("rn__") === ceil(posOf(p)) + 1
    }.reduce(_ || _) || (col("n__") === 0 && col("rn__") === 1)
    val aggs = ps.flatMap { case (name, p) =>
      Seq(min(when(col("rn__") === floor(posOf(p)) + 1, col("x__")))
          .as(s"lo_$name"),
        min(when(col("rn__") === ceil(posOf(p)) + 1, col("x__")))
          .as(s"hi_$name"))
    }
    val picked = ranked.where(needed)
      .groupBy(col("g__"), col("n__"))
      .agg(aggs.head, aggs.tail: _*)
    val outCols = ps.map { case (name, p) =>
      val position = posOf(p)
      val lower = floor(position)
      val higher = ceil(position)
      when(higher === lower || col(s"hi_$name") === col(s"lo_$name"),
          col(s"lo_$name"))
        .otherwise((higher - position) * col(s"lo_$name") +
          (position - lower) * col(s"hi_$name"))
        .as(name)
    }
    picked.select(col("g__").as(groupCol) +: outCols: _*)
  }
}
