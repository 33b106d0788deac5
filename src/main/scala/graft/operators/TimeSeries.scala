package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Recursive per-series folds — the time-series transforms whose row t
  * depends on row t−1's OUTPUT, which no SQL window frame can express
  * (a window aggregates inputs over a frame; EWMA recurses on its own
  * result). The reference's host-language escape hatch ran these as
  * Julia folds over the scan (`src/server/query.rs:215-227`); here they
  * are one-shuffle distributed folds.
  *
  * Scale shape: repartition by series key, secondary-sort within
  * partitions by (key, order), then a single sequential pass per
  * partition carrying O(1) state per series — the same
  * fold-over-sorted-runs shape as the native as-of join and
  * functions.Fold. One exchange total; state never exceeds one double
  * per live series; a 100 TB tick table folds in one pass after its
  * key shuffle (and a table already bucketed/sorted on the key skips
  * the exchange entirely).
  */
object TimeSeries {

  /** Exponentially weighted moving average of `valCol` per `keyCols`
    * series, ordered by `orderCols` (include a unique tiebreak for
    * deterministic results): y₀ = x₀, yₜ = α·xₜ + (1−α)·yₜ₋₁.
    * Appends the result as `outCol`. Pick an α whose 1−α is exact in
    * binary (0.25, 0.5, …) when bit-reproducibility across engines
    * matters. `valCol` must be non-null numeric. */
  def ewma(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valCol: String, alpha: Double, outCol: String = "ewma"): DataFrame = {
    val beta = 1.0 - alpha
    val sorted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    val inSchema = sorted.schema
    val outSchema = inSchema.add(outCol, DoubleType, nullable = false)
    val kIdx = keyCols.map(inSchema.fieldIndex).toArray
    val vIdx = inSchema.fieldIndex(valCol)
    sorted.mapPartitions { rows =>
      var curKey: List[Any] = null
      var state = 0.0
      rows.map { r =>
        val k = kIdx.map(r.get(_): Any).toList
        val x = r.get(vIdx) match {
          case d: java.lang.Double => d.doubleValue()
          case n: java.lang.Number => n.doubleValue()
        }
        state = if (k != curKey) x else alpha * x + beta * state
        curKey = k
        Row.fromSeq(r.toSeq :+ state)
      }
    }(Encoders.row(outSchema))
  }
}
