package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** OHLCV pipelines — the reference's one fixed-function query surface.
  *
  * assemble = the `/ohlcv` endpoint shape (reference
  * `src/server/ohlcv.rs:88-134`): per symbol, time-ordered parallel arrays
  * of (t,o,h,l,c,v) plus global min/max ts. resample = ticks→bars
  * downsampling (the implied `agg1m` capability, reference
  * `tests/main.rs:13-25`).
  *
  * Scale: assemble's collect_list is bounded by the query time range (the
  * endpoint is a charting fetch, not an analytical scan); sort_array on
  * the struct keyed by ts gives deterministic order without a global sort.
  */
object Ohlcv {

  /** A3: per-symbol bar assembly over a time range + symbol filter (P5). */
  def assemble(bars: DataFrame, symCol: String, symbols: Seq[String],
      fromTs: Column, toTs: Column): DataFrame = {
    val filtered = bars
      .where(col("ts") >= fromTs && col("ts") <= toTs)
      .where(if (symbols.isEmpty) lit(true) else col(symCol).isin(symbols: _*))
    filtered
      .groupBy(col(symCol))
      .agg(sort_array(collect_list(struct(
        col("ts"), col("open"), col("high"), col("low"),
        col("close"), col("volume")))).as("bars"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
  }

  /** A4: resample ticks into fixed-width bars per symbol. Deterministic
    * open/close via min_by/max_by on a unique sequence column. */
  def resample(ticks: DataFrame, symCol: String, priceCol: String,
      sizeCol: String, seqCol: String, width: String): DataFrame =
    ticks
      .groupBy(window(col("ts"), width), col(symCol))
      .agg(
        min_by(col(priceCol), col(seqCol)).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), col(seqCol)).as("close"),
        sum(col(sizeCol)).as("volume"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col(symCol), col("open"),
        col("high"), col("low"), col("close"), col("volume"), col("n"))
}
