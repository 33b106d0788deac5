package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained rollup: the batch face of materialized-view
  * maintenance (the streaming face is Ingest.runningTotals /
  * streamingOhlcv).
  *
  * A 100 TB pipeline cannot recompute its hourly/daily aggregates from
  * the fact table on every ingest; it folds each incoming batch into
  * PARTIAL aggregates and merges on read. `refresh(batch)` aggregates
  * ONLY the batch (map-side partial combine, one delta-sized shuffle,
  * one appended parquet file set) — cost is O(|batch|) regardless of
  * table history. `read()` merges the accumulated partials — bounded by
  * #deltas × #groups, never by fact rows. `compactDeltas()` folds all
  * partials into one, restoring O(#groups) reads after many refreshes.
  *
  * Counts and sums are algebraic (partials merge by addition), so any
  * refresh order yields the same result; sums ride DECIMAL(18,2) so
  * merge order cannot perturb float bits (the oracle-exactness rule).
  */
class RollupTable(val spark: SparkSession, val path: String,
    val grain: String, val tsCol: String, val dims: Seq[String],
    val valueCol: String) {

  /** Every stored partial carries the SAME sum type — Spark widens
    * decimal sums (18,2 → 28,2), and a dir mixing fresh-delta and
    * compacted-merge precisions fails the parquet read. */
  private def normalize(df: DataFrame): DataFrame =
    df.withColumn("sum_val", col("sum_val").cast("decimal(18,2)"))

  private def partial(batch: DataFrame): DataFrame =
    normalize(batch.groupBy(
        date_trunc(grain, col(tsCol)).as("bucket") +: dims.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sum_val")))

  /** Fold one batch into the rollup: aggregate the batch, append the
    * delta. Never touches existing data. */
  def refresh(batch: DataFrame): Unit =
    partial(batch).write.mode("append").parquet(path)

  /** Merge-on-read: re-aggregate the stored partials (delta-sized). */
  def read(): DataFrame =
    normalize(spark.read.parquet(path)
      .groupBy(col("bucket") +: dims.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_val")).as("sum_val")))

  /** Streaming face: maintain this rollup from a stream. Each
    * micro-batch folds via [[refresh]]; a batch-id high-water mark makes
    * post-failure replays no-ops (refresh APPENDS a delta, so a replayed
    * batch would otherwise double-count — same guard as
    * Ingest.ingestZTable). */
  def sink(stream: DataFrame, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        refreshBatchIdempotent(df, batchId)
      }
      .start()

  /** Fold `df` as micro-batch `batchId` unless that batch already landed
    * (exposed for direct testing of the replay path). The mark is a
    * SIBLING of the parquet dir so delta compaction's dir swap cannot
    * clobber it. */
  def refreshBatchIdempotent(df: DataFrame, batchId: Long): Unit = {
    val mark = Paths.get(path + "._last_stream_batch")
    val last =
      if (Files.exists(mark)) Files.readString(mark).trim.toLong else -1L
    if (batchId > last) {
      refresh(df)
      Files.writeString(mark, batchId.toString)
    }
  }

  /** Fold all accumulated deltas into a single partial set: stage the
    * merged rollup to a sibling dir (never read-while-overwrite), then
    * swap. Restores O(#groups) reads after many refreshes. */
  def compactDeltas(): Unit = {
    val tmp = path + ".compacting"
    read().write.mode("overwrite").parquet(tmp)
    val old = Paths.get(path)
    if (Files.exists(old)) {
      Files.walk(old).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    Files.move(Paths.get(tmp), old)
  }
}

object RollupTable {
  def apply(spark: SparkSession, path: String, grain: String = "day",
      tsCol: String = "ts", dims: Seq[String] = Nil,
      valueCol: String = "value"): RollupTable =
    new RollupTable(spark, path, grain, tsCol, dims, valueCol)
}
