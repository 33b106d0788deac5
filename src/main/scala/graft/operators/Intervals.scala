package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless interval joins — the case Catalyst plans as a
  * BroadcastNestedLoopJoin (O(|L|·|R|) comparisons, broadcast of a whole
  * side): "points inside any window", "overlapping spans", with NO
  * equi key to hash on.
  *
  * The scale-correct shape is the FRAGMENT JOIN: quantize time into
  * fixed buckets, explode each interval into the buckets it touches,
  * equi-join on the bucket id, then filter the true predicate. Work is
  * proportional to genuinely-colliding fragments, the join is an
  * ordinary shuffle hash/sort-merge join (AQE-salvageable, spillable,
  * skew-splittable), and a "report-once" condition — keep a match only
  * in the FIRST bucket both intervals share — eliminates duplicate
  * emissions without any distinct. Pick `bucketMicros` near the typical
  * interval length: shorter → more fragments per interval; longer →
  * more false candidates per bucket.
  */
object Intervals {

  /** All (l, r) pairs whose [lStart,lEnd] and [rStart,rEnd] overlap
    * (inclusive). Columns must be TIMESTAMP; output carries all columns
    * of both inputs. */
  def overlapJoin(left: DataFrame, lStart: Column, lEnd: Column,
      right: DataFrame, rStart: Column, rEnd: Column,
      bucketMicros: Long): DataFrame = {
    val l = left
      .withColumn("__lb", floor(unix_micros(lStart) / lit(bucketMicros)))
      .withColumn("__le", floor(unix_micros(lEnd) / lit(bucketMicros)))
      .withColumn("__b", explode(sequence(col("__lb"), col("__le"))))
    val r = right
      .withColumn("__rb", floor(unix_micros(rStart) / lit(bucketMicros)))
      .withColumn("__re", floor(unix_micros(rEnd) / lit(bucketMicros)))
      .withColumn("__b", explode(sequence(col("__rb"), col("__re"))))
    l.join(r, Seq("__b"))
      .where(lStart <= rEnd && rStart <= lEnd &&
        // report-once: only the first bucket both intervals share emits
        col("__b") === greatest(col("__lb"), col("__rb")))
      .drop("__b", "__lb", "__le", "__rb", "__re")
  }
}
