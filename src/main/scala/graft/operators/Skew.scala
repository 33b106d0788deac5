package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot join keys at scale.
  *
  * AQE's skew-join handles most cases at runtime; explicit salting is
  * the planner-independent fallback for pathologically hot keys (e.g. a
  * null-ish default symbol owning 30% of a 100 TB fact table): the big
  * side spreads each hot key over `numSalts` sub-keys derived
  * deterministically from a row-local column; the small side is
  * replicated once per salt. No RNG — results are stable across retries
  * (a task retry with nondeterministic salt would corrupt a shuffle).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `numSalts` ways.
    * `saltSource` must be a big-side column that varies within a key
    * (e.g. a row id) — it only drives distribution, not semantics. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, numSalts: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(numSalts)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(numSalts - 1))))
      .withColumn("__salt", col("__salt").cast("bigint"))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
