package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Releasing LOCALCHECKPOINT pins — the one block-store operation the
  * public Dataset API quietly lacks. `df.localCheckpoint()` persists
  * the materialized RDD DIRECTLY (MEMORY_AND_DISK), bypassing the
  * cache manager — so BOTH `Dataset.unpersist()` (a cache-manager
  * lookup that finds nothing) and `spark.catalog.clearCache()` (which
  * clears only registered cache entries) are silent no-ops on it, and
  * the blocks live until the session dies. Every fixpoint operator
  * that pins per round (pagerank, kcore, componentsStar) relied on
  * `df.unpersist()` to release retired pins — measured round 11 to
  * leak one pinned RDD per pin window (tools/UnpersistProbe). This
  * helper walks the plan's [[LogicalRDD]] leaves — exactly the nodes a
  * localCheckpoint wraps its materialized RDD in — and unpersists
  * those RDDs directly.
  *
  * Call it only on frames WHOSE PINS YOU OWN: a localCheckpoint's
  * lineage is truncated, so after release the frame (and any plan
  * built over it) cannot be recomputed. Safe on never-pinned frames
  * (no LogicalRDD leaves → only the ordinary unpersist runs). */
object Pins {
  def release(df: DataFrame): Unit = {
    df.unpersist()
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
  }
}
