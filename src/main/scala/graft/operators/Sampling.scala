package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic reservoir-style sampling: exact top-k rows per group
  * under a caller-supplied priority (md5 of a stable column = a
  * seedless pseudo-random order, the pipe2 trick — identical in every
  * engine, so it oracles).
  *
  * Scale shape (vs the window formulation pipe2 uses): a
  * `row_number().over(partitionBy(group))` shuffles EVERY row to rank
  * it, then discards all but k per group — at 100 TB that is a full
  * corpus shuffle for a sample-sized result. Here each input partition
  * folds its rows into per-group bounded heaps (k entries per group per
  * partition, the classic distributed-reservoir merge), so only
  * `partitions × groups × k` partial rows reach the final exact rank —
  * the shuffle is sample-sized, not corpus-sized. Same
  * fold-then-output-bounded-merge pattern as Similarity.topKBatch and
  * functions.Fold. Group count must be bounded (strata, languages,
  * sources — dimension-like), as with any per-group heap state.
  */
object Sampling {

  /** Exact top-k per group, ordered by (`priority` asc, `idCol` asc).
    * `priority` must be a non-null string-comparable column (e.g. an
    * md5 hex); `idCol` a non-null Long column breaking ties
    * deterministically. Output carries the input columns plus the
    * 1-based `rk` rank within the group. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], priority: Column,
      idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val withP = df.withColumn("__pri", priority.cast("string"))
    val schema = withP.schema
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    val pIdx = schema.fieldIndex("__pri")
    val iIdx = schema.fieldIndex(idCol)
    val keyOrd: Ordering[(String, Long)] =
      Ordering.Tuple2(Ordering.String, Ordering.Long)
    // PriorityQueue dequeues its max; "max" = worst kept = LARGEST key,
    // so surviving entries are the k smallest (priority, id) pairs
    val heapOrd = Ordering.by[((String, Long), Row), (String, Long)](_._1)(keyOrd)
    val partials = withP.mapPartitions { rows =>
      val heaps = mutable.HashMap.empty[
        List[Any], mutable.PriorityQueue[((String, Long), Row)]]
      rows.foreach { r =>
        val key = gIdx.map(r.get(_): Any).toList
        val h = heaps.getOrElseUpdate(key,
          new mutable.PriorityQueue[((String, Long), Row)]()(heapOrd))
        val pk = (r.getString(pIdx), r.getLong(iIdx))
        if (h.size < k) h.enqueue((pk, r))
        else if (keyOrd.lt(pk, h.head._1)) { h.dequeue(); h.enqueue((pk, r)) }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._2))
    }(Encoders.row(schema))
    partials
      .withColumn("rk", row_number().over(
        Window.partitionBy(groupCols.map(col): _*)
          .orderBy(col("__pri"), col(idCol))))
      .where(col("rk") <= k)
      .drop("__pri")
  }

  /** Leakage-free train/val/test split: each document is assigned by
    * the md5 of its near-dup CLUSTER root (`comp`: (id, comp) from
    * [[Dedup.components]] / [[Dedup.componentsStar]]), not of its own
    * id — so a near-duplicate pair can never straddle train and test,
    * the contamination path a doc-level hash split leaves open (the
    * eval-leakage failure mode Lee et al. 2021 §6 measure). Docs
    * without a cluster row are their own root. Seedless and
    * deterministic like [[topKPerGroup]]'s md5 ordering; fractions are
    * fixed 13/1/2 sixteenths (~81/6/13%) of hex space by the first
    * md5 hex digit, identical arithmetic in any engine.
    *
    * One broadcast-or-shuffle join against the cluster map (cluster
    * rows only exist for docs WITH near-dups — a tiny fraction of the
    * corpus) and a map-side hash: nothing here is corpus-quadratic. */
  def clusterSplit(docs: DataFrame, idCol: String, comp: DataFrame): DataFrame = {
    val rooted = docs.select(col(idCol).as("id"))
      .join(comp.select(col("id"), col("comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("root"))
    val h = substring(md5(col("root").cast("string").cast("binary")), 1, 1)
    rooted.withColumn("split",
      when(h < lit("d"), lit("train"))
        .when(h === lit("d"), lit("val"))
        .otherwise(lit("test")))
  }
}
