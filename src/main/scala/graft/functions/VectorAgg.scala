package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Partial-aggregation buffer for vector centroids: running element-wise
  * sum + count. Top-level case class — Spark 4 product encoders require
  * top-level definitions. */
case class VecBuf(sum: Array[Double], n: Long)

/** Centroid output wrapped in a case class so the output encoder is a
  * plain product encoder (no reflective array-encoder lookup needed). */
case class Centroid(values: Array[Double])

/** Element-wise vector centroid as a typed Aggregator — the k-means
  * "update centroids" step in the shape it must have at 100 TB: each
  * partition folds its vectors into one (dim)-sized partial sum per
  * label map-side, so the shuffle carries `labels × partitions` small
  * buffers, never the N×dim vectors themselves. (North-star operator;
  * the reference has no vector surface.)
  *
  * Sums accumulate in Double (exact widening from Float inputs); the
  * final divide-by-count happens once in finish, so the result is
  * independent of partitioning up to double-addition order — oracle
  * comparisons round to 6 dp for that reason (see SimilarityQueries).
  */
object VecCentroid extends Aggregator[(Int, Array[Float]), VecBuf, Centroid] {
  def zero: VecBuf = VecBuf(Array.emptyDoubleArray, 0L)

  def reduce(b: VecBuf, a: (Int, Array[Float])): VecBuf = {
    val v = a._2
    val s = if (b.sum.isEmpty) new Array[Double](v.length) else b.sum
    var i = 0
    while (i < v.length) { s(i) += v(i); i += 1 }
    VecBuf(s, b.n + 1)
  }

  def merge(b1: VecBuf, b2: VecBuf): VecBuf =
    if (b1.sum.isEmpty) b2
    else if (b2.sum.isEmpty) b1
    else {
      val s = b1.sum.clone()
      var i = 0
      while (i < s.length) { s(i) += b2.sum(i); i += 1 }
      VecBuf(s, b1.n + b2.n)
    }

  def finish(r: VecBuf): Centroid = Centroid(r.sum.map(_ / r.n))

  def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  def outputEncoder: Encoder[Centroid] = Encoders.product[Centroid]
}
