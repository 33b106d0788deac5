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
    // fail loudly on mixed dims: a longer row would AIOOBE and a
    // shorter one would silently skew the centroid
    require(s.length == v.length,
      s"mixed embedding dims in centroid group: ${s.length} vs ${v.length}")
    var i = 0
    while (i < v.length) { s(i) += v(i); i += 1 }
    VecBuf(s, b.n + 1)
  }

  def merge(b1: VecBuf, b2: VecBuf): VecBuf =
    if (b1.sum.isEmpty) b2
    else if (b2.sum.isEmpty) b1
    else {
      require(b1.sum.length == b2.sum.length,
        s"mixed embedding dims in centroid group: " +
          s"${b1.sum.length} vs ${b2.sum.length}")
      val s = b1.sum.clone()
      var i = 0
      while (i < s.length) { s(i) += b2.sum(i); i += 1 }
      VecBuf(s, b1.n + b2.n)
    }

  def finish(r: VecBuf): Centroid = Centroid(r.sum.map(_ / r.n))

  def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  def outputEncoder: Encoder[Centroid] = Encoders.product[Centroid]
}

/** Partial buffer for one Newton/IRLS logreg step: gradient sum (d),
  * upper-triangular Hessian sum (d(d+1)/2), row count. */
case class LogRegBuf(g: Array[Double], h: Array[Double], n: Long)

/** One-scan Newton-step statistics at current weights `w`. */
case class LogRegStats(g: Array[Double], h: Array[Double], n: Long)

/** Typed Aggregator computing Σ(σ(w·x)−y)·x and Σσ(1−σ)·xxᵀ (upper
  * triangle) in a single pass — the map-side-combined statistics of one
  * Newton / IRLS iteration of logistic regression
  * (graft.operators.Classifier.trainLogRegNewton). The shuffle carries
  * one O(d²) buffer per partition; rows never leave their partition. */
case class LogRegStep(w: Array[Double])
    extends Aggregator[(Array[Float], Int), LogRegBuf, LogRegStats] {

  def zero: LogRegBuf = LogRegBuf(Array.emptyDoubleArray, Array.emptyDoubleArray, 0L)

  def reduce(b: LogRegBuf, row: (Array[Float], Int)): LogRegBuf = {
    val (x, y) = row
    val d = x.length
    val g = if (b.g.isEmpty) new Array[Double](d) else b.g
    require(g.length == d,
      s"mixed feature dims in logreg input: ${g.length} vs $d")
    val h = if (b.h.isEmpty) new Array[Double](d * (d + 1) / 2) else b.h
    var dot = 0.0
    var i = 0
    while (i < d) { dot += w(i) * x(i); i += 1 }
    val p = 1.0 / (1.0 + math.exp(-dot))
    val r = p - y
    val q = p * (1.0 - p)
    var idx = 0
    i = 0
    while (i < d) {
      val xi = x(i).toDouble
      g(i) += r * xi
      val qi = q * xi
      var j = i
      while (j < d) { h(idx) += qi * x(j); idx += 1; j += 1 }
      i += 1
    }
    LogRegBuf(g, h, b.n + 1)
  }

  def merge(a: LogRegBuf, b: LogRegBuf): LogRegBuf =
    if (a.g.isEmpty) b
    else if (b.g.isEmpty) a
    else {
      require(a.g.length == b.g.length,
        s"mixed feature dims in logreg input: ${a.g.length} vs ${b.g.length}")
      val g = a.g.clone(); val h = a.h.clone()
      var i = 0
      while (i < g.length) { g(i) += b.g(i); i += 1 }
      i = 0
      while (i < h.length) { h(i) += b.h(i); i += 1 }
      LogRegBuf(g, h, a.n + b.n)
    }

  def finish(r: LogRegBuf): LogRegStats = LogRegStats(r.g, r.h, r.n)

  def bufferEncoder: Encoder[LogRegBuf] = Encoders.product[LogRegBuf]
  def outputEncoder: Encoder[LogRegStats] = Encoders.product[LogRegStats]
}
