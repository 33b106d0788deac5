package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k sketch rows: the k sample rows with the smallest
  * (md5-priority, id) keys, parallel-array encoded. Top-level case
  * classes — Spark 4 product encoders require top-level definitions. */
case class QSketchBuf(pri: Array[String], id: Array[Long], v: Array[Double])

/** Deterministic MERGEABLE quantile sketch — the quantile face of the
  * a13 sketch-rollup story (HLL : distinct :: bottom-k : quantiles).
  *
  * The sketch is the k rows with smallest (md5(id), id) priority — a
  * seedless uniform sample (the pipe2 md5-ordering trick), so:
  *  - it is MERGEABLE and the merge is LOSSLESS: the global bottom-k of
  *    a union is contained in the union of per-part bottom-k's, so
  *    re-aggregating day sketches gives bit-identically the sketch a
  *    single pass over the raw range would build;
  *  - it is DETERMINISTIC: any engine that sorts by (md5(id), id) picks
  *    the same rows, so quantile estimates are exactly SQL-derivable —
  *    a14's oracle hash-gates the ESTIMATE itself, no error-bound gate;
  *  - estimation: nearest-rank quantile over the sample's values
  *    (integer rank, no float arithmetic to drift cross-engine).
  *
  * Map-side partials fold before the exchange; the shuffle carries one
  * <= k-row buffer per (group, partition) — never the data. Buffers
  * append lazily and compact at 2k; the immutable-array append makes
  * per-row cost O(k) amortized (bounded by the sketch size, not the
  * data) — swap the buffer for a mutable reservoir if k grows large.
  */
case class BottomKSketch(k: Int)
    extends Aggregator[(String, Long, Double), QSketchBuf, QSketchBuf] {
  require(k > 0, s"sketch size must be positive, got $k")

  def zero: QSketchBuf =
    QSketchBuf(Array.empty, Array.emptyLongArray, Array.emptyDoubleArray)

  private def compact(b: QSketchBuf, keep: Int): QSketchBuf = {
    val idx = b.pri.indices.sortBy(i => (b.pri(i), b.id(i))).take(keep).toArray
    QSketchBuf(idx.map(b.pri), idx.map(b.id), idx.map(b.v))
  }

  def reduce(b: QSketchBuf, row: (String, Long, Double)): QSketchBuf = {
    val appended = QSketchBuf(b.pri :+ row._1, b.id :+ row._2, b.v :+ row._3)
    if (appended.pri.length >= 2 * k) compact(appended, k) else appended
  }

  def merge(a: QSketchBuf, b: QSketchBuf): QSketchBuf =
    compact(QSketchBuf(a.pri ++ b.pri, a.id ++ b.id, a.v ++ b.v), k)

  def finish(r: QSketchBuf): QSketchBuf = compact(r, k)

  def bufferEncoder: Encoder[QSketchBuf] = Encoders.product[QSketchBuf]
  def outputEncoder: Encoder[QSketchBuf] = Encoders.product[QSketchBuf]
}

object BottomKSketch {
  /** Nearest-rank quantile of a finished sketch: the value at
    * ceil(q·n) of the value-sorted sample (1-based, integer rank). */
  def quantile(s: QSketchBuf, q: Double): Double = {
    require(s.v.nonEmpty, "quantile of an empty sketch (no input rows)")
    require(q > 0.0 && q <= 1.0, s"quantile q must be in (0, 1], got $q")
    val sorted = s.v.sorted
    sorted(math.max(1, math.ceil(q * sorted.length).toInt) - 1)
  }
}
