package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys for multi-column data layout.
  *
  * Sorting a partition by ts alone gives perfect row-group min/max
  * pruning on ts and none on anything else; interleaving the bits of
  * several columns into one sort key makes every output file cover a
  * tight hyper-rectangle of the (ts × col × …) space, so parquet
  * row-group stats prune scans filtered on ANY of the clustered columns.
  * This is the layout tool that matters at 100 TB, where a secondary
  * predicate (symbol, user, tenant) otherwise forces a full partition
  * read. The whole key is a codegen'd bitwise expression — zero shuffle
  * beyond the range repartition the rewrite was already paying.
  */
object ZOrder {

  /** Bits kept per column; k columns use 16·k of the 64-bit key. */
  val Bits = 16

  private val MaxVal = (1 << Bits) - 1 // 65535

  /** Scale a linearized (double) column to [0, 2^16) given the
    * partition's min/max. Degenerate range → constant 0. */
  def scale(c: Column, lo: Double, hi: Double): Column =
    if (!(hi > lo)) lit(0L)
    else least(lit(MaxVal.toLong), greatest(lit(0L),
      ((c - lit(lo)) * lit(MaxVal.toDouble / (hi - lo))).cast("long")))

  /** [[scale]] with PER-ROW bounds columns — the one-job compaction path
    * scales each row against its own partition's min/max, so the bounds
    * arrive as when-chain columns instead of literals. Arithmetic is the
    * scalar variant's exactly (one division of the same two doubles,
    * then the same multiply/clamp), so a row scales bit-identically to
    * a per-partition literal rewrite. */
  def scaleCol(c: Column, lo: Column, hi: Column): Column =
    when(!(hi > lo), lit(0L)).otherwise(
      least(lit(MaxVal.toLong), greatest(lit(0L),
        ((c - lo) * (lit(MaxVal.toDouble) / (hi - lo))).cast("long"))))

  /** Cluster a string column by hash bucket: no linear order to exploit,
    * but equal values land together, which is exactly what an equality
    * predicate's row-group pruning needs. */
  def bucket(c: Column): Column = pmod(xxhash64(c), lit((MaxVal + 1).toLong))

  /** Interleave k 16-bit keys into one Morton key (k ≤ 4). The LAST
    * column's bits are most significant. */
  def interleave(cols: Seq[Column]): Column = {
    require(cols.nonEmpty && cols.size <= 4, "zorder supports 1-4 columns")
    val k = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until Bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }
}
