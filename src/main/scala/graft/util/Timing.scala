package graft.util

/** Shared per-round timing discipline for the iterative operators'
  * `onRound` hooks (kmeansFit, pagerank, kcore): one definition of
  * "round r took s seconds" instead of a copy per operator. */
private[graft] object Timing {
  def rounded[T](onRound: (Int, Double) => Unit, r: Int)(f: => T): T = {
    val t0 = System.nanoTime()
    val out = f
    onRound(r, (System.nanoTime() - t0) / 1e9)
    out
  }
}
