package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions.col

/** Independent reference implementations used by the TRUE-flag oracle
  * gates (the t10/a13 pattern): each no-oracle query re-derives its
  * result through one of these from-first-principles implementations
  * and emits a boolean the DuckDB side asserts as literal TRUE, so the
  * driver's hash gate fails iff the production path and the reference
  * ever disagree. These are deliberately written with plain collections
  * code — no Catalyst expressions, no shared helpers with the
  * production operators — so a bug in the optimized path cannot cancel
  * out against the same bug here.
  */
object CrossCheck {

  // ---- winnowing (t6 gate; mirrors the spec of plans.WinnowFingerprints,
  // reference scheme from Schleimer/Wilkerson/Aiken's winnowing paper) ----

  private val WinnowPrimes = Array(1000003L, 8191L, 131L, 31L, 7L, 1L)

  private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .foreach { b => h ^= b & 0xffL; h *= 0x100000001b3L }
    h
  }

  /** Winnowing fingerprints of `text`: FNV-1a word hashes, k-gram
    * rolling hashes weighted by [[WinnowPrimes]], min of each w-window,
    * distinct + sorted. */
  def winnowRef(text: String, k: Int, w: Int): Seq[Long] = {
    val wh = text.toLowerCase.split(" ", -1).map(fnv1a)
    if (wh.length < k) return Nil
    val kg = wh.sliding(k)
      .map(g => g.zipWithIndex.map { case (h, d) => h * WinnowPrimes(d) }.sum)
      .toArray
    if (kg.length < w) return Nil
    kg.sliding(w).map(_.min).toSeq.distinct.sorted
  }

  // ---- BPE greedy encode (t9 gate) ----

  /** Greedy lowest-rank BPE segmentation of one word: repeatedly merge
    * the adjacent pair with the smallest merge rank (all occurrences,
    * left to right) until no ranked pair remains. Independent of
    * [[Bpe.encodeWord]] / the BpeEncodeCount expression. */
  def bpeEncodeRef(word: String, rank: Map[(String, String), Int]): List[String] = {
    var toks: List[String] = word.map(_.toString).toList
    var continue = toks.lengthCompare(1) > 0
    while (continue) {
      val ranked = toks.zip(toks.tail).flatMap(p => rank.get(p).map(r => (r, p)))
      if (ranked.isEmpty) continue = false
      else {
        val best = ranked.minBy(_._1)._2
        val out = List.newBuilder[String]
        var rest = toks
        while (rest.nonEmpty) rest match {
          case a :: b :: t if (a, b) == best => out += a + b; rest = t
          case a :: t => out += a; rest = t
          case Nil => ()
        }
        toks = out.result()
        continue = toks.lengthCompare(1) > 0
      }
    }
    toks
  }

  /** Total reference BPE token count of a space-separated text. */
  def bpeCountRef(text: String, rank: Map[(String, String), Int]): Long =
    text.toLowerCase.split(" ").iterator.filter(_.nonEmpty)
      .map(w => bpeEncodeRef(w, rank).length.toLong).sum

  /** Independent unigram-LM Viterbi formulation (t13 gate): memoized
    * top-down recursion over split points, vs the expression's
    * bottom-up iterative DP. Same semantics: maximize summed piece
    * log-prob, ties prefer the smallest split point (longest final
    * piece), unknown single chars cost [[graft.functions.Unigram.UnkLogP]]. */
  def unigramSegRef(word: String, logp: Map[String, Double],
      maxPieceLen: Int = 16): List[String] = {
    val memo = scala.collection.mutable.HashMap.empty[Int, (Double, Int)]
    def solve(j: Int): (Double, Int) =
      if (j == 0) (0.0, -1)
      else memo.getOrElseUpdate(j, {
        var bestS = Double.NegativeInfinity
        var bestI = -1
        // descending i: the LAST strict improvement is the smallest i,
        // mirroring the DP's strict-> keep-first rule
        var i = j - 1
        val lo = math.max(0, j - maxPieceLen)
        while (i >= lo) {
          val piece = word.substring(i, j)
          val lp = logp.getOrElse(piece,
            if (j - i == 1) graft.functions.Unigram.UnkLogP
            else Double.NegativeInfinity)
          if (lp > Double.NegativeInfinity) {
            val (si, _) = solve(i)
            if (si + lp >= bestS && si + lp > Double.NegativeInfinity) {
              bestS = si + lp; bestI = i
            }
          }
          i -= 1
        }
        (bestS, bestI)
      })
    val parts = List.newBuilder[(Int, Int)]
    var k = word.length
    while (k > 0) { val i = solve(k)._2; parts += ((i, k)); k = i }
    parts.result().reverse.map { case (a, b) => word.substring(a, b) }
  }

  /** Total reference unigram piece count of a space-separated text. */
  def unigramCountRef(text: String, logp: Map[String, Double]): Long =
    text.toLowerCase.split(" ").iterator.filter(_.nonEmpty)
      .map(w => unigramSegRef(w, logp).length.toLong).sum

  // ---- sequential Lloyd k-means (sim7 gate) ----

  /** Sequential driver-side re-run of the exact k-means recipe
    * `operators.Similarity.kmeans` executes distributed: spherical
    * normalization (float-rounded, as the prepped column is
    * `array<float>`), deterministic farthest-point init seeded by the
    * min (xxhash64(id), id) row, then `iters` Lloyd rounds of
    * first-argmin assignment + mean + re-normalization. Arithmetic is
    * left-to-right double accumulation, matching DotProduct; only the
    * cross-partition centroid-sum order can differ, which is why the
    * sim7 gate compares cell-size histograms rather than raw doubles.
    *
    * Returns (seedCentroids, finalCentroids, finalAssignments). */
  def kmeansRef(rows: Array[(Long, Array[Float])], k: Int, iters: Int)
      : (Array[Array[Double]], Array[Array[Double]], Array[Int]) = {
    def dotD(a: Array[Float], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, c.length)) { s += a(i).toDouble * c(i); i += 1 }
      s
    }
    // spherical prep: unit-normalize, rounded back through Float like
    // the distributed `transform(...).cast("array<float>")` column
    val prepped = rows.map { case (id, v) =>
      var nsq = 0.0
      v.foreach(x => nsq += x.toDouble * x.toDouble)
      val n = math.sqrt(nsq)
      (id, v.map(x => (x.toDouble / n).toFloat))
    }
    val normSq = prepped.map { case (_, v) =>
      var s = 0.0; v.foreach(x => s += x.toDouble * x.toDouble); s
    }
    def dist2(i: Int, c: Array[Double]): Double = {
      var cn = 0.0; c.foreach(x => cn += x * x)
      normSq(i) - 2.0 * dotD(prepped(i)._2, c) + cn
    }
    // seed: min (xxhash64(id) signed, id)
    val seedIdx = prepped.indices.minBy(i =>
      (XXH64.hashLong(prepped(i)._1, 42L), prepped(i)._1))
    val cents = scala.collection.mutable.ArrayBuffer(
      prepped(seedIdx)._2.map(_.toDouble))
    while (cents.size < k) {
      // farthest point, tie-break smallest id (desc distance, asc id)
      val nextIdx = prepped.indices.minBy { i =>
        (-cents.map(c => dist2(i, c)).min, prepped(i)._1)
      }
      cents += prepped(nextIdx)._2.map(_.toDouble)
    }
    val seeds = cents.toArray.map(_.clone())
    var cs = cents.toArray
    var assign = Array.fill(prepped.length)(0)
    def unit(c: Array[Double]): Array[Double] = {
      var n = 0.0; c.foreach(x => n += x * x)
      val s = math.sqrt(n)
      if (s > 0) c.map(_ / s) else c
    }
    for (_ <- 1 to iters) {
      assign = prepped.indices.map { i =>
        val d = cs.map(c => dist2(i, c))
        d.indexOf(d.min) // first argmin, matching array_position semantics
      }.toArray
      cs = Array.tabulate(k) { cell =>
        val members = prepped.indices.filter(assign(_) == cell)
        if (members.isEmpty) cs(cell)
        else {
          val s = new Array[Double](prepped(members.head)._2.length)
          members.foreach { i =>
            val v = prepped(i)._2
            var j = 0
            while (j < v.length) { s(j) += v(j); j += 1 }
          }
          unit(s.map(_ / members.length))
        }
      }
    }
    // final assignment under the trained centroids
    assign = prepped.indices.map { i =>
      val d = cs.map(c => dist2(i, c))
      d.indexOf(d.min)
    }.toArray
    (seeds, cs, assign)
  }

  /** Total within-cluster squared distance of `rows` (prepped the same
    * spherical way) under `cs` — the Lloyd objective for the sse gate. */
  def kmeansSse(rows: Array[(Long, Array[Float])], cs: Array[Array[Double]]): Double = {
    var total = 0.0
    rows.foreach { case (_, v) =>
      var nsq = 0.0
      v.foreach(x => nsq += x.toDouble * x.toDouble)
      val n = math.sqrt(nsq)
      val p = v.map(x => (x.toDouble / n).toFloat)
      var pn = 0.0; p.foreach(x => pn += x.toDouble * x.toDouble)
      val best = cs.map { c =>
        var cn = 0.0; c.foreach(x => cn += x * x)
        var d = 0.0; var i = 0
        while (i < math.min(p.length, c.length)) { d += p(i).toDouble * c(i); i += 1 }
        pn - 2.0 * d + cn
      }.min
      total += best
    }
    total
  }

  /** Collect (id, vec) pairs for the driver-side k-means reference. */
  def collectVectors(emb: DataFrame, idCol: String, vecCol: String)
      : Array[(Long, Array[Float])] =
    emb.select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** Sequential Newton/IRLS logistic regression — the driver-side
    * reference the ml1 gate compares the distributed
    * Classifier.trainLogRegNewton against (same math, same iteration
    * count; differs only in float summation order). */
  def logregNewtonRef(rows: Array[(Array[Float], Int)], iters: Int,
      ridge: Double): Array[Double] = {
    val d = rows.head._1.length
    var w = new Array[Double](d)
    for (_ <- 1 to iters) {
      val g = new Array[Double](d)
      val h = Array.ofDim[Double](d, d)
      rows.foreach { case (x, y) =>
        var dot = 0.0
        var i = 0
        while (i < d) { dot += w(i) * x(i); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-dot))
        val r = p - y
        val q = p * (1.0 - p)
        i = 0
        while (i < d) {
          val xi = x(i).toDouble
          g(i) += r * xi
          var j = i
          while (j < d) { h(i)(j) += q * xi * x(j); j += 1 }
          i += 1
        }
      }
      val n = rows.length.toDouble
      for (i <- 0 until d; j <- i until d) {
        h(i)(j) /= n; h(j)(i) = h(i)(j)
      }
      for (i <- 0 until d) h(i)(i) += ridge
      val delta = solveGauss(h, g.map(_ / n))
      w = Array.tabulate(d)(i => w(i) - delta(i))
    }
    w
  }

  /** Independent linear solve (Gaussian elimination with partial
    * pivoting) — deliberately NOT the production Cholesky
    * (Classifier.solveSpd): this module's invariant is no shared
    * helpers, so a defect in the production solver cannot cancel out
    * against the same defect here. The ml1 parity gate's 1e-3
    * tolerance dwarfs the two solvers' float divergence on the
    * ridge-regularized (well-conditioned) Newton system. */
  private def solveGauss(a0: Array[Array[Double]],
      b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val b = b0.clone()
    for (c <- 0 until n) {
      var p = c
      for (r <- c + 1 until n) if (math.abs(a(r)(c)) > math.abs(a(p)(c))) p = r
      if (p != c) {
        val t = a(p); a(p) = a(c); a(c) = t
        val tb = b(p); b(p) = b(c); b(c) = tb
      }
      require(a(c)(c) != 0.0, "singular system in reference solve")
      for (r <- c + 1 until n) {
        val f = a(r)(c) / a(c)(c)
        if (f != 0.0) {
          var k = c
          while (k < n) { a(r)(k) -= f * a(c)(k); k += 1 }
          b(r) -= f * b(c)
        }
      }
    }
    val x = new Array[Double](n)
    for (i <- n - 1 to 0 by -1) {
      var s = b(i)
      var k = i + 1
      while (k < n) { s -= a(i)(k) * x(k); k += 1 }
      x(i) = s / a(i)(i)
    }
    x
  }
}
