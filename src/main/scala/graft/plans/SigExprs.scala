package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Murmur3HashFunction, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-document signature expressions.
  *
  * The DataFrame formulations of SimHash and MinHash shuffle the ENTIRE
  * corpus to build signatures: explode tokens/shingles, then a 64-way
  * bit-count (simhash) or 72-way min (minhash) aggregation — at 100 TB
  * that shuffle dwarfs the actual dedup work. Both signatures are
  * document-local, so they belong in the scan stage: one imperative pass
  * per row, no explode, no aggregation, no exchange. Same rationale (and
  * skeleton) as [[WinnowFingerprints]] / [[RepetitionStats]].
  *
  * Hash compatibility is bit-exact with the formulations they replace —
  * token hash = Spark's `xxhash64` (XXH64, seed 42), shingle hash =
  * Spark's `hash` (Murmur3, seed 42, Int result sign-extended) — so
  * signatures, buckets, and final pair sets are unchanged.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"SimHash64 requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = words.getUTF8String(i)
      // xxhash64(NULL) evaluates to the seed itself in the exploded
      // reference formulation — a null token must contribute the seed's
      // bits here too or the two signatures diverge
      val h =
        if (s == null) 42L
        else XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

private[graft] object SigEval {
  val PRIME = 2147483647L // 2^31 - 1

  /** MinHash minima over word n-grams, or null when fewer than n words
    * (the exploded formulation emitted no rows for those docs).
    *
    * Gram bytes are assembled in a reusable buffer — UTF-8 of a
    * space-joined string == word bytes joined by 0x20, so no String
    * round-trip is needed to match the replaced `hash(concat_ws(...))`:
    * Spark `hash()` is Murmur3 seed 42 with an IntegerType result, which
    * the replaced pipeline sign-extended to Long before the universal
    * hash. Replicated exactly. */
  def minhash(words: ArrayData, n: Int, numHashes: Int,
      hashA: Array[Long], hashB: Array[Long]): Array[Long] = {
    val nw = words.numElements()
    val ng = nw - n + 1
    if (ng <= 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    // concat_ws SKIPS null elements and their separator (an empty
    // string keeps both) — track nullness apart from emptiness so the
    // gram bytes stay bit-identical to the replaced formulation
    val wNull: Array[Boolean] = Array.tabulate(nw)(words.isNullAt)
    val wb: Array[Array[Byte]] =
      Array.tabulate(nw) { i =>
        if (wNull(i)) Array.emptyByteArray else words.getUTF8String(i).getBytes
      }
    var maxLen = 0
    var i = 0
    while (i < ng) {
      var len = n - 1
      var d = 0
      while (d < n) { len += wb(i + d).length; d += 1 }
      if (len > maxLen) maxLen = len
      i += 1
    }
    val buf = new Array[Byte](maxLen)
    i = 0
    while (i < ng) {
      var pos = 0
      var d = 0
      var first = true
      while (d < n) {
        if (!wNull(i + d)) {
          if (!first) { buf(pos) = ' '; pos += 1 }
          val b = wb(i + d)
          System.arraycopy(b, 0, buf, pos, b.length)
          pos += b.length
          first = false
        }
        d += 1
      }
      val h = Murmur3HashFunction.hash(
        UTF8String.fromBytes(buf, 0, pos), StringType, 42L).toInt.toLong
      var j = 0
      while (j < numHashes) {
        val v = {
          val m = (h * hashA(j) + hashB(j)) % PRIME
          if (m < 0) m + PRIME else m
        }
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    mins
  }

  /** Splitmix64 finalizer — the standard deterministic scrambler for
    * turning an index into an unstructured 64-bit constant. */
  private def splitmix(x: Long): Long = {
    var z = x * 0x9E3779B97F4A7C15L + 0x632BE59BD9B4E019L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Universal-hash multipliers, pseudo-random in [1, PRIME-1].
    *
    * These were originally the tiny odd constants 2j+1, which makes the
    * family `(h·a_j + b_j) mod P` STRUCTURALLY correlated across j:
    * a_0 = 1 is the identity, and for a small shingle set the 72 argmin
    * draws share algebraic structure (a vs 2a vs 3a orderings), so a
    * boundary-jaccard pair can be missed DETERMINISTICALLY — the 30×
    * scale-stress run caught exactly one such pair (union of 10
    * shingles at jaccard 0.800) missed in every replica of one corpus
    * copy, where the independence model predicts a 3.4e-8 miss rate.
    * Unstructured full-range multipliers are the textbook
    * `(a·x + b) mod p` universal family (datasketch's construction) —
    * same single multiply per (gram, j), no structural coupling.
    * |h| < 2^31 and a < 2^31 keep `h·a` within a signed Long. */
  def coeffA(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(j =>
      java.lang.Math.floorMod(splitmix(j.toLong), PRIME - 1) + 1)
  def coeffB(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(j =>
      java.lang.Math.floorMod(splitmix(0x5DEECE66DL + j), PRIME))

  /** Stable identifier of a persisted signature configuration. Derived
    * from the ACTUAL multiplier values, so any change to the coefficient
    * scheme (like the round-7 `2j+1` → splitmix fix above) changes the
    * id automatically — there is no manual version constant to forget to
    * bump. Cross-batch state (e.g. streaming near-dup band rows) stamps
    * this id and refuses to mix families: estJaccard between signatures
    * from different families is ~random, so a silent mix doesn't fail —
    * it just stops matching. */
  def hashFamilyId(shingleN: Int, numHashes: Int, bands: Int): String = {
    val mix = (coeffA(numHashes) ++ coeffB(numHashes))
      .foldLeft(numHashes.toLong)((acc, x) => splitmix(acc ^ x))
    f"mh$shingleN%d-$numHashes%d-$bands%d-$mix%016x"
  }
}

/** MinHash signature over word n-grams: array of `numHashes` universal-
  * hash minima, or null when the document has fewer than n words. */
case class MinHashSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      if (n < 1 || numHashes < 1) TypeCheckResult.TypeCheckFailure(
        s"MinHashSig needs n >= 1 and numHashes >= 1, got ($n, $numHashes)")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"MinHashSig requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val hashA = SigEval.coeffA(numHashes)
  @transient private lazy val hashB = SigEval.coeffB(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val mins = SigEval.minhash(
      input.asInstanceOf[ArrayData], n, numHashes, hashA, hashB)
    if (mins == null) null else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** LSH band signatures in ONE evaluation: array of `bands` strings, each
  * the '_'-joined minima of its rows. Emitting the banded form directly
  * matters because referencing a signature array column from `bands ×
  * rows` band-string expressions lets CollapseProject inline the parent
  * projection and re-evaluate the signature per REFERENCE — the same
  * O(references) trap WinnowFingerprints documents. One expression, one
  * pass, one row. */
case class MinHashBands(child: Expression, n: Int, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      if (n < 1 || bands < 1 || rowsPerBand < 1) TypeCheckResult.TypeCheckFailure(
        s"MinHashBands needs positive n/bands/rowsPerBand, got ($n, $bands, $rowsPerBand)")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"MinHashBands requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val hashA = SigEval.coeffA(bands * rowsPerBand)
  @transient private lazy val hashB = SigEval.coeffB(bands * rowsPerBand)

  override def nullSafeEval(input: Any): Any = {
    val mins = SigEval.minhash(
      input.asInstanceOf[ArrayData], n, bands * rowsPerBand, hashA, hashB)
    if (mins == null) return null
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append('_')
        sb.append(mins(b * rowsPerBand + r))
        r += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashBands =
    copy(child = c)
}
