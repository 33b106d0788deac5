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
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
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

/** MinHash signature over word n-grams: array of `numHashes` universal-
  * hash minima, or null when the document has fewer than n words (the
  * exploded formulation emitted no rows for those — callers filter). */
case class MinHashSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  private val PRIME = 2147483647L // 2^31 - 1

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

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val nw = words.numElements()
    val ng = nw - this.n + 1
    if (ng <= 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < ng) {
      sb.setLength(0)
      var d = 0
      while (d < this.n) {
        if (d > 0) sb.append(' ')
        val w = words.getUTF8String(i + d)
        if (w != null) sb.append(w.toString)
        d += 1
      }
      // Spark `hash()`: Murmur3, seed 42, IntegerType result — then the
      // replaced pipeline cast it to Long (sign extension) before the
      // universal hash. Replicate exactly.
      val h = Murmur3HashFunction.hash(
        UTF8String.fromString(sb.toString), StringType, 42L).toInt.toLong
      var j = 0
      while (j < numHashes) {
        val a = 2L * j + 1
        val b = 1099511628211L * (j + 1) % PRIME
        val v = { val m = (h * a + b) % PRIME; if (m < 0) m + PRIME else m }
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}
