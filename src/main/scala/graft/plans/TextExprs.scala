package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Winnowing fingerprints as a single-pass expression.
  *
  * Why not higher-order functions: composing `transform`/`element_at`
  * re-evaluates the inner array expression on every lambda access —
  * the staged formulation was O(n²·w) per document in interpreted eval
  * (239 s at sf0.1; an element_at-based rewrite was still quadratic
  * because CollapseProject inlines the intermediate arrays back into one
  * expression). This expression runs the whole pipeline — word hash,
  * k-gram combine, sliding-window min, dedupe+sort — in one imperative
  * pass per row. CodegenFallback costs one virtual call per ROW (not per
  * element), which is noise.
  *
  * Hash: FNV-1a 64-bit over the word's UTF-8 bytes (self-contained,
  * deterministic, no Spark-internal API).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      // Validate k/w at analysis time: SQL `winnow(arr, k, w)` accepts any
      // ints, and an out-of-range k would over-run the primes array (and
      // w < 1 the window arrays) with an AIOOBE at eval time.
      if (k < 1 || k > primes.length) TypeCheckResult.TypeCheckFailure(
        s"winnow k must be in [1, ${primes.length}], got $k")
      else if (w < 1) TypeCheckResult.TypeCheckFailure(
        s"winnow w must be >= 1, got $w")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"WinnowFingerprints requires array<string>, got ${other.simpleString}")
  }

  private val primes: Array[Long] =
    Array(1000003L, 8191L, 131L, 31L, 7L, 1L)

  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val nk = n - k + 1
    if (nk <= 0) return new GenericArrayData(Array.emptyLongArray)
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) { // null word hashes as empty (SQL-reachable arrays may hold nulls)
      val s = words.getUTF8String(i)
      wh(i) = fnv1a(if (s == null) Array.emptyByteArray else s.getBytes)
      i += 1
    }
    val kg = new Array[Long](nk)
    i = 0
    while (i < nk) {
      var acc = 0L
      var d = 0
      while (d < k) { acc += wh(i + d) * primes(d); d += 1 }
      kg(i) = acc
      i += 1
    }
    val nw = nk - w + 1
    if (nw <= 0) return new GenericArrayData(Array.emptyLongArray)
    val mins = new Array[Long](nw)
    i = 0
    while (i < nw) {
      var m = kg(i)
      var d = 1
      while (d < w) { if (kg(i + d) < m) m = kg(i + d); d += 1 }
      mins(i) = m
      i += 1
    }
    java.util.Arrays.sort(mins)
    var uniq = 0
    i = 0
    while (i < nw) {
      if (i == 0 || mins(i) != mins(i - 1)) { mins(uniq) = mins(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, uniq))
  }

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

/** Word n-gram repetition stats in one pass: total n-gram count and
  * distinct n-gram count per document, as struct<n_grams, n_distinct>.
  * The RefinedWeb/C4-style repetition filter signal (duplicated-n-gram
  * fraction) derives from these two integers — kept as exact counts so
  * the oracle comparison never touches float boundaries.
  *
  * Same rationale as [[WinnowFingerprints]]: a HOF formulation
  * (transform + array_distinct over a sliding concat) re-evaluates the
  * inner array per lambda access; this runs once per row with a single
  * hash set, no explode, no shuffle — embarrassingly parallel at 100 TB.
  */
case class RepetitionStats(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      if (n < 1) TypeCheckResult.TypeCheckFailure(
        s"repetition n must be >= 1, got $n")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"RepetitionStats requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val nw = words.numElements()
    val ng = nw - n + 1
    if (ng <= 0) return InternalRow(0L, 0L)
    // exact string identity (no hash truncation — collisions would
    // silently undercount distinct grams and diverge from the oracle)
    val seen = new java.util.HashSet[String](ng * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    var distinct = 0
    while (i < ng) {
      sb.setLength(0)
      var d = 0
      while (d < n) {
        if (d > 0) sb.append(' ')
        val w = words.getUTF8String(i + d)
        if (w != null) sb.append(w.toString)
        d += 1
      }
      if (seen.add(sb.toString)) distinct += 1
      i += 1
    }
    InternalRow(ng.toLong, distinct.toLong)
  }

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

object TextOps {
  def winnow(words: Column, k: Int = 3, w: Int = 4): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(words), k, w))

  def repetitionStats(words: Column, n: Int = 3): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(words), n))

  def simhash64(words: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(words)))

  def minhashSig(words: Column, n: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(words), n, numHashes))

  def minhashBands(words: Column, n: Int, bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(MinHashBands(ColumnBridge.expression(words), n, bands, rowsPerBand))
}
