package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd dot product over array<float>/array<double> columns.
  *
  * Why a custom Catalyst Expression: Spark's higher-order functions
  * (`aggregate`, `zip_with`) are interpreted per element — a lambda
  * closure allocation and virtual dispatch per array slot — and they
  * break whole-stage codegen. For pairwise similarity over N×N candidate
  * pairs × 64 dims that interpretation dominated the entire benchmark
  * (97 s of a 140 s total at sf0.1). This expression compiles to a tight
  * primitive loop inside whole-stage codegen (preference order (b) of the
  * build brief: native Expression with doGenCode beats a Scala UDF).
  *
  * Accumulation is sequential left-to-right in double, identical to the
  * `aggregate(zip_with(...))` formulation it replaces, so results are
  * bit-for-bit unchanged — including on LENGTH MISMATCH, where zip_with
  * null-pads the shorter side and the aggregate propagates null: a
  * mismatched pair yields null, never a silently-truncated product.
  * Array elements must be non-null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true // null on length mismatch

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType | ByteType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"DotProduct requires array<float|double|tinyint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def get(x: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType => x.getFloat(i).toDouble
    case ByteType  => x.getByte(i).toDouble
    case _         => x.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      val lt = elemType(left)
      val rt = elemType(right)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += get(x, lt, i) * get(y, rt, i)
        i += 1
      }
      acc
    }
  }

  private def getter(dt: DataType): String = dt match {
    case FloatType => "getFloat"
    case ByteType  => "getByte"
    case _         => "getDouble"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = getter(elemType(left))
    val rGet = getter(elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Densify sparse (index, value) entries into a fixed-width
  * array<float> — the hashing-trick feature-assembly step
  * ([[graft.operators.Classifier.hashedBow]]).
  *
  * Why a custom Expression: the declarative alternatives are all
  * super-linear per row — `element_at` over a `map_from_entries` map is
  * a LINEAR SCAN of the map per probed index (O(width × entries) per
  * doc), and an `aggregate` HOF rebuilding an immutable array per entry
  * is O(width × entries) allocations — where this is one float[width]
  * allocation and one pass over the entries, O(width + entries), inside
  * whole-stage codegen. Entries out of [0, width) are ignored (callers
  * pmod first); duplicate indices accumulate. */
case class SparseFill(child: Expression, width: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(f0, f1)), _)
        if f0.dataType == IntegerType && f1.dataType == DoubleType =>
      if (width > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"width must be positive, got $width")
    case t => TypeCheckResult.TypeCheckFailure(
      s"SparseFill requires array<struct<int,double>> input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val entries = a.asInstanceOf[ArrayData]
    val out = new Array[Float](width)
    var i = 0
    val n = entries.numElements()
    while (i < n) {
      // null entries and null fields are SKIPPED (the type check can't
      // forbid them — ArrayType/StructType nullability is advisory)
      if (!entries.isNullAt(i)) {
        val e = entries.getStruct(i, 2)
        if (!e.isNullAt(0) && !e.isNullAt(1)) {
          val b = e.getInt(0)
          if (b >= 0 && b < width) out(b) += e.getDouble(1).toFloat
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val e = ctx.freshName("e")
      val b = ctx.freshName("b")
      s"""
         |float[] $out = new float[$width];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    org.apache.spark.sql.catalyst.InternalRow $e = $a.getStruct($i, 2);
         |    if (!$e.isNullAt(0) && !$e.isNullAt(1)) {
         |      int $b = $e.getInt(0);
         |      if ($b >= 0 && $b < $width) $out[$b] += (float) $e.getDouble(1);
         |    }
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SparseFill =
    copy(child = newChild)
}

/** Column-API surface for the vector expressions. */
object VectorOps {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def normSq(a: Column): Column = dot(a, a)

  /** Zero-norm-safe cosine from a precomputed dot and the two norms:
    * a zero-norm vector is DEFINED orthogonal to everything (cos = 0),
    * so it never crosses a positive threshold and sorts last under
    * top-k — and the division never executes when the denominator is
    * 0, which keeps the whole cosine family ANSI-mode safe
    * (spark.sql.ansi.enabled would otherwise raise DIVIDE_BY_ZERO
    * where non-ANSI silently dropped the pair as NaN). */
  def cosFrom(dot: Column, normA: Column, normB: Column): Column = {
    val den = normA * normB
    org.apache.spark.sql.functions.when(den > 0d, dot / den).otherwise(0d)
  }

  /** Driver-side scalar twin of [[cosFrom]] — same cos = 0 semantics
    * for the mapPartitions / collected-centroid code paths. */
  @inline def cosScalar(dot: Double, normA: Double, normB: Double): Double = {
    val den = normA * normB
    if (den > 0) dot / den else 0.0
  }

  def sparseFill(entries: Column, width: Int): Column =
    ColumnBridge.column(SparseFill(ColumnBridge.expression(entries), width))
}
