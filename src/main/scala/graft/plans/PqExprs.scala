package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd product-quantization kernels (see operators/Pq.scala for
  * the algorithm and the 100 TB rationale).
  *
  * Why custom Expressions: the Column-combinator formulation of the PQ
  * encoder — m argmins, each `array_position(array(ksub exprs), ...)`
  * over literal sub-centroid arrays — materializes m·ksub literal
  * arrays INTO THE EXPRESSION TREE. At m=16, ksub=16 the generated Java
  * for one projection exceeds janino's 64KB method limit, so Spark
  * logs "Whole-stage codegen disabled" and evaluates the whole stage
  * interpreted. Here the codebook is a single flat double[] reference
  * object and the argmin is a three-deep primitive loop: tiny generated
  * code regardless of m/ksub, fully inside whole-stage codegen.
  *
  * Arithmetic is kept bitwise-identical to the combinator form it
  * replaces: sequential left-to-right double accumulation (the
  * DotProduct contract), distance ranked as −2·v_s·c + |c|², ties
  * resolved to the LOWEST code (array_min + first array_position
  * semantics — strict `<` keeps the earliest minimum).
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private def m: Int = books.length
  private def ksub: Int = books(0).length
  private def subDim: Int = books(0)(0).length

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true // null on dim mismatch

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      if (books.isEmpty || books(0).isEmpty || books(0)(0).isEmpty)
        TypeCheckResult.TypeCheckFailure("PqEncode: empty codebooks")
      else if (!books.forall(b => b.length == ksub && b.forall(_.length == subDim)))
        TypeCheckResult.TypeCheckFailure("PqEncode: ragged codebooks")
      else if (ksub > 128)
        TypeCheckResult.TypeCheckFailure(
          s"PqEncode: ksub=$ksub exceeds the byte code space (max 128)")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"PqEncode requires array<float|double> input, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** books flattened to (s·ksub + c)·subDim + i — one cache-friendly
    * double[] instead of m·ksub boxed arrays. */
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](m * ksub * subDim)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        System.arraycopy(books(s)(c), 0, out, (s * ksub + c) * subDim, subDim)
        c += 1
      }
      s += 1
    }
    out
  }

  /** |c|² per (s, c), the query-independent half of the distance. */
  @transient private lazy val norms: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        var n = 0.0
        val b = books(s)(c)
        var i = 0
        while (i < subDim) { n += b(i) * b(i); i += 1 }
        out(s * ksub + c) = n
        c += 1
      }
      s += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * subDim) return null
    val fl = isFloat
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var bi = 0
      var c = 0
      while (c < ksub) {
        var dot = 0.0
        val boff = (s * ksub + c) * subDim
        val voff = s * subDim
        var i = 0
        while (i < subDim) {
          val e = if (fl) v.getFloat(voff + i).toDouble else v.getDouble(voff + i)
          dot += e * flat(boff + i)
          i += 1
        }
        val d = -2.0 * dot + norms(s * ksub + c)
        if (d < best) { best = d; bi = c }
        c += 1
      }
      out(s) = bi.toByte
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
    val normRef = ctx.addReferenceObj("pqNorms", norms, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val boff = ctx.freshName("boff")
      val d = ctx.freshName("d")
      s"""
         |if ($v.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  byte[] $out = new byte[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bi = 0;
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      double $dot = 0.0;
         |      int $boff = ($s * $ksub + $c) * $subDim;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        $dot += ((double) $v.$get($s * $subDim + $i)) * $flatRef[$boff + $i];
         |      }
         |      double $d = -2.0 * $dot + $normRef[$s * $ksub + $c];
         |      if ($d < $best) { $best = $d; $bi = $c; }
         |    }
         |    $out[$s] = (byte) $bi;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** Σ_s lut(s·ksub + code_s) over an m-byte PQ code column — the ADC
  * lookup half. One expression per LUT (the m `element_at`s over m
  * literal arrays it replaces were another tree-size multiplier).
  * Summation is sequential s = 0..m−1, matching the left-to-right
  * `reduce(_ + _)` of the combinator form bitwise. Null on a code array
  * of the wrong length or a code byte outside [0, ksub). */
case class PqLutSum(child: Expression, lut: Array[Double], ksub: Int)
    extends UnaryExpression {

  private def m: Int = lut.length / ksub

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) =>
      if (ksub < 1 || lut.isEmpty || lut.length % ksub != 0)
        TypeCheckResult.TypeCheckFailure(
          s"PqLutSum: lut length ${lut.length} not a positive multiple of ksub=$ksub")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"PqLutSum requires array<tinyint> codes, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    if (codes.numElements() != m) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getByte(s)
      if (c < 0 || c >= ksub) return null
      acc += lut(s * ksub + c)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "double[]")
    nullSafeCodeGen(ctx, ev, codes => {
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      s"""
         |if ($codes.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |    byte $c = $codes.getByte($s);
         |    if ($c < 0 || $c >= $ksub) { ${ev.isNull} = true; }
         |    else { $acc += $lutRef[$s * $ksub + $c]; }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PqLutSum =
    copy(child = c)
}

/** Column-API surface for the PQ expressions. */
object PqOps {
  def encode(v: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), books))

  /** `luts(s)(c)` — per-subspace lookup tables, flattened internally. */
  def lutSum(codes: Column, luts: Array[Array[Double]]): Column = {
    val ksub = luts(0).length
    require(luts.forall(_.length == ksub), "ragged LUT")
    ColumnBridge.column(PqLutSum(ColumnBridge.expression(codes), luts.flatten, ksub))
  }
}
