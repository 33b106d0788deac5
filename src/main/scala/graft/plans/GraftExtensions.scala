package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SparkSessionExtensions hook — makes graft's custom Catalyst
  * expressions available from SQL:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   spark.sql("SELECT vec_dot(a, b) FROM pairs")
  *
  * (or `GraftExtensions.register(spark)` on an existing session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.vecDotDescriptor)
    e.injectFunction(GraftExtensions.winnowDescriptor)
    e.injectFunction(GraftExtensions.repetitionDescriptor)
    e.injectFunction(GraftExtensions.simhashDescriptor)
    e.injectFunction(GraftExtensions.minhashDescriptor)
    e.injectOptimizerRule(_ => NanosPushdownRule)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "vec_dot takes exactly 2 arguments")
    DotProduct(exprs(0), exprs(1))
  }

  /** winnow(words_array[, k, w]) — k/w must be integer literals. */
  private def buildWinnow(exprs: Seq[Expression]): Expression = {
    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case _ => throw new IllegalArgumentException(s"winnow: $what must be an integer literal")
    }
    exprs match {
      case Seq(c)       => WinnowFingerprints(c, 3, 4)
      case Seq(c, k, w) => WinnowFingerprints(c, intLit(k, "k"), intLit(w, "w"))
      case _ => throw new IllegalArgumentException("winnow takes 1 or 3 arguments")
    }
  }

  private[graft] val vecDotDescriptor = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
    (exprs: Seq[Expression]) => build(exprs))

  private[graft] val winnowDescriptor = (
    FunctionIdentifier("winnow"),
    new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow"),
    (exprs: Seq[Expression]) => buildWinnow(exprs))

  /** repetition(words_array[, n]) — n must be an integer literal. */
  private def buildRepetition(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(c) => RepetitionStats(c, 3)
    case Seq(c, Literal(n: Int, _)) => RepetitionStats(c, n)
    case Seq(_, _) =>
      throw new IllegalArgumentException("repetition: n must be an integer literal")
    case _ => throw new IllegalArgumentException("repetition takes 1 or 2 arguments")
  }

  private[graft] val repetitionDescriptor = (
    FunctionIdentifier("repetition"),
    new ExpressionInfo(classOf[RepetitionStats].getName, "repetition"),
    (exprs: Seq[Expression]) => buildRepetition(exprs))

  private def buildSimhash(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(c) => SimHash64(c)
    case _ => throw new IllegalArgumentException("simhash64 takes 1 argument")
  }

  /** minhash(words_array, n, num_hashes) — ints must be literals. */
  private def buildMinhash(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(c, Literal(n: Int, _), Literal(k: Int, _)) => MinHashSig(c, n, k)
    case _ => throw new IllegalArgumentException(
      "minhash takes (words_array, n_literal, num_hashes_literal)")
  }

  private[graft] val simhashDescriptor = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (exprs: Seq[Expression]) => buildSimhash(exprs))

  private[graft] val minhashDescriptor = (
    FunctionIdentifier("minhash"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash"),
    (exprs: Seq[Expression]) => buildMinhash(exprs))

  /** Register on an already-built session: the custom Catalyst
    * expressions, plus the scalar function library (currency formatting,
    * trading calendar) and the fold UDAF — the full SQL face of graft's
    * function surface. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", build, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow", buildWinnow, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "repetition", buildRepetition, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", buildSimhash, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash", buildMinhash, "scala_udf")
    graft.functions.Calendar.register(spark)
    graft.functions.Format.register(spark)
    spark.udf.register("fold_sum_cents",
      org.apache.spark.sql.functions.udaf(graft.functions.Fold.ExactCentsSumValue))
  }
}
