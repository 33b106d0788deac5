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
    e.injectOptimizerRule(_ => NanosPushdownRule)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "vec_dot takes exactly 2 arguments")
    DotProduct(exprs(0), exprs(1))
  }

  private[graft] val vecDotDescriptor = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
    (exprs: Seq[Expression]) => build(exprs))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", build, "scala_udf")
}
