package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Significant-figure currency formatting — behavioral port of the
  * reference's `FormatCurrency for f32` (reference
  * `src/table/scan.rs:7-34`): values with >= 10^sigFigs dollars fall back
  * to scientific notation with (sigFigs-4) mantissa decimals; otherwise
  * print with max(sigFigs - integerDigits, 1) decimals; trailing zeros and
  * a trailing dot are trimmed. Scientific output uses the bare `1.23e6`
  * exponent style the reference produces.
  */
object Format {

  def formatCurrency(v: Float, sigFigs: Int): String = {
    // "%.1e" renders Infinity as "Infinity" — no 'e' to split on; pass
    // non-finite values through instead of MatchError-ing the task
    if (v.isNaN || v.isInfinite) return String.valueOf(v)
    val res =
      if (v.toInt >= math.pow(10, sigFigs).toInt) {
        val s = String.format(s"%.${math.max(sigFigs - 4, 0)}e", Float.box(v))
        // Java renders 1.23e+06; the reference style is 1.23e6.
        val Array(mant, exp) = s.split("e")
        mant + "e" + exp.replace("+", "").replaceFirst("^(-?)0+", "$1")
      } else {
        var numDigits = 0
        var tmp = v
        while (tmp > 1.0f) { tmp /= 10.0f; numDigits += 1 }
        String.format(s"%.${math.max(sigFigs - numDigits, 1)}f", Float.box(v))
      }
    // The reference trims trailing zeros in BOTH branches, so "1.000e10"
    // becomes "1.000e1" there too — quirk preserved for parity.
    res.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
  }

  val formatCurrencyUdf: UserDefinedFunction =
    udf((v: Float, sigFigs: Int) => formatCurrency(v, sigFigs))

  def formatCurrencyCol(c: Column, sigFigs: Int): Column =
    formatCurrencyUdf(c, org.apache.spark.sql.functions.lit(sigFigs))

  def register(spark: SparkSession): Unit =
    spark.udf.register("format_currency", formatCurrencyUdf)
}
