package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Oracle-exact money arithmetic.
  *
  * The driver's correctness gate hash-compares our results against DuckDB.
  * Summing IEEE doubles is order-dependent, and Spark's partial aggregation
  * order differs from DuckDB's — so any double SUM would be off by ulps and
  * fail the hash. All monetary/quantity columns in the test data are
  * 2-decimal-digit doubles; routing them through DECIMAL makes every sum
  * exact and engine-independent, and the final cast back to DOUBLE is
  * correctly rounded in both engines → bit-identical results.
  *
  * The reference does the analogous thing: it widens f32→f64 *before*
  * accumulating (reference `tests/main.rs:115,166-171`); we widen
  * double→decimal before accumulating for the same reproducibility reason.
  *
  * Precision choices keep every intermediate ≤ DECIMAL(38,_) in both
  * engines: dec2 = (12,2) values, one = (3,2), so a product chain
  * (12,2)*(3,2)*(3,2) = (20,6) and its SUM stays exact.
  */
object Dec {
  /** Cast a 2-dp double column to DECIMAL(12,2) (exact for test data). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Literal 1.00 as DECIMAL(3,2) — for (1 - discount) style factors. */
  val one: Column = lit(BigDecimal(1).setScale(2)).cast(DecimalType(3, 2))

  /** SUM(dec2(c)) surfaced as DOUBLE — exact, engine-independent. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** SUM(dec2(a) * (1 - dec2(disc))) as DOUBLE — the TPC-H revenue shape. */
  def sumRevenue(price: Column, disc: Column): Column =
    sum(dec2(price) * (one - dec2(disc))).cast(DoubleType)

  /** Matching DuckDB SQL fragments (keep in sync with the above). */
  val SQL_ONE = "CAST(1 AS DECIMAL(3,2))"
  def sqlDec2(col: String): String = s"CAST($col AS DECIMAL(12,2))"
  def sqlSumMoney(col: String): String =
    s"CAST(SUM(${sqlDec2(col)}) AS DOUBLE)"
  def sqlSumRevenue(price: String, disc: String): String =
    s"CAST(SUM(${sqlDec2(price)} * ($SQL_ONE - ${sqlDec2(disc)})) AS DOUBLE)"
}
