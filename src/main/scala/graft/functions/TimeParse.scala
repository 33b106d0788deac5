package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{LongType, TimestampType}

/** F1: tolerant multi-format timestamp parsing — behavioral port of the
  * reference's `string_to_nanoseconds` (reference
  * `src/server/query.rs:46-69`), which accepts integer epoch nanos,
  * RFC-3339, or `%Y-%m-%d`. Spark-side it's a codegen'd coalesce of
  * try-casts (no UDF). */
object TimeParse {

  /** Exact ns→µs truncation. `/` on Columns is DOUBLE division — epoch
    * nanos (~1.7e18) exceed 2^53, so the truncated quotient can be off
    * by 1µs. IntegralDivide matches the reference's i64 truncation and
    * the `ts div 1000` used on the events read path (Tables.events). */
  private def div1000(c: Column): Column =
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(c.cast(LongType)), Literal(1000L)))

  /** Parse a string column: integer nanos | RFC-3339 | yyyy-MM-dd. */
  def parseTs(c: Column): Column = {
    val asNanos = try_to_number(c, lit("999999999999999999999")).cast(LongType)
    coalesce(
      timestamp_micros(div1000(asNanos)),
      try_to_timestamp(c), // RFC-3339 / ISO timestamps
      try_to_timestamp(c, lit("yyyy-MM-dd")))
  }

  /** The reference's F6: epoch nanos -> timestamp (µs truncation). */
  def nanosToTs(c: Column): Column =
    timestamp_micros(div1000(c))

  /** Timestamp -> epoch nanos (µs-resolution payload in ns units). */
  def tsToNanos(c: Column): Column =
    (unix_micros(c.cast(TimestampType)) * 1000L)
}
