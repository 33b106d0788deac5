package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the time-series join the reference's
  * domain implies but never implements (SURVEY.md §2.3: its shared symbol
  * dictionaries are a pre-materialized join key, nothing more).
  *
  * Semantics: for each left row, attach the latest right row with
  * `right.ts <= left.ts` and equal key (inclusive, like DuckDB ASOF).
  *
  * Implementation is the union+last-value trick, chosen for scale: both
  * sides are unioned with a side tag and processed in ONE shuffle
  * (hash-partition by key, sort by ts within partition) — no row
  * explosion, no range-join quadratic blowup, no broadcast requirement.
  * At 100 TB this is a single exchange of left+right, which is the lower
  * bound for a key-matched as-of join; skewed keys can be salted upstream.
  * Right-side ties on ts are broken by `rightTiebreak` (highest wins) so
  * results are deterministic.
  */
object AsOfJoin {

  /** `toleranceMicros`: maximum staleness — a match older than
    * `left.ts - tolerance` is discarded (null-padded), the trade↔quote
    * "quote must be fresh" bound. Applied as a post-match filter on the
    * same single-shuffle plan (the window already found the latest
    * right row; staleness is a per-row predicate on it, costing no
    * extra exchange). */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      rightTiebreak: String,
      prefix: String = "asof_",
      toleranceMicros: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    val l = left.select(
      col(key).as("__key"),
      col(leftTs).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast("long").as("__tie"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(structOf(right, rightTs +: rightCols)).as("__r"))
    val r = right.select(
      col(key).as("__key"),
      col(rightTs).as("__ts"),
      lit(0).as("__side"),
      col(rightTiebreak).cast("long").as("__tie"),
      lit(null).cast(structOf(left, leftCols)).as("__l"),
      struct((rightTs +: rightCols).map(col): _*).as("__r"))

    // Rights sort before lefts at equal ts (side 0 < 1) => inclusive <=;
    // among equal-ts rights the max tiebreak is "last".
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val found = l.unionByName(r)
      .withColumn("__m0", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val matched = toleranceMicros match {
      case Some(tol) => found.withColumn("__m",
        when(unix_micros(col("__ts")) - unix_micros(col(s"__m0.$rightTs")) <= tol,
          col("__m0")))
      case None => found.withColumn("__m", col("__m0"))
    }

    val out = leftCols.map(c => col(s"__l.$c").as(c)) ++
      (rightTs +: rightCols).map(c => col(s"__m.$c").as(s"$prefix$c"))
    matched.select(out: _*)
  }

  private def structOf(df: DataFrame, cols: Seq[String]) = {
    import org.apache.spark.sql.types.StructType
    StructType(cols.map(c => df.schema(c)))
  }
}
