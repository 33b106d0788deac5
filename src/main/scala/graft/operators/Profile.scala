package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic one-pass data profile — the catalog's C3 `describe` (schema)
  * extended to data statistics for ANY table: per column, non-null
  * count, approximate distinct cardinality (HLL — the 100 TB-safe
  * choice; `profile1` shows the exact variant and its Expand cost), and
  * min/max for atomic types. All statistics fold in ONE aggregate pass
  * over one scan; the result is column-count-sized, so collecting it is
  * metadata work, not data work.
  */
object Profile {

  private def atomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType | BinaryType => false
    case _ => true
  }

  /** Long-format profile: one output row per input column. */
  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(count(c).as(s"__cnt_${f.name}"),
        approx_count_distinct(c).as(s"__dst_${f.name}")) ++
        (if (atomic(f.dataType))
          Seq(min(c).cast(StringType).as(s"__min_${f.name}"),
            max(c).cast(StringType).as(s"__max_${f.name}"))
        else Nil)
    } :+ count(lit(1)).as("__rows")
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = r.getAs[Long]("__rows")
    val out = fields.map { f =>
      val nn = r.getAs[Long](s"__cnt_${f.name}")
      Row(f.name, f.dataType.simpleString, nRows, nRows - nn,
        r.getAs[Long](s"__dst_${f.name}"),
        if (atomic(f.dataType)) r.getAs[String](s"__min_${f.name}") else null,
        if (atomic(f.dataType)) r.getAs[String](s"__max_${f.name}") else null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toIndexedSeq, 1),
      StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("type", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_nulls", LongType, nullable = false),
        StructField("approx_distinct", LongType, nullable = false),
        StructField("min", StringType, nullable = true),
        StructField("max", StringType, nullable = true))))
  }
}
