package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions.col

/** P2: implicit projection from a typed function's input signature.
  *
  * The reference reflects the user UDF's argument NAMES and prunes the
  * scan to exactly those columns (reference `src/server/query.rs:167-186`:
  * the Julia fn's arg list drives which column files are mapped). The
  * Spark face: a case class IS the signature — its Encoder schema drives
  * the select list, so the parquet scan reads only the declared fields
  * (ProjectSpec asserts the pruned ReadSchema), and the `.as[T]` encoder
  * check is the static type check of the projection (P3: analysis error
  * on missing or type-mismatched columns).
  */
object Project {

  /** Project `df` to exactly the fields of `T`, by name, typed. */
  def projectAs[T: Encoder](df: DataFrame): Dataset[T] = {
    val fields = implicitly[Encoder[T]].schema.fieldNames.toSeq
    df.select(fields.map(col): _*).as[T]
  }

  /** The column names `T` would project (the reflected signature). */
  def columnsOf[T: Encoder]: Seq[String] =
    implicitly[Encoder[T]].schema.fieldNames.toSeq
}
