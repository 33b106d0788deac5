package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Optimizer rule fixing the nanos-timestamp pushdown trap engine-side.
  *
  * The events table stores TIMESTAMP(NANOS), which we read as raw Long
  * nanos and convert with `timestamp_micros(ns div 1000)` (Tables.events;
  * reference stores i64 nanos, `src/schema.rs:8`). A range predicate on
  * the CONVERTED column survives alias substitution as
  * `MicrosToTimestamp(ns div 1000) cmp literal` — an expression the
  * parquet filter translation cannot handle, so only IsNotNull reaches
  * the scan and every row group is read.
  *
  * This rule augments such filters with the equivalent raw-nanos
  * conjunct (for positive epochs, `floor(ns/1000) >= m  ⟺  ns >= m*1000`
  * etc. — exact, not merely implied), which then pushes into parquet
  * row-group pruning. The original predicate is kept; the rewrite is a
  * pure win at any scale and turns a full scan into a seek, the Spark
  * face of the reference's binary-search time index
  * (`src/table/scan.rs:174-213`).
  */
object NanosPushdownRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Match `timestamp_micros(ns div 1000)` over a raw attribute. */
  private def nsOf(e: Expression): Option[Attribute] = e match {
    case MicrosToTimestamp(d: IntegralDivide) => (d.left, d.right) match {
      case (a: Attribute, Literal(1000L, _)) => Some(a)
      case _ => None
    }
    case _ => None
  }

  /** Largest micros literal whose derived ns bound (m*1000+1000) still
    * fits in Long. Beyond it (timestamps past ~2262, e.g. an open upper
    * bound of TIMESTAMP '9999-12-31') the multiplication would wrap
    * negative and the added conjunct would silently filter out ALL rows —
    * skip the rewrite instead; the original predicate remains correct. */
  private val MaxSafeMicros: Long = (Long.MaxValue - 1000L) / 1000L

  /** Positive-epoch micros of a timestamp literal (positivity makes the
    * truncating `div` identical to floor, keeping the rewrite exact). */
  private def microsOf(l: Literal): Option[Long] = l.dataType match {
    case TimestampType | TimestampNTZType => l.value match {
      case v: java.lang.Long if v > 0 && v <= MaxSafeMicros => Some(v.longValue())
      case _ => None
    }
    case _ => None
  }

  private def nsLit(v: Long): Literal = Literal(v)

  /** Raw-ns conjunct equivalent to `floor(ns/1000) cmp micros`. */
  private def implied(e: Expression): Option[Expression] = e match {
    case GreaterThanOrEqual(d, l: Literal) =>
      for (ns <- nsOf(d); m <- microsOf(l))
        yield GreaterThanOrEqual(ns, nsLit(m * 1000L))
    case GreaterThan(d, l: Literal) =>
      for (ns <- nsOf(d); m <- microsOf(l))
        yield GreaterThanOrEqual(ns, nsLit(m * 1000L + 1000L))
    case LessThanOrEqual(d, l: Literal) =>
      for (ns <- nsOf(d); m <- microsOf(l))
        yield LessThanOrEqual(ns, nsLit(m * 1000L + 999L))
    case LessThan(d, l: Literal) =>
      for (ns <- nsOf(d); m <- microsOf(l))
        yield LessThanOrEqual(ns, nsLit(m * 1000L - 1L))
    case EqualTo(d, l: Literal) =>
      for (ns <- nsOf(d); m <- microsOf(l))
        yield And(GreaterThanOrEqual(ns, nsLit(m * 1000L)),
                  LessThanOrEqual(ns, nsLit(m * 1000L + 999L)))
    case GreaterThanOrEqual(l: Literal, d) => implied(LessThanOrEqual(d, l))
    case GreaterThan(l: Literal, d)        => implied(LessThan(d, l))
    case LessThanOrEqual(l: Literal, d)    => implied(GreaterThanOrEqual(d, l))
    case LessThan(l: Literal, d)           => implied(GreaterThan(d, l))
    case EqualTo(l: Literal, d)            => implied(EqualTo(d, l))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extra = conjuncts.flatMap(implied)
        .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
        .foldLeft(Seq.empty[Expression]) { (acc, e) =>
          if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
        }
      if (extra.isEmpty) f
      else Filter((conjuncts ++ extra).reduce(And), child)
  }

  /** Install on an existing session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraOptimizations.contains(NanosPushdownRule))
      em.extraOptimizations = em.extraOptimizations :+ NanosPushdownRule
  }
}
