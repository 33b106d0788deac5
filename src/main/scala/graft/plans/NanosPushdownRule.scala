package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Optimizer rule fixing the timestamp-representation pushdown traps
  * engine-side. The events table's `ts` has shipped in two physical
  * shapes (Tables.events sniffs them), and each one leaves a derived
  * column between the user's range predicate and the parquet reader:
  *
  *  1. Stored TIMESTAMP(NANOS) read as raw Long nanos, converted with
  *     `timestamp_micros(ns div 1000)`. A range predicate on the
  *     CONVERTED column survives alias substitution as
  *     `MicrosToTimestamp(ns div 1000) cmp literal` — untranslatable to
  *     a parquet filter, so only IsNotNull reaches the scan.
  *  2. Stored µs timestamps with DERIVED nanos
  *     (`unix_micros(ts) * 1000`, Tables.eventsRawTs). A raw-ns range
  *     predicate is `(unix_micros(ts) * 1000) cmp nsLiteral` — same trap,
  *     opposite direction. Likewise a predicate on
  *     `cast(ts_ntz AS timestamp)` hides the stored NTZ attribute
  *     behind a cast the filter translation won't unwrap.
  *
  * This rule augments such filters with the equivalent predicate on the
  * STORED column — exact, not merely implied (for positive epochs
  * `floor(ns/1000) >= m ⟺ ns >= m*1000`; `µs*1000 >= n ⟺ µs >= ⌈n/1000⌉`;
  * under a UTC session the NTZ→TZ cast is the identity on micros) —
  * which then pushes into parquet row-group pruning. The original
  * predicate is kept; the rewrite is a pure win at any scale and turns a
  * full scan into a seek, the Spark face of the reference's
  * binary-search time index (`src/table/scan.rs:174-213`).
  */
object NanosPushdownRule extends Rule[LogicalPlan] with PredicateHelper {

  // ---- shape 1: stored Long nanos, derived timestamp --------------------

  /** Match `timestamp_micros(ns div 1000)` over a raw Long attribute. */
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

  // ---- shape 2: stored µs timestamps, derived nanos / cast --------------

  /** The cast is micros-identity only when it evaluates in UTC — the
    * graft session contract, but guard anyway (a DST zone's NTZ→TZ map
    * is not injective and the rewrite would be wrong). Normalized via
    * ZoneId so every UTC spelling qualifies (`Etc/UTC`, `+00:00`, `Z`,
    * `GMT`, ...) — matching only the literal string "UTC" silently
    * disabled the rewrite (a pushdown/perf regression with no
    * functional symptom) for sessions pinned to an alias zone. */
  private def utcCast(c: Cast): Boolean = {
    val tz = c.timeZoneId.getOrElse(conf.sessionLocalTimeZone)
    try java.time.ZoneId.of(tz).normalized == java.time.ZoneOffset.UTC
    catch { case _: java.time.DateTimeException => false }
  }

  /** A stored timestamp attribute, possibly behind a UTC NTZ→TZ cast. */
  private def storedTs(e: Expression): Option[Attribute] = e match {
    case a: Attribute if a.dataType == TimestampType => Some(a)
    case c: Cast if c.dataType == TimestampType => c.child match {
      case a: Attribute if a.dataType == TimestampNTZType && utcCast(c) =>
        Some(a)
      case _ => None
    }
    case _ => None
  }

  /** Match `unix_micros(ts) * 1000` — the derived-nanos column
    * Tables.eventsRawTs synthesizes when the file stores µs timestamps. */
  private def derivedNsOf(e: Expression): Option[Attribute] = e match {
    case Multiply(UnixMicros(t), Literal(1000L, _), _) => storedTs(t)
    case Multiply(Literal(1000L, _), UnixMicros(t), _) => storedTs(t)
    case _ => None
  }

  /** `cast(ts_ntz AS timestamp)` over a stored NTZ attribute (UTC). */
  private def castNtzOf(e: Expression): Option[Attribute] = e match {
    case c: Cast if c.dataType == TimestampType => c.child match {
      case a: Attribute if a.dataType == TimestampNTZType && utcCast(c) =>
        Some(a)
      case _ => None
    }
    case _ => None
  }

  /** Positive Long literal (a raw-nanos bound). Bounded away from
    * Long.MaxValue so ceil1000's `v + 999` cannot wrap negative and
    * silently filter out every row — skip the rewrite instead (the
    * original predicate stays correct), mirroring MaxSafeMicros. */
  private def nsValOf(l: Literal): Option[Long] = l.dataType match {
    case LongType => l.value match {
      case v: java.lang.Long if v > 0 && v <= Long.MaxValue - 999L =>
        Some(v.longValue())
      case _ => None
    }
    case _ => None
  }

  /** Micros literal typed to match the stored attribute (TZ or NTZ). */
  private def tsLit(a: Attribute, micros: Long): Literal =
    Literal(micros, a.dataType)

  private def ceil1000(v: Long): Long = (v + 999L) / 1000L

  // ---- per-comparison rewrites ------------------------------------------

  private def geq(d: Expression, l: Literal): Option[Expression] =
    nsOf(d).flatMap(a => microsOf(l).map(m =>
        GreaterThanOrEqual(a, nsLit(m * 1000L))))
      .orElse(derivedNsOf(d).flatMap(a => nsValOf(l).map(v =>
        GreaterThanOrEqual(a, tsLit(a, ceil1000(v))))))
      .orElse(castNtzOf(d).flatMap(a => microsOf(l).map(m =>
        GreaterThanOrEqual(a, tsLit(a, m)))))

  private def gt(d: Expression, l: Literal): Option[Expression] =
    nsOf(d).flatMap(a => microsOf(l).map(m =>
        GreaterThanOrEqual(a, nsLit(m * 1000L + 1000L))))
      .orElse(derivedNsOf(d).flatMap(a => nsValOf(l).map(v =>
        GreaterThanOrEqual(a, tsLit(a, v / 1000L + 1L)))))
      .orElse(castNtzOf(d).flatMap(a => microsOf(l).map(m =>
        GreaterThan(a, tsLit(a, m)))))

  private def leq(d: Expression, l: Literal): Option[Expression] =
    nsOf(d).flatMap(a => microsOf(l).map(m =>
        LessThanOrEqual(a, nsLit(m * 1000L + 999L))))
      .orElse(derivedNsOf(d).flatMap(a => nsValOf(l).map(v =>
        LessThanOrEqual(a, tsLit(a, v / 1000L)))))
      .orElse(castNtzOf(d).flatMap(a => microsOf(l).map(m =>
        LessThanOrEqual(a, tsLit(a, m)))))

  private def lt(d: Expression, l: Literal): Option[Expression] =
    nsOf(d).flatMap(a => microsOf(l).map(m =>
        LessThanOrEqual(a, nsLit(m * 1000L - 1L))))
      .orElse(derivedNsOf(d).flatMap(a => nsValOf(l).map(v =>
        LessThanOrEqual(a, tsLit(a, ceil1000(v) - 1L)))))
      .orElse(castNtzOf(d).flatMap(a => microsOf(l).map(m =>
        LessThan(a, tsLit(a, m)))))

  private def eq(d: Expression, l: Literal): Option[Expression] =
    nsOf(d).flatMap(a => microsOf(l).map(m =>
        And(GreaterThanOrEqual(a, nsLit(m * 1000L)),
            LessThanOrEqual(a, nsLit(m * 1000L + 999L)))))
      .orElse(derivedNsOf(d).flatMap(a => nsValOf(l).flatMap(v =>
        if (v % 1000L == 0L) Some(EqualTo(a, tsLit(a, v / 1000L))) else None)))
      .orElse(castNtzOf(d).flatMap(a => microsOf(l).map(m =>
        EqualTo(a, tsLit(a, m)))))

  /** Stored-column conjunct equivalent to a derived-column comparison. */
  private def implied(e: Expression): Option[Expression] = e match {
    case GreaterThanOrEqual(d, l: Literal) => geq(d, l)
    case GreaterThan(d, l: Literal)        => gt(d, l)
    case LessThanOrEqual(d, l: Literal)    => leq(d, l)
    case LessThan(d, l: Literal)           => lt(d, l)
    case EqualTo(d, l: Literal)            => eq(d, l)
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
