package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Restores parquet scan pruning for epoch-range filters over the
  * normalized `events.ts` column ([[graft.core.Tables.load]]).
  *
  * The loader projects the raw timestamp column to a ns-epoch long
  * (`unix_micros(cast(ts, TIMESTAMP, 'UTC')) * 1000`). Catalyst pushes a
  * range filter on that derived column through the Project by
  * substitution, but the resulting scan predicate compares an EXPRESSION
  * of `ts`, which the parquet source cannot translate — so footer
  * statistics, row-group pruning, and partition pruning are all lost
  * exactly on the filter shape a 100 TB event table is organized for
  * (time ranges). This rule adds an IMPLIED bare-attribute conjunct
  * alongside the original predicate:
  *
  * {{{ (unix_micros(ts_utc) * 1000) >= L  ⟹  ts >= µs-literal(⌊L/1000⌋) }}}
  *
  * The original predicate stays (exactness), the added bound is a
  * superset by construction (floor division on lower bounds, upper
  * bounds likewise conservative), and being a plain
  * `attribute cmp literal` it reaches the scan as a pushed filter —
  * `PushedFilters: [..., GreaterThanOrEqual(ts,...)]`, pinned by
  * TsRangePushdownSpec. Rewrites apply only when the inner cast's zone
  * is pinned UTC (the loader's form), where wall-clock µs and epoch µs
  * coincide and the bound is valid in the raw column's own domain.
  * Idempotent: a bound already present (semantically) is not re-added,
  * so the fixed-point optimizer batch terminates.
  */
object TsRangePushdown extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  private def isUtc(tz: String): Boolean =
    tz == "UTC" || tz == "Etc/UTC" || tz == "+00:00" || tz == "Z"

  /** Matches the loader's ns-of-ts projection over the raw column:
    * `unix_micros(cast(ts_ntz, TIMESTAMP, UTC)) * 1000` or, for
    * µs-adjusted files read as TIMESTAMP, `unix_micros(ts) * 1000`.
    * Yields the raw attribute and its (timestamp) type.
    */
  private object NsOfTs {
    def unapply(e: Expression): Option[(Attribute, DataType)] = e match {
      case Multiply(inner, Literal(1000L, LongType), _) => micros(inner)
      case Multiply(Literal(1000L, LongType), inner, _) => micros(inner)
      case _ => None
    }
    private def micros(e: Expression): Option[(Attribute, DataType)] = e match {
      case UnixMicros(Cast(a: Attribute, TimestampType, Some(tz), _))
          if a.dataType == TimestampNTZType && isUtc(tz) =>
        Some((a, TimestampNTZType))
      case UnixMicros(a: Attribute) if a.dataType == TimestampType =>
        Some((a, TimestampType))
      case _ => None
    }
  }

  /** The implied, scan-translatable bound for one conjunct, if any.
    * Every rewrite uses floor division so the bound admits a SUPERSET of
    * the original predicate's rows (the exact predicate still runs):
    * `us·1000 ≥ L ⟹ us ≥ ⌊L/1000⌋`, `us·1000 > L ⟹ us ≥ ⌊L/1000⌋`,
    * `us·1000 ≤ L ⟹ us ≤ ⌊L/1000⌋`, `us·1000 < L ⟹ us ≤ ⌊L/1000⌋`,
    * and equality only when L is an exact µs multiple.
    */
  private[plans] def impliedBound(e: Expression): Option[Expression] = {
    def lit(us: Long, dt: DataType) = Literal(us, dt)
    e match {
      case GreaterThanOrEqual(NsOfTs(a, dt), Literal(l: Long, LongType)) =>
        Some(GreaterThanOrEqual(a, lit(Math.floorDiv(l, 1000L), dt)))
      case GreaterThan(NsOfTs(a, dt), Literal(l: Long, LongType)) =>
        Some(GreaterThanOrEqual(a, lit(Math.floorDiv(l, 1000L), dt)))
      case LessThanOrEqual(NsOfTs(a, dt), Literal(l: Long, LongType)) =>
        Some(LessThanOrEqual(a, lit(Math.floorDiv(l, 1000L), dt)))
      case LessThan(NsOfTs(a, dt), Literal(l: Long, LongType)) =>
        Some(LessThanOrEqual(a, lit(Math.floorDiv(l, 1000L), dt)))
      case EqualTo(NsOfTs(a, dt), Literal(l: Long, LongType))
          if l % 1000L == 0 =>
        Some(EqualTo(a, lit(l / 1000L, dt)))
      // literal-first spellings
      case GreaterThanOrEqual(Literal(l: Long, LongType), NsOfTs(a, dt)) =>
        Some(LessThanOrEqual(a, lit(Math.floorDiv(l, 1000L), dt)))
      case GreaterThan(Literal(l: Long, LongType), NsOfTs(a, dt)) =>
        Some(LessThanOrEqual(a, lit(Math.floorDiv(l, 1000L), dt)))
      case LessThanOrEqual(Literal(l: Long, LongType), NsOfTs(a, dt)) =>
        Some(GreaterThanOrEqual(a, lit(Math.floorDiv(l, 1000L), dt)))
      case LessThan(Literal(l: Long, LongType), NsOfTs(a, dt)) =>
        Some(GreaterThanOrEqual(a, lit(Math.floorDiv(l, 1000L), dt)))
      case EqualTo(Literal(l: Long, LongType), NsOfTs(a, dt))
          if l % 1000L == 0 =>
        Some(EqualTo(a, lit(l / 1000L, dt)))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val implied = conjuncts.flatMap(impliedBound)
        .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
      if (implied.isEmpty) f
      else Filter((conjuncts ++ implied).reduce(And), child)
  }
  // conjunct splitting comes from Catalyst's own PredicateHelper — same
  // behavior as the hand-rolled recursion it replaces, aligned with how
  // upstream optimizer rules split
}
