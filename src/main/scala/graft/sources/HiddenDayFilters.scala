package graft.sources

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

import graft.sources.Tables.PartDayCol

/** Transform-aware pruning for HIDDEN time partitioning — the read half
  * of the Iceberg `days(ts)` contract: a SQL user filters on the TIME
  * column and the day partitions prune without the user knowing `p_day`
  * exists. For every time-column conjunct with a literal bound on a
  * catalog-served time-partitioned table, derive the IMPLIED day-column
  * conjunct (`ts >= T` implies `p_day >= date(T)` because
  * `p_day = to_date(ts)` is monotone in `ts`; strict bounds relax to
  * inclusive day bounds — conservative, never wrong) and AND it into the
  * filter, where the stock V2 pushdown turns it into real
  * PartitionFilters. Derived conjuncts already present are not re-added
  * (fixed-point safe); rows with a NULL time column live in the default
  * partition and are excluded by any time bound, exactly
  * [[Tables.Warehouse.readTimePruned]]'s documented contract.
  *
  * Injected by `graft.GraftExtensions` (the rule must run BEFORE the
  * optimizer's early scan push-down batch to become PartitionFilters —
  * `ExtensionsCheck` proves the end-to-end plan in a fresh JVM); also
  * appended to `spark.experimental.extraOptimizations` for
  * runtime-registered sessions, where it still guarantees the derived
  * predicate (correctness-neutral) even when that batch runs too late
  * to prune.
  */
object DeriveHiddenDayFilters extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel: DataSourceV2Relation) =>
      rel.table match {
        case gt: GraftTable => gt.hiddenTimeColumn match {
          case Some(tc) =>
            val tsAttr = rel.output.find(_.name.equalsIgnoreCase(tc))
            val dayAttr = rel.output.find(_.name == PartDayCol)
            (tsAttr, dayAttr) match {
              case (Some(ts), Some(day)) =>
                derive(f, cond, ts, day, rel, gt.hiddenTimeZone)
              case _ => f
            }
          case None => f
        }
        case _ => f
      }
  }

  private def derive(f: Filter, cond: Expression, ts: Attribute,
      day: Attribute, rel: DataSourceV2Relation,
      layoutZone: Option[String]): LogicalPlan = {
    def timeLit(l: Literal): Boolean = l.dataType match {
      case TimestampType | TimestampNTZType | DateType => l.value != null
      case _ => false
    }
    // fold the cast NOW: the optimizer would constant-fold a
    // Cast(literal) anyway, and a folded conjunct no longer
    // semanticEquals the unfolded derivation — the dedup below must see
    // the exact shape later iterations will, or the fixed point re-adds
    // a duplicate every pass.
    // The cast's zone is the LAYOUT's declared derivation zone (UTC for
    // zone-prop tables), not the reader session's: deriving in a
    // different zone than the writer can prune a day dir that holds
    // rows satisfying the ts predicate (advice finding). Legacy tables
    // (no zone prop) keep the session zone — the documented hazard.
    val castZone = layoutZone.getOrElse(conf.sessionLocalTimeZone)
    def toDay(l: Literal): Expression = Literal.create(
      Cast(l, DateType, Some(castZone)).eval(), DateType)
    def isTs(e: Expression): Boolean = e match {
      case a: Attribute => a.semanticEquals(ts)
      case _ => false
    }
    val conjuncts = splitConjunctivePredicates(cond)
    val derived = conjuncts.flatMap {
      case GreaterThanOrEqual(a, l: Literal) if isTs(a) && timeLit(l) =>
        Some(GreaterThanOrEqual(day, toDay(l)))
      case GreaterThan(a, l: Literal) if isTs(a) && timeLit(l) =>
        Some(GreaterThanOrEqual(day, toDay(l))) // strict ts > T keeps day(T)
      case LessThanOrEqual(a, l: Literal) if isTs(a) && timeLit(l) =>
        Some(LessThanOrEqual(day, toDay(l)))
      case LessThan(a, l: Literal) if isTs(a) && timeLit(l) =>
        Some(LessThanOrEqual(day, toDay(l)))
      case EqualTo(a, l: Literal) if isTs(a) && timeLit(l) =>
        Some(EqualTo(day, toDay(l)))
      // literal-first spellings mirror
      case GreaterThanOrEqual(l: Literal, a) if isTs(a) && timeLit(l) =>
        Some(LessThanOrEqual(day, toDay(l)))
      case GreaterThan(l: Literal, a) if isTs(a) && timeLit(l) =>
        Some(LessThanOrEqual(day, toDay(l)))
      case LessThanOrEqual(l: Literal, a) if isTs(a) && timeLit(l) =>
        Some(GreaterThanOrEqual(day, toDay(l)))
      case LessThan(l: Literal, a) if isTs(a) && timeLit(l) =>
        Some(GreaterThanOrEqual(day, toDay(l)))
      case EqualTo(l: Literal, a) if isTs(a) && timeLit(l) =>
        Some(EqualTo(day, toDay(l)))
      case _ => None
    }.filterNot(d => conjuncts.exists(_.semanticEquals(d)))
    if (derived.isEmpty) f
    else Filter((conjuncts ++ derived).reduce(And), rel)
  }
}
