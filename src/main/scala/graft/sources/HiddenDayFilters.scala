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
  * exists. For every time-column conjunct with a literal bound, the
  * IMPLIED day-column conjunct is derived (`ts >= T` implies
  * `p_day >= date(T)` because `p_day = to_date(ts)` is monotone in `ts`;
  * strict bounds relax to inclusive day bounds — conservative, never
  * wrong). Rows with a NULL time column live in the default partition
  * and are excluded by any time bound, exactly
  * [[Tables.Warehouse.readTimePruned]]'s documented contract.
  *
  * TWO derivation sites share [[HiddenDayBounds.derive]]:
  *
  *  - [[GraftTable]]'s scan builder ([[DayDerivingScanBuilder]]) derives
  *    at PUSHDOWN time, inside `pushFilters` — unconditional: every
  *    session that reads through the catalog gets real PartitionFilters,
  *    however the catalog was registered (the round-12 gap: the
  *    rule-only path left runtime-registered sessions unpruned).
  *  - [[DeriveHiddenDayFilters]], the injected optimizer rule
  *    (`graft.GraftExtensions`, pre-pushdown batch) keeps the derived
  *    conjunct visible in the OPTIMIZED LOGICAL plan too (join
  *    reordering, IN-subquery pushdown and DPP reason over it there);
  *    with the scan-builder derivation in place it is a belt over
  *    braces for correctness, still the only path that lets OTHER
  *    logical rules see the bound.
  */
private[sources] object HiddenDayBounds extends PredicateHelper {

  /** The implied day conjuncts of `conjuncts`' literal time bounds.
    * `castZone` must be the LAYOUT's day-derivation zone (UTC for
    * zone-prop tables) — deriving in a different zone than the writer
    * can prune a day dir holding matching rows (advice finding).
    * Literals are folded eagerly so repeated derivation is fixed-point
    * stable (a folded conjunct `semanticEquals` later derivations).
    */
  def derive(conjuncts: Seq[Expression], isTs: Expression => Boolean,
      day: Attribute, castZone: String): Seq[Expression] = {
    def timeLit(l: Literal): Boolean = l.dataType match {
      case TimestampType | TimestampNTZType | DateType => l.value != null
      case _ => false
    }
    def toDay(l: Literal): Expression = Literal.create(
      Cast(l, DateType, Some(castZone)).eval(), DateType)
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
    }
    // dedup against conjuncts already carrying the bound (the rule and
    // the scan builder both derive; the fixed point must not re-add) —
    // by SHAPE (class, day column, literal), not exprId: the rule's day
    // attribute and the builder's synthesized one differ by id
    def shape(e: Expression): Option[(Class[_], Any)] = e match {
      case GreaterThanOrEqual(d: Attribute, l: Literal) if d.name == day.name =>
        Some((e.getClass, l.value))
      case LessThanOrEqual(d: Attribute, l: Literal) if d.name == day.name =>
        Some((e.getClass, l.value))
      case EqualTo(d: Attribute, l: Literal) if d.name == day.name =>
        Some((e.getClass, l.value))
      case _ => None
    }
    val present = conjuncts.flatMap(shape).toSet
    derived.filter(d => !present.contains(shape(d).get)).distinct
  }

  /** The implied INDEX conjuncts (`p_hour` = hours since epoch,
    * `p_month` = months since epoch — both monotone in ts, Iceberg's
    * own transform definitions) of `conjuncts`' literal time bounds.
    * `indexOf` maps an instant's UTC micros to the index value; strict
    * bounds relax to inclusive index bounds, conservative as ever.
    */
  def deriveIndexed(conjuncts: Seq[Expression], isTs: Expression => Boolean,
      idx: Attribute, indexOf: Long => Any): Seq[Expression] = {
    def micros(l: Literal): Option[Long] = l.dataType match {
      case TimestampType | TimestampNTZType if l.value != null =>
        Some(l.value.asInstanceOf[Long])
      case DateType if l.value != null =>
        Some(l.value.asInstanceOf[Int].toLong * 86400000000L)
      case _ => None
    }
    def toIdx(l: Literal): Option[Expression] =
      micros(l).map(us => Literal(indexOf(us)))
    val derived = conjuncts.flatMap {
      case GreaterThanOrEqual(a, l: Literal) if isTs(a) =>
        toIdx(l).map(GreaterThanOrEqual(idx, _))
      case GreaterThan(a, l: Literal) if isTs(a) =>
        toIdx(l).map(GreaterThanOrEqual(idx, _))
      case LessThanOrEqual(a, l: Literal) if isTs(a) =>
        toIdx(l).map(LessThanOrEqual(idx, _))
      case LessThan(a, l: Literal) if isTs(a) =>
        toIdx(l).map(LessThanOrEqual(idx, _))
      case EqualTo(a, l: Literal) if isTs(a) =>
        toIdx(l).map(EqualTo(idx, _))
      case GreaterThanOrEqual(l: Literal, a) if isTs(a) =>
        toIdx(l).map(LessThanOrEqual(idx, _))
      case GreaterThan(l: Literal, a) if isTs(a) =>
        toIdx(l).map(LessThanOrEqual(idx, _))
      case LessThanOrEqual(l: Literal, a) if isTs(a) =>
        toIdx(l).map(GreaterThanOrEqual(idx, _))
      case LessThan(l: Literal, a) if isTs(a) =>
        toIdx(l).map(GreaterThanOrEqual(idx, _))
      case EqualTo(l: Literal, a) if isTs(a) =>
        toIdx(l).map(EqualTo(idx, _))
      case _ => None
    }
    def shape(e: Expression): Option[(Class[_], Any)] = e match {
      case GreaterThanOrEqual(d: Attribute, l: Literal) if d.name == idx.name =>
        Some((e.getClass, l.value))
      case LessThanOrEqual(d: Attribute, l: Literal) if d.name == idx.name =>
        Some((e.getClass, l.value))
      case EqualTo(d: Attribute, l: Literal) if d.name == idx.name =>
        Some((e.getClass, l.value))
      case _ => None
    }
    val present = conjuncts.flatMap(shape).toSet
    derived.filter(d => !present.contains(shape(d).get)).distinct
  }
}

/** The scan-builder face (see [[HiddenDayBounds]]): wraps the stock
  * parquet scan builder of a time-partitioned catalog table and derives
  * the implied `p_day` conjuncts INSIDE `pushFilters`, where
  * `FileScanBuilder` splits them off as real partition filters (the
  * split and the later partition-value binding are both BY NAME, so a
  * synthesized day attribute resolves). This makes hidden-day pruning
  * UNCONDITIONAL — a runtime-registered catalog (no session extensions,
  * q193's own configuration) prunes exactly like the extensions path.
  * Derived conjuncts are only injected when the layout's `p_day`
  * partition column was actually discovered (an empty just-created
  * table has none, and an unconsumed derived conjunct would surface as
  * an unresolvable residual). Aggregate pushdown forwards untouched.
  */
private[sources] class DayDerivingScanBuilder(
    inner: org.apache.spark.sql.execution.datasources.v2.FileScanBuilder,
    timeCol: String, layoutZone: Option[String], granularity: String,
    partitionSchema: org.apache.spark.sql.types.StructType)
  extends org.apache.spark.sql.connector.read.ScanBuilder
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
  with PredicateHelper {

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    import graft.sources.Tables.{PartHourCol, PartMonthCol}
    val conjuncts = filters.flatMap(splitConjunctivePredicates)
    val isTs: Expression => Boolean = {
      case a: Attribute => a.name.equalsIgnoreCase(timeCol)
      case _ => false
    }
    // these expressions bypass the analyzer (they go straight into the
    // partition-pruning binder), so attribute AND literal types must
    // match the DISCOVERED partition schema exactly — discovery infers
    // p_hour/p_month as int when the values fit, and a long literal
    // against an int partition value is a raw ClassCastException
    def discoveredType(c: String): Option[org.apache.spark.sql.types.DataType] =
      partitionSchema.fields.find(_.name == c).map(_.dataType)
    def asDiscovered(v: Long, dt: org.apache.spark.sql.types.DataType): Any =
      dt match {
        case org.apache.spark.sql.types.IntegerType => v.toInt
        case org.apache.spark.sql.types.LongType => v
        case _ => v
      }
    val dayDerived =
      if (discoveredType(PartDayCol).isEmpty) Nil
      else HiddenDayBounds.derive(conjuncts, isTs,
        AttributeReference(PartDayCol, DateType)(),
        layoutZone.getOrElse(
          org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    val hourDerived = discoveredType(PartHourCol) match {
      case Some(dt) if granularity == "hour" =>
        HiddenDayBounds.deriveIndexed(conjuncts, isTs,
          AttributeReference(PartHourCol, dt)(),
          us => asDiscovered(Math.floorDiv(us, 3600000000L), dt))
      case _ => Nil
    }
    val monthDerived = discoveredType(PartMonthCol) match {
      case Some(dt) if granularity == "month" =>
        HiddenDayBounds.deriveIndexed(conjuncts, isTs,
          AttributeReference(PartMonthCol, dt)(),
          us => {
            val d = java.time.LocalDate.ofEpochDay(
              Math.floorDiv(us, 86400000000L))
            asDiscovered((d.getYear - 1970) * 12 + (d.getMonthValue - 1), dt)
          })
      case _ => Nil
    }
    inner.pushFilters(conjuncts ++ dayDerived ++ hourDerived ++ monthDerived)
  }
  override def pushedFilters(): Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner.pushedFilters
  override def pruneColumns(requiredSchema: org.apache.spark.sql.types.StructType): Unit =
    inner.pruneColumns(requiredSchema)
  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    inner match {
      case a: org.apache.spark.sql.connector.read.SupportsPushDownAggregates =>
        a.pushAggregation(aggregation)
      case _ => false
    }
  override def supportCompletePushDown(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    inner match {
      case a: org.apache.spark.sql.connector.read.SupportsPushDownAggregates =>
        a.supportCompletePushDown(aggregation)
      case _ => false
    }
  override def build(): org.apache.spark.sql.connector.read.Scan = inner.build()
}

/** The injected-rule face (see [[HiddenDayBounds]]): ANDs the derived
  * day conjuncts into every Filter directly over a catalog-served
  * time-partitioned table, where the stock V2 pushdown turns them into
  * real PartitionFilters. Injected by `graft.GraftExtensions` (must run
  * BEFORE the optimizer's early scan push-down batch — `ExtensionsCheck`
  * proves the end-to-end plan in a fresh JVM); also appended to
  * `spark.experimental.extraOptimizations` for runtime-registered
  * sessions, where the scan-builder derivation already prunes and this
  * batch (running post-pushdown) stays correctness-neutral.
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
                val conjuncts = splitConjunctivePredicates(cond)
                val derived = HiddenDayBounds.derive(conjuncts,
                  e => e.isInstanceOf[Attribute] &&
                    e.asInstanceOf[Attribute].semanticEquals(ts),
                  day,
                  gt.hiddenTimeZone.getOrElse(conf.sessionLocalTimeZone))
                if (derived.isEmpty) f
                else Filter((conjuncts ++ derived).reduce(And), rel)
              case _ => f
            }
          case None => f
        }
        case _ => f
      }
  }
}
