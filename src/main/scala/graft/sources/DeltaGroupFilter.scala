package graft.sources

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, DynamicPruningSubquery, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.{Inner, InnerLike, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, WriteDelta}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** Runtime target-scan narrowing for DELTA-BASED row-level writes
  * (round-15 verdict item 3): Spark's own
  * `RowLevelOperationRuntimeGroupFiltering` matches only `ReplaceData`
  * (verified against the 4.1.2 bytecode, SCALE.md round-15), so a
  * merge-on-read `MERGE INTO` full-scanned its target — correct (the
  * join discards non-matching rows) but a 100 TB MOR table paid a full
  * read per point-merge. This rule closes the gap for [[WriteDelta]]
  * plans the same way Spark closes it for COW:
  *
  *   1. find the target-side [[GroupCowScan]] relation inside the
  *      delta query's join (the MOR MERGE target scan is planned as a
  *      runtime-filterable file-granular scan for exactly this hook);
  *   2. for every equi-conjunct `targetCol = sourceExpr` of the join
  *      condition whose target column carries zone-map evidence, plan a
  *      [[DynamicPruningSubquery]] over the DISTINCT source keys;
  *   3. leave the filter directly above the scan relation —
  *      `DataSourceV2Strategy` splits DynamicPruning conjuncts into
  *      `BatchScanExec.runtimeFilters`, the subquery executes once at
  *      runtime, and the scan's `SupportsRuntimeV2Filtering.filter`
  *      probes the keys against the per-file blooms/intervals
  *      ([[graft.plans.ZoneMap.keyedSurvivors]]) and re-plans only the
  *      files that can hold a matched row.
  *
  * LEGALITY: narrowing the target side is sound only when the join
  * discards target rows that match no source row — Inner, RightOuter
  * with the target on the left, LeftOuter with the target on the
  * right, LeftSemi with the target on the left. A FULL OUTER join (a
  * MERGE with NOT MATCHED BY SOURCE clauses needs every target row)
  * never narrows. Every fallback keeps the full scan — conservative,
  * never a wrong subset.
  *
  * Runs via `spark.experimental.extraOptimizations` (the LAST optimizer
  * batch — after pushdown, so the post-pushdown
  * [[DataSourceV2ScanRelation]] shape is what it matches); registered
  * lazily by the catalog when a delta operation is planned and by
  * [[graft.functions.GraftFunctions.register]].
  */
private[graft] object DeltaRuntimeGroupFiltering extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // fast path: almost no plan is a delta write — one instanceOf beats
    // a transformDown allocation per query in the last optimizer batch
    if (!plan.isInstanceOf[WriteDelta]) return plan
    plan.transformDown {
      // idempotence under the fixed-point batch: a delta query already
      // carrying a dynamic-pruning subquery is done
      case w: WriteDelta if !w.query.exists(_.expressions.exists(
          _.exists(_.isInstanceOf[DynamicPruningSubquery]))) =>
        w.copy(query = narrowQuery(w.query))
    }
  }

  private def narrowQuery(query: LogicalPlan): LogicalPlan =
    query.transformDown {
      case j @ Join(left, right, joinType, Some(cond), _) =>
        targetRelation(left) match {
          case Some(rel) if targetDroppable(joinType, targetIsLeft = true) =>
            narrowSide(left, rel, cond, sourceSide = right)
              .map(newLeft => j.copy(left = newLeft)).getOrElse(j)
          case _ => targetRelation(right) match {
            case Some(rel) if targetDroppable(joinType, targetIsLeft = false) =>
              narrowSide(right, rel, cond, sourceSide = left)
                .map(newRight => j.copy(right = newRight)).getOrElse(j)
            case _ => j
          }
        }
    }

  /** The side's scan relation, when that side is (a projection over)
    * the runtime-filterable MOR target scan and nothing else joins in.
    */
  private def targetRelation(side: LogicalPlan): Option[DataSourceV2ScanRelation] = {
    val rels = side.collect {
      case r: DataSourceV2ScanRelation if r.scan.isInstanceOf[GroupCowScan] => r
    }
    // exactly one, and the side must contain no OTHER relation (a
    // narrowed multi-relation side could change intermediate-join rows)
    val allLeaves = side.collectLeaves()
    if (rels.size == 1 && allLeaves.size == 1) Some(rels.head) else None
  }

  /** True when `joinType` discards target-side rows with no match on
    * the other side — the condition under which pre-filtering the
    * target to "key might match some source key" is semantics-free.
    */
  private def targetDroppable(joinType: org.apache.spark.sql.catalyst.plans.JoinType,
      targetIsLeft: Boolean): Boolean = joinType match {
    case Inner | _: InnerLike => true
    case RightOuter => targetIsLeft
    case LeftOuter => !targetIsLeft
    case LeftSemi => targetIsLeft
    case _ => false
  }

  /** Wrap `rel` (somewhere inside `targetSide`) in a Filter of
    * dynamic-pruning subqueries over the source's distinct join keys —
    * one per usable equi-conjunct. None when no conjunct qualifies.
    */
  private def narrowSide(targetSide: LogicalPlan,
      rel: DataSourceV2ScanRelation, cond: Expression,
      sourceSide: LogicalPlan): Option[LogicalPlan] = {
    val targetOut = rel.outputSet
    val sourceOut = sourceSide.outputSet
    val filterable = rel.scan.asInstanceOf[GroupCowScan]
      .filterAttributes().map(_.fieldNames().mkString(".")).toSet
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val pairs: Seq[(Attribute, Attribute)] = conjuncts(cond).collect {
      case EqualTo(t: Attribute, s: Attribute)
          if targetOut.contains(t) && sourceOut.contains(s) &&
            filterable.contains(t.name) => (t, s)
      case EqualTo(s: Attribute, t: Attribute)
          if targetOut.contains(t) && sourceOut.contains(s) &&
            filterable.contains(t.name) => (t, s)
    }
    if (pairs.isEmpty) return None
    val dpp = pairs.map { case (t, s) =>
      // DISTINCT source keys: the build query the subquery executes once
      val build = Aggregate(Seq(s), Seq(s), sourceSide)
      DynamicPruningSubquery(t, build, Seq(s),
        broadcastKeyIndices = Seq(0), onlyInBroadcast = false): Expression
    }.reduce(And)
    // re-plant the filter DIRECTLY above the scan relation, wherever it
    // sits under projections — PhysicalOperation collects it there
    Some(targetSide.transformUp {
      case r: DataSourceV2ScanRelation if r eq rel => Filter(dpp, r)
    })
  }
}
