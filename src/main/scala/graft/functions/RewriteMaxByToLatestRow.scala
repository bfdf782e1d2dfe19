package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, MaxBy}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite `max_by(payload, ordering)` to the
  * [[LatestRow]] kernel when the hash-aggregate path cannot handle it.
  *
  * `max_by` is the natural way to write latest-per-key (SURVEY A1, the
  * reference's core CDC semantic, tabular.py:47-49) — but with a struct /
  * string payload its declarative buffer is not UnsafeRow-mutable, so
  * HashAggregateExec refuses it and the plan silently degrades to
  * SortAggregate: every shuffled row gets sorted at 100 TB. [[LatestRow]]
  * is a TypedImperativeAggregate with identical semantics (greater
  * ordering wins, ties keep the first-seen value, null orderings are
  * ignored) that plans as ObjectHashAggregate with map-side partial
  * aggregation.
  *
  * The rewrite fires ONLY when both the payload and ordering types are
  * hash-agg-hostile guests (not UnsafeRow-mutable): for primitive
  * payloads `max_by` already plans as a plain HashAggregate, which the
  * object-hash path would not beat. Injected via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`) or at runtime through
  * `spark.experimental.extraOptimizations`.
  */
object RewriteMaxByToLatestRow extends Rule[LogicalPlan] {

  private def hashAggFriendly(f: MaxBy): Boolean =
    UnsafeRow.isMutable(f.valueExpr.dataType) &&
      UnsafeRow.isMutable(f.orderingExpr.dataType)

  private def rewritable(ae: AggregateExpression): Boolean =
    ae.aggregateFunction match {
      case f: MaxBy => !hashAggFriendly(f)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ae: AggregateExpression if rewritable(ae) =>
        val f = ae.aggregateFunction.asInstanceOf[MaxBy]
        ae.copy(aggregateFunction = LatestRow(f.valueExpr, f.orderingExpr))
    }
}
