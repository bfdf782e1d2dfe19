package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a FIRST-CLASS operator — the full §2.10(c) ladder:
  * custom [[LogicalPlan]] node -> [[SparkStrategy]] -> custom physical
  * operator, deployed either via `SparkSessionExtensions`
  * ([[graft.GraftExtensions]]) or imperatively ([[AsOf.ensureStrategy]]).
  *
  * Why a whole operator and not composition: the composed form (q19's
  * union + running-`last` window) is linear and correct, but it costs a
  * WINDOW — a per-partition sort over clicks+purchases TOGETHER and a
  * running-struct carry. The dedicated operator needs exactly the
  * distribution/ordering a shuffle join already guarantees (cluster by
  * key, sort by (key, ts) within partitions — Spark inserts both from
  * `requiredChild*`), then emits matches in ONE streaming merge pass per
  * partition: no joined-stream window state, no inequality join, no
  * per-user quadratic blowup. This is the standard merge formulation of
  * ASOF JOIN (DuckDB/Pandas `merge_asof` semantics: for each left row,
  * the right row with the greatest ts <= left ts on the same key —
  * backward — or the smallest ts >= left ts with `forward = true`, an
  * optional `tolerance` bounding the gap). `outer = false` drops
  * unmatched left rows (DuckDB `ASOF JOIN`); `outer = true` emits them
  * null-extended (pandas `merge_asof` / DuckDB `ASOF LEFT JOIN`). NULL
  * never matches, as in SQL: a right row with a null key or null ts is
  * discarded, and a left row with a null key or null ts is unmatched
  * (dropped when inner, null-extended when outer).
  *
  * Scale shape: one hash exchange per side (same as any shuffled join),
  * in-partition sort, then an O(left + right) merge with O(1) state (the
  * current candidate row) per partition. Ties on (key, ts) resolve to the
  * right row latest in sort order — callers wanting determinism under
  * duplicate timestamps add a tiebreak column to `rightTs`'s ordering the
  * same way they would for any engine's ASOF.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    forward: Boolean = false,
    tolerance: Option[Long] = None,
    outer: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true))
                    else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: [[AsOfJoin]] -> [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, fwd, tol, outer) =>
      AsOfJoinExec(lk, rk, lts, rts, fwd, tol, outer,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned on the keys, sorted by (key, ts)
  * within partitions, merged in one pass. `EnsureRequirements` supplies
  * the exchanges and sorts from the declared requirements — the operator
  * itself never shuffles or sorts.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    forward: Boolean,
    tolerance: Option[Long],
    outer: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true))
                    else right.output)
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lts = leftTs
    val rts = rightTs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, leftOut)
      val rKeyProj = UnsafeProjection.create(rk, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(lts), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rts), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      val tol = tolerance.getOrElse(Long.MaxValue)
      val isOuter = outer
      // the null extension for unmatched left rows under outer — one
      // reusable all-null row of right arity
      val rNulls: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightOut.size)
      def emit(lRow: InternalRow, rRow: InternalRow): Option[UnsafeRow] =
        if (rRow != null) Some(outProj(joined(lRow, rRow)))
        else if (isOuter) Some(outProj(joined(lRow, rNulls)))
        else None
      // SQL NULL-match semantics: a right row with a null key or null ts
      // can never be anyone's match — discard it on sight (they sort to
      // the front of their key group, so this stays one forward pass)
      def rHeadNull: Boolean =
        rKeyProj(rBuf.head).anyNull || rTsProj(rBuf.head).isNullAt(0)
      if (!forward) {
        // BACKWARD (default): the best (greatest-ts <= left ts) right row
        // for the CURRENT key, retained as a copy because projections and
        // unsafe child rows reuse their buffers — O(1) per-partition state
        var candidate: InternalRow = null
        var candidateKey: UnsafeRow = null
        var candidateTs = 0L
        lIter.flatMap { lRow =>
          val lKey = lKeyProj(lRow)
          val lTsRow = lTsProj(lRow)
          if (lKey.anyNull || lTsRow.isNullAt(0)) emit(lRow, null)
          else {
            val tl = lTsRow.getLong(0)
            // consume right rows that can no longer match a later left row:
            // keys strictly below lKey (left keys only ascend), and same-key
            // rows with ts <= tl (each becomes the new best candidate —
            // right ts only ascends within the key). Same-key rows with
            // ts > tl stay buffered for later left rows of this key.
            var advance = true
            while (advance && rBuf.hasNext) {
              if (rHeadNull) rBuf.next()
              else {
                val cmp = keyOrd.compare(rKeyProj(rBuf.head), lKey)
                if (cmp < 0) rBuf.next()
                else if (cmp == 0 && rTsProj(rBuf.head).getLong(0) <= tl) {
                  val r = rBuf.next()
                  candidate = r.copy()
                  candidateKey = rKeyProj(candidate).copy()
                  candidateTs = rTsProj(candidate).getLong(0)
                } else advance = false
              }
            }
            if (candidate != null && keyOrd.compare(candidateKey, lKey) == 0 &&
                tl - candidateTs <= tol)
              emit(lRow, candidate)
            else emit(lRow, null)
          }
        }
      } else {
        // FORWARD: the earliest right row with ts >= left ts. Right rows
        // with ts < tl can never match this or any LATER left row (left
        // ts ascends within the key), so they are consumed; the head — if
        // on the same key — is the match and stays buffered because it
        // may also be the forward match of later left rows.
        lIter.flatMap { lRow =>
          val lKey = lKeyProj(lRow)
          val lTsRow = lTsProj(lRow)
          if (lKey.anyNull || lTsRow.isNullAt(0)) emit(lRow, null)
          else {
            val tl = lTsRow.getLong(0)
            var advance = true
            while (advance && rBuf.hasNext) {
              if (rHeadNull) rBuf.next()
              else {
                val cmp = keyOrd.compare(rKeyProj(rBuf.head), lKey)
                if (cmp < 0 || (cmp == 0 && rTsProj(rBuf.head).getLong(0) < tl))
                  rBuf.next()
                else advance = false
              }
            }
            if (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lKey) == 0 &&
                rTsProj(rBuf.head).getLong(0) - tl <= tol)
              emit(lRow, rBuf.head)
            else emit(lRow, null)
          }
        }
      }
    }
  }
}

/** User-facing constructor + imperative deployment. */
object AsOf {

  /** Append [[AsOfJoinStrategy]] to the session's planner strategies
    * (idempotent) — the runtime path for sessions graft did not build,
    * mirroring `GraftFunctions.register`. The extensions path is
    * `graft.GraftExtensions` (injectPlannerStrategy).
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    val ex = spark.experimental
    if (!ex.extraStrategies.contains(AsOfJoinStrategy))
      ex.extraStrategies = ex.extraStrategies :+ AsOfJoinStrategy
  }

  /** As-of join (pandas `merge_asof` surface): for each `left` row, the
    * `right` row on equal keys with the greatest `rightTsCol` <=
    * `leftTsCol` (backward, default) or the smallest `rightTsCol` >=
    * `leftTsCol` (`forward = true`); `tolerance` drops matches whose
    * |ts gap| exceeds it. Unmatched left rows are dropped when
    * `outer = false` (DuckDB `ASOF JOIN`) and emitted null-extended when
    * `outer = true` (the `merge_asof` default / `ASOF LEFT JOIN`). NULL
    * keys/timestamps never match. Key/ts columns are resolved by name on
    * each side; the ts columns must be long-backed (BIGINT / epoch
    * micros).
    */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTsCol: String, rightTsCol: String,
           forward: Boolean = false,
           tolerance: Option[Long] = None,
           outer: Boolean = false): DataFrame =
    join(left, right, Seq(leftKey), Seq(rightKey), leftTsCol, rightTsCol,
      forward, tolerance, outer)

  /** The composite-key form: equality on `leftKeys` zip `rightKeys`
    * pairwise (same arity, compared in order), as-of on the ts columns.
    * The plan always supported Seq keys; this exposes it
    * (round-5 verdict item #6).
    */
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTsCol: String, rightTsCol: String,
           forward: Boolean,
           tolerance: Option[Long],
           outer: Boolean): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"key arity mismatch: $leftKeys vs $rightKeys")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
    GraftSqlBridge.ofRows(spark, AsOfJoin(lp, rp,
      leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
      attr(lp, leftTsCol), attr(rp, rightTsCol), forward, tolerance, outer))
  }
}
