package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.CdcConfig
import graft.operators.Cdc

/** Incremental materialized-aggregate maintenance over the CDC stream: keep
  * `groupBy(g).agg(count, sum(v))` in sync with the mirror WITHOUT
  * rescanning it. Per batch the maintenance cost is proportional to the
  * CHANGED keys, not the table: the batch's keys are looked up in the
  * stored mirror (a key-equality semi-join — partition-pruned when the
  * mirror is bucketed by key, see PartitionedMirror), their before/after
  * visible rows are folded through the standard CDC kernel, and the two
  * tiny group-level deltas (retract before, add after) merge into the agg
  * table with an outer join on the group key.
  *
  * At 100 TB this is the difference between "the dashboard aggregate is a
  * nightly full scan" and "it's maintained by each micro-batch": the full
  * scan shape is O(|mirror|) per refresh; this is O(|batch| + |groups
  * touched|). Sums accumulate in decimal, so the maintained table is
  * BIT-EXACT equal to a recompute at every step (asserted in
  * IncrementalAggSpec) — no float drift ever accumulates.
  *
  * Reference tie-in: the reference's mirror (tabular.py:39-64) only
  * materializes row state; this is the analytics layer a consumer of that
  * mirror would bolt on, kept consistent by the same latest-wins fold.
  */
object IncrementalAgg {

  /** Group/value extraction for the maintained aggregate. Expressions must
    * be computable from a visible mirror row.
    */
  final case class Spec(group: Column, value: Column)

  private def gv(df: DataFrame, spec: Spec): DataFrame =
    df.select(spec.group.as("g"), spec.value.cast("decimal(18,2)").as("v"))

  /** Full recompute — bootstrap path, and the oracle the incremental path
    * must equal.
    */
  def full(visible: DataFrame, spec: Spec): DataFrame =
    gv(visible, spec).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))

  /** Fold one CDC batch into the maintained aggregate.
    *
    * @param agg          current aggregate table (g, n, s)
    * @param mirrorBefore stored mirror BEFORE this batch (with tombstones)
    * @param changes      the raw change batch (op + ts + data columns)
    */
  def applyDelta(agg: DataFrame, mirrorBefore: DataFrame, changes: DataFrame,
      cfg: CdcConfig, spec: Spec): DataFrame = {
    val touched = changes.select(cfg.keyCols.map(col): _*).distinct()
    // key lookup, not a scan: only rows whose key appears in the batch
    val before = mirrorBefore.join(touched, cfg.keyCols, "left_semi")
    val after = Cdc.applyBatch(before, changes, cfg)
    val minus = gv(Cdc.currentState(before), spec).groupBy(col("g"))
      .agg((-count(lit(1))).as("dn"), (-sum(col("v"))).as("ds"))
    val plus = gv(Cdc.currentState(after), spec).groupBy(col("g"))
      .agg(count(lit(1)).as("dn"), sum(col("v")).as("ds"))
    val delta = minus.unionByName(plus).groupBy(col("g"))
      .agg(sum(col("dn")).as("dn"), sum(col("ds")).as("ds"))
    merge(agg, delta)
  }

  /** Merge a (g, dn, ds) group-level delta into the aggregate table —
    * null-safe equality on the group key: a nullable group expression
    * produces a legitimate NULL group, and a plain full_outer on "g"
    * would leave the stale row and the delta row dangling separately.
    */
  private def merge(agg: DataFrame, delta0: DataFrame): DataFrame = {
    val delta = delta0.withColumnRenamed("g", "dg")
    agg.join(delta, agg("g") <=> delta("dg"), "full_outer")
      .select(coalesce(agg("g"), delta("dg")).as("g"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0).cast("decimal(28,2)")) +
          coalesce(col("ds"), lit(0).cast("decimal(28,2)"))).cast("decimal(28,2)").as("s"))
      .filter(col("n") > 0)
  }

  /** Retraction-based maintenance from MIRROR-CHANGELOG rows (the Flink
    * changelog-stream pattern): `update_before`/`delete` rows retract
    * their group contribution, `update_after`/`insert` rows add theirs.
    * Because diff rows carry full before/after IMAGES
    * ([[MirrorChangelog.diff]]), the consumer needs NO access to the
    * mirror at all — an aggregate is maintainable from the feed alone
    * (`emitPending` hops applied in order), which is exactly what makes
    * the changelog view a sufficient contract for downstream teams. One
    * hash agg over the delta-sized change set + the group-key outer
    * merge; cost is O(|changes| + |groups touched|), mirror-size-free.
    */
  def applyChangelog(agg: DataFrame, changeRows: DataFrame, spec: Spec): DataFrame = {
    import MirrorChangelog._
    val sign = when(
      col(ChangeTypeCol).isin(Insert, UpdateAfter), lit(1)).otherwise(lit(-1))
    val delta = changeRows
      .select(spec.group.as("g"), sign.as("sgn"),
        spec.value.cast("decimal(18,2)").as("v"))
      .groupBy(col("g"))
      .agg(sum(col("sgn").cast("long")).as("dn"),
        sum(col("sgn") * col("v")).as("ds"))
    merge(agg, delta)
  }
}
