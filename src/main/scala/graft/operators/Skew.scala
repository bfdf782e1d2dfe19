package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §0 "salting for skew", SCALE.md).
  *
  * AQE's skew-join splitting covers joins at runtime; aggregation skew over
  * a hot key still funnels every row of that key through one reduce task.
  * Salted two-phase aggregation is the standard fix: pre-aggregate on
  * (key, salt) — spreading the hot key over `salts` tasks — then finalize on
  * key. Works for any algebraic aggregate (sum/count/min/max and their
  * compositions like exact-decimal sums).
  */
object Skew {

  /** Two-phase salted sum/count aggregation.
    *
    * @param df     input
    * @param key    grouping column name
    * @param salts  fanout of the hot-key pre-aggregation (≈ number of tasks
    *               a hot key should spread across)
    * @param aggs   (outCol -> FULL aggregate expression, e.g.
    *               `"total" -> sum(col("v"))`; counts are `sum(lit(1L))`).
    *               The final phase re-SUMS the per-salt partials, so only
    *               sum-decomposable aggregates are valid here — an
    *               `avg(...)` would be silently wrong (compose it from a
    *               salted sum and a salted count instead).
    * @return one row per key with the summed aggregates — identical to
    *         `df.groupBy(key).agg(sum(...))`, but the first shuffle carries
    *         (key, salt) so no single task absorbs a hot key.
    */
  def saltedSum(df: DataFrame, key: String, salts: Int, aggs: (String, Column)*): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
    partial.groupBy(col(key))
      .agg(sum(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, _) => sum(col(n)).as(n) }: _*)
  }

  /** Salt-replicated skew join: the manual fix for a fact-side hot key in
    * a shuffle join that AQE cannot rescue (its skew splitter only fires
    * for sort-merge joins with split-able partitions, and not at all when
    * the hot key's rows must still meet ALL matching dim rows on one
    * task). Each fact row picks a salt in [0, salts); the dim side is
    * replicated once per salt value; the join keys become (key, salt), so
    * the hot key's rows spread across `salts` tasks while every fact row
    * still meets its dim match exactly once. Result set is identical to
    * the plain inner join for any salt assignment.
    *
    * The salt MUST be deterministic in row CONTENT (here: a hash of every
    * fact column): it becomes a shuffle-join key, and a nondeterministic
    * derivation (monotonically_increasing_id, rand) re-evaluated by a
    * task retry would route recomputed rows to different reduce
    * partitions than the already-fetched map outputs — silently
    * duplicating or dropping rows. Identical rows sharing a salt is
    * harmless (any assignment is correct), but the flip side is a real
    * bound: a hot key spreads across AT MOST as many salts as it has
    * DISTINCT payloads. Low payload diversity (e.g. a hot key whose rows
    * differ only in one low-cardinality column) caps the spread at that
    * distinct-payload count and can silently defeat the mitigation — if
    * the fact carries a stable surrogate/event id, salt on a hash of THAT
    * column for full spread (byte-identical rows under a hot key are a
    * dedup problem, not a join problem).
    *
    * Cost: the dim shuffle inflates by `salts`x — the technique fits a
    * skewed fact against a MID-SIZED dim (too big to broadcast, small
    * enough that salts x dim beats one straggler task by orders of
    * magnitude).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(fact.columns.map(col).toSeq: _*), lit(salts)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
