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
}
