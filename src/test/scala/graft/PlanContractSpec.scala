package graft

import graft.operators.Queries

/** Physical-plan contracts: the optimizations SCALE.md claims must actually
  * appear in the executed plans — a regression here silently turns a
  * pruned-scan query into a full-table read at 100 TB.
  */
class PlanContractSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: filter pushed into the parquet scan, columns pruned") {
    val p = plan(Queries.q01PricingSummary(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    // 11-column table read with a 6-column schema
    assert(p.contains("ReadSchema") && !p.contains("l_orderkey"), "unused columns must be pruned")
  }

  test("q02: global top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = plan(Queries.q02FilterTopk(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(l_quantity,45.0)"), "quantity filter must push down")
  }

  test("q03: dimension join is broadcast, not shuffled") {
    val p = plan(Queries.q03JoinAgg(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), "dim filter must push down")
  }

  test("CDC fold: partial aggregation before the shuffle, no window operator") {
    val ev = Queries.events(spark, dir)
      .withColumnRenamed("event_id", "id")
    val p = plan(graft.operators.Cdc.latestPerKey(
      ev.withColumn("op", org.apache.spark.sql.functions.lit("U")),
      CdcConfig("user_id", "ts_us")))
    // the scale properties: ObjectHashAggregate (hash map, no sort) with
    // map-side combine — the exchange carries at most one candidate per key
    // per partition (built-in max_by would degrade to SortAggregate here)
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(p.contains("partial_latest_row"), p.take(2000))
    assert(p.indexOf("partial_latest_row") > p.indexOf("Exchange"),
      "partial agg must run before (below) the exchange")
    assert(!p.contains("Window") && !p.contains("SortAggregate"),
      "latest-per-key must not sort")
  }
}
