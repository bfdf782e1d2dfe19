package graft

import org.apache.spark.sql.functions._

import graft.operators.{Queries, Skew}
import graft.sources.Tables

/** Physical-layout guarantees for the scale strategies SCALE.md prescribes:
  * co-located (bucketed) joins must plan without a shuffle, and salted
  * aggregation must equal plain aggregation.
  */
class BucketedJoinSpec extends SparkTestBase {

  test("join of two tables bucketed on the join key plans with no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    Tables.saveBucketed(Queries.t(spark, dir, "orders"), "orders_b", "o_custkey", 8)
    Tables.saveBucketed(Queries.t(spark, dir, "customer"), "customer_b", "c_custkey", 8)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a sort-merge plan so the bucketing (not a broadcast) is what
      // eliminates the exchanges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it computes the right thing
      val viaBuckets = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val plainJoin = Queries.t(spark, dir, "orders")
        .join(Queries.t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(viaBuckets == plainJoin)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("salted two-phase aggregation equals plain aggregation") {
    val dir = "/root/testdata/sf0.001"
    val li = Queries.t(spark, dir, "lineitem")
    val salted = Skew.saltedSum(li, "l_returnflag", salts = 16,
      "sum_qty" -> sum(col("l_quantity").cast("decimal(18,2)")),
      "n" -> sum(lit(1L)))
      .select(col("l_returnflag"), col("sum_qty").cast("double"), col("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val plain = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
