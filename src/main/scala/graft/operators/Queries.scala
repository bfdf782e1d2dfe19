package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The analytic / LLM-pipeline query surface (SURVEY §7.2 `queries`).
  *
  * Every query here has a matching DuckDB oracle in [[Oracles]]; the pair is
  * registered in [[graft.SparkEntry]]. Determinism rules shared by both
  * sides (the driver hash-compares values):
  *  - fractional SUMs go through exact DECIMAL accumulation and are cast to
  *    DOUBLE once at the end — bit-identical regardless of partial-agg order;
  *  - every top-k / rank uses row_number with a unique-id tie-break;
  *  - timestamps are emitted as formatted strings (Spark truncates the
  *    events table's ns timestamps to µs; strings sidestep unit mismatches);
  *  - every result has a total deterministic ORDER BY.
  */
object Queries {

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact decimal sum emitted as double: order-insensitive, engine-portable. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  // --------------------------------------------------------------------
  // Relational core
  // --------------------------------------------------------------------

  /** TPC-H Q1-style pricing summary: scan -> filter -> hash agg.
    * Filter + 7-column projection push into the parquet scan; the agg is
    * partial+final over 6 groups (map-side combine makes the shuffle tiny).
    */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
}
