package graft

import org.apache.spark.sql.functions._

/** Dev tool: dump the q28 physical plan BEFORE (the pre-r21 SQL
  * higher-order-function formulation, still the oracle's shape) and
  * AFTER (the native rolling_hash_stats expression) for plans/r21.
  */
object PlanDump28 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session("plandump28", defaultCpus = "32")
    graft.functions.GraftFunctions.register(spark)
    val docs = operators.Queries.t(spark, sfDir, "documents")
    println("===== q28_rolling_hash BEFORE (SQL higher-order formulation)")
    docs
      .withColumn("codes", expr(
        """CASE WHEN length(text) > 0 THEN
          |  transform(sequence(1, length(text)),
          |            i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))
          |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin))
      .withColumn("full_hash",
        expr("aggregate(codes, 0L, (acc, x) -> (acc * 31 + x) % 1000000007)"))
      .withColumn("min_gram_hash", expr(
        """CASE WHEN size(codes) >= 8 THEN
          |  array_min(transform(sequence(1, size(codes) - 7),
          |    i -> aggregate(slice(codes, i, 8), 0L,
          |         (acc, x) -> (acc * 31 + x) % 1000000007)))
          |ELSE NULL END""".stripMargin))
      .select(col("doc_id"), col("full_hash"), col("min_gram_hash"),
        size(col("codes")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))
      .explain("formatted")
    println("===== q28_rolling_hash AFTER (native rolling_hash_stats)")
    SparkEntry.queries("q28_rolling_hash")(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
