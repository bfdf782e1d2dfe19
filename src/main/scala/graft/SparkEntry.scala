package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Curation, Dedup, EmbedOps, Multimodal, Queries, ScaleOps, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each `queries` entry has a DuckDB-equivalent in `oracleSql` with
  * IDENTICAL column names and row ordering.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.registry ++ TextAnalysis.registry ++ Dedup.registry ++
      Similarity.registry ++ Multimodal.registry ++ Curation.registry ++
      ScaleOps.registry ++ EmbedOps.registry

  /** DuckDB oracle SQL per query (same parquet tables, same column names). */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ Curation.oracles ++
      ScaleOps.oracles ++ EmbedOps.oracles
}
