package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal access bridge for graft's custom logical operators:
  * `Dataset.ofRows` is `private[sql]`, so a library introducing its own
  * [[LogicalPlan]] node (see `graft.plans.AsOfJoinPlan`) needs one
  * package-local hop to wrap that plan as a user-facing [[DataFrame]].
  * This is the established pattern for Spark-native extension libraries;
  * nothing else in graft lives outside its own package.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

/** Second package-local hop, same rationale:
  * [[connector.catalog.V2TableWithV1Fallback]] — the analyzer's V1
  * streaming-read fallback hook (the mechanism `readStream.table` uses
  * to serve file-stream semantics for tables without a native
  * MicroBatchStream) — is `private[sql]`. Graft's catalog table extends
  * this re-export to ride it.
  */
trait GraftV1FallbackTable extends connector.catalog.V2TableWithV1Fallback
