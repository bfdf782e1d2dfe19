package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.sources.GraftCatalog

/** Cross-process streaming-ingest role for
  * `tools/verify_streaming_concurrent.py`: drives REAL
  * `writeStream.toTable` epochs against a shared warehouse while an
  * INDEPENDENT maintenance JVM compacts the same table — the
  * scheduled-maintenance-plus-continuous-ingest deployment, where every
  * epoch commit must CAS-survive a rival compaction's pointer swaps.
  * Exits 0 after `epochs` committed micro-batches; the python driver
  * verifies the final snapshot with DuckDB (exact id set — zero lost
  * updates, zero duplicates).
  *
  * Args: whDir epochs rowsPerEpoch [layout]
  *   layout: `flat` (default — versioned snapshot sink) or `timed`
  *   (hidden `days(ts)` partitioning — epochs land as the layout's own
  *   `p_day/p_batch` units; on the object-store substrate this drives
  *   the delete-then-CopyObject epoch commit instead of Spark's
  *   rename-based dynamic overwrite).
  */
object StreamingIngestMain {
  def main(args: Array[String]): Unit = {
    val Array(whDir, epochsS, rowsS) = args.take(3)
    val (epochs, rowsPerEpoch) = (epochsS.toInt, rowsS.toLong)
    val layout = args.lift(3).getOrElse("flat")
    val spark = Harness.session("graft-streaming-ingest")
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.gsi", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsi.warehouse", whDir)
    if (!spark.catalog.tableExists("gsi.sink")) {
      if (layout.startsWith("timed"))
        spark.sql("CREATE TABLE gsi.sink (id BIGINT, v DOUBLE, " +
          "ts TIMESTAMP) PARTITIONED BY (days(ts))")
      else spark.sql("CREATE TABLE gsi.sink (id BIGINT, v DOUBLE)")
    }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Long]
    val base = source.toDS()
      .select($"value".as("id"), ($"value" % 97 / 4.0).as("v"))
    val shaped =
      if (layout.startsWith("timed"))
        // ids spread over ~3 UTC days so every epoch spans partitions
        base.withColumn("ts", org.apache.spark.sql.functions
          .timestamp_seconds(org.apache.spark.sql.functions.lit(1704067200L) +
            ($"id" % 72) * 3600))
      else base
    val q = shaped
      .repartition(4)
      .writeStream
      .option("checkpointLocation", s"$whDir/_ckpt_gsi")
      .trigger(Trigger.ProcessingTime(0))
      .toTable("gsi.sink")

    var next = 0L
    (1 to epochs).foreach { i =>
      source.addData(next until (next + rowsPerEpoch))
      next += rowsPerEpoch
      q.processAllAvailable()
      println(s"[stream] epoch $i committed (${next} rows total)")
      // timed-evolve drill: flip the layout to hour grain MID-STREAM —
      // later epochs land hour-partitioned while the concurrent
      // maintenance JVMs migrate the day-era days (the rename-free
      // manifest flip on the object-store substrate); the final census
      // must still be exact
      if (layout == "timed-evolve" && i == epochs / 2)
        graft.sources.Tables.Warehouse(whDir).evolveTimeGranularity("sink")
    }
    q.stop()
    spark.stop()
  }
}
