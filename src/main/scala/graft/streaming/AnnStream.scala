package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity
import graft.sources.Tables.Warehouse

/** Streaming ANN ingest — the continuous twin of the batch incremental
  * assignment (q88): embedding rows arrive as a stream; the FIRST
  * micro-batch trains the frozen IVF index (q88's recipe — seeds = the
  * [[AnnStream.IvfK]] lowest vec_ids, integer k-means, deterministic), and
  * every batch (including the first) routes its vectors to their
  * argmax-cosine cell:
  *
  *  1. assignments (vec_id, cid, ccos) append to `assignTable` — ccos is
  *     the drift signal a deployment monitors for retrain triggers,
  *  2. the routed vectors (vec_id, cid, q, nq) append to `cellsTable` —
  *     the per-cell storage a 100 TB index serves probes from (at rest it
  *     would be partitioned by cid, the q38/q122 pruning layout).
  *
  * Replay safety: the centroid table is an ATOMIC versioned commit
  * ([[Warehouse.overwrite]]) guarded by existence — training is
  * deterministic, so a replayed batch 0 that finds the table simply skips
  * to assignment and recomputes identical rows; both appends are per-batch
  * subdir overwrites ([[Warehouse.appendBatch]]), so an at-least-once
  * replay rewrites the same files instead of duplicating them.
  *
  * Scale notes (100 TB): per batch the only work is one broadcast of K
  * centroid rows and one codegen scan of the batch — no corpus rescan, no
  * retraining, no shuffle (the hash agg groups on batch-local vec_ids).
  * Training cost is paid once on the seed batch; the frozen index absorbs
  * arrivals until the ccos distribution drifts and an offline retrain
  * rebuilds it (q114's per-cell profile is that monitor).
  */
object AnnStream {

  /** Cells in the frozen index — q38/q88's K. */
  val IvfK = 8

  def start(
      vecs: DataFrame,
      wh: Warehouse,
      checkpointDir: String,
      centroidsTable: String = "ann_centroids",
      assignTable: String = "ann_assignments",
      cellsTable: String = "ann_cells"): StreamingQuery =
    vecs.writeStream
      .queryName(s"ann-$assignTable")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the micro-batch frame lives in a CLONED session with its own
        // function registry — register long_dot there (quantized does)
        val session = batch.sparkSession
        val qb = Similarity.quantized(batch)
          .select("vec_id", "q", "nq").localCheckpoint(true)
        if (!wh.exists(centroidsTable)) {
          val seeds = qb.orderBy(col("vec_id")).limit(IvfK)
            .select(col("vec_id").as("cid"), col("q").as("csum"),
              col("nq").as("nc"))
          wh.overwrite(Similarity.ivfCentroids(qb, seeds), centroidsTable)
        }
        val centroids = wh.read(session, centroidsTable)
        val scored = Similarity.assignScored(qb, centroids)
          .withColumn("src_batch", lit(batchId))
          .localCheckpoint(true)
        wh.appendBatch(scored.select("vec_id", "cid", "ccos", "src_batch"),
          assignTable, batchId)
        wh.appendBatch(
          qb.join(scored.select("vec_id", "cid"), Seq("vec_id"))
            .withColumn("src_batch", lit(batchId))
            .select("vec_id", "cid", "q", "nq", "src_batch"),
          cellsTable, batchId)
        ()
      }
      .start()
}
