package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity
import graft.sources.Tables.Warehouse

/** Streaming ANN ingest with a CLOSED index lifecycle — the continuous
  * twin of the batch incremental assignment (q88): embedding rows arrive
  * as a stream; the index trains once enough rows have been seen, every
  * batch routes its vectors to their argmax-cosine cell, and a drift
  * monitor retrains + atomically swaps the index when arrivals stop
  * resembling the training distribution:
  *
  *  1. assignments (vec_id, cid, ccos, cver) append to `assignTable` —
  *     ccos is the drift signal, cver the centroid version that routed
  *     the row (the provenance a serving layer needs to interpret cids
  *     across a swap),
  *  2. the routed vectors (vec_id, cid, q, nq) append to `cellsTable` —
  *     the per-cell storage a 100 TB index serves probes from (at rest
  *     partitioned by cid — q128's stored-index serving layout).
  *
  * '''Seeding''' (round-8 advice): a first batch smaller than [[IvfK]]
  * rows — or empty — must NOT freeze a degenerate index forever. Until
  * the index exists, batches STAGE into `seedTable` (replay-safe
  * per-batch subdirs) and route nothing; the first batch that brings the
  * staged total to >= [[IvfK]] trains on the WHOLE staged set and routes
  * every staged row, so no arrival is ever dropped.
  *
  * '''Drift -> retrain -> swap''': each routed batch's mean
  * best-centroid cosine (in exact nano-int, the q114 profile aggregated
  * to one number) is compared against `driftTau`; a batch falling below
  * retrains on ITSELF (the observed new distribution — production would
  * widen to a recent window; the trigger batch is its most recent
  * sample) and commits the new centroids as the NEXT version via
  * [[Warehouse.commit]]'s atomic pointer swap. The triggering batch and
  * everything after route against the new version; rows routed before
  * the swap are immutable history, their `cver` saying which geometry
  * defined their cid.
  *
  * '''Replay safety''': Structured Streaming replays only the LAST batch
  * after a crash, and every write here is either an idempotent per-batch
  * subdir overwrite ([[Warehouse.appendBatch]]) or an existence/
  * marker-guarded versioned commit. The `trained_batch` column carried
  * in the centroid table disambiguates the two crash windows a marker
  * file alone cannot: (a) crash between v1-train and checkpoint commit —
  * the replay finds centroids whose `trained_batch` == this batchId and
  * knows to route the full STAGED set, exactly as the first attempt did;
  * (b) crash between a vN drift-swap and checkpoint commit — the replay
  * finds current `trained_batch` == this batchId, skips the drift check
  * (re-checking against the fresh centroids could cascade a vN+1), and
  * routes against vN exactly as the first attempt did. Training is
  * deterministic (seeds = lowest vec_ids, integer k-means), so recomputed
  * rows are byte-identical.
  *
  * Scale notes (100 TB): per batch the only work is one broadcast of K
  * centroid rows (the K-row read also carries the marker — no extra IO)
  * and one codegen scan of the batch; the drift number is one map-side-
  * combined agg over batch-local rows. No corpus rescan ever: retraining
  * reads only the triggering batch, and the atomic swap is a pointer
  * rename. The seed stage is touched only while the index doesn't exist.
  */
object AnnStream {

  /** Cells in the index — q38/q88's K, and the minimum seed count. */
  val IvfK = 8

  /** Default drift threshold: retrain when a batch's mean best-centroid
    * cosine falls below this. 0.5 sits far below any within-distribution
    * batch (tight cells score near 1) and above orthogonal/shifted
    * arrivals; `driftTau = `[[NeverRetrain]] disables the monitor (the
    * round-8 frozen-index behavior).
    */
  val DriftTauDefault = 0.5

  /** cos >= -1 always, so a threshold below -1 never fires. */
  val NeverRetrain: Double = -2.0

  def start(
      vecs: DataFrame,
      wh: Warehouse,
      checkpointDir: String,
      centroidsTable: String = "ann_centroids",
      assignTable: String = "ann_assignments",
      cellsTable: String = "ann_cells",
      seedTable: String = "ann_seed_stage",
      driftTau: Double = DriftTauDefault): StreamingQuery =
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

        def trainCommit(data: DataFrame): Unit = {
          val seeds = data.orderBy(col("vec_id")).limit(IvfK)
            .select(col("vec_id").as("cid"), col("q").as("csum"),
              col("nq").as("nc"))
          wh.overwrite(
            Similarity.ivfCentroids(data, seeds)
              .withColumn("trained_batch", lit(batchId)),
            centroidsTable)
        }

        // ---- seeding: no index yet -> stage; train when enough staged
        val routeSet: Option[DataFrame] =
          if (!wh.exists(centroidsTable)) {
            wh.appendBatch(qb, seedTable, batchId)
            val staged = wh.read(session, seedTable)
              .select("vec_id", "q", "nq").localCheckpoint(true)
            if (staged.isEmpty || staged.count() < IvfK) None
            else { trainCommit(staged); Some(staged) }
          } else {
            val marker = wh.read(session, centroidsTable)
              .select(max(col("trained_batch"))).head().getLong(0)
            // only v1 trains from the stage — a drift retrain (v2+) trains
            // on its own batch, so its replay must route qb, not the stage
            if (marker == batchId &&
                wh.currentVersion(centroidsTable).contains(1L) &&
                wh.exists(seedTable)) {
              // replay of the batch that trained v1 from the stage:
              // route the identical staged set, not just this batch
              val staged = wh.read(session, seedTable)
                .select("vec_id", "q", "nq").localCheckpoint(true)
              Some(staged)
            } else Some(qb)
          }

        routeSet.foreach { rows =>
          var centroids = wh.read(session, centroidsTable)
            .localCheckpoint(true)
          val trainedBatch =
            centroids.select(max(col("trained_batch"))).head().getLong(0)
          var scored = Similarity.assignScored(rows, centroids)
            .localCheckpoint(true)
          // ---- drift monitor: mean best-centroid cosine in nano-int
          // (order-insensitive BIGINT sum, q114's aggregation) — skipped
          // on the batch that (re)trained the current version: its rows
          // ARE the training distribution (and on the swap batch's
          // replay, re-checking against fresh centroids could cascade)
          if (driftTau > NeverRetrain && trainedBatch != batchId &&
              !scored.isEmpty) {
            val agg = scored
              .agg(sum(expr("CAST(floor(ccos * 1e9 + 0.5) AS BIGINT)")),
                count(lit(1))).head()
            val meanCcos = agg.getLong(0).toDouble / agg.getLong(1) / 1e9
            if (meanCcos < driftTau && rows.count() >= IvfK) {
              trainCommit(rows)
              centroids = wh.read(session, centroidsTable)
                .localCheckpoint(true)
              scored = Similarity.assignScored(rows, centroids)
                .localCheckpoint(true)
            }
          }
          val cver = wh.currentVersion(centroidsTable).getOrElse(1L)
          val out = scored
            .withColumn("src_batch", lit(batchId))
            .withColumn("cver", lit(cver))
            .localCheckpoint(true)
          wh.appendBatch(
            out.select("vec_id", "cid", "ccos", "src_batch", "cver"),
            assignTable, batchId)
          wh.appendBatch(
            rows.join(out.select("vec_id", "cid"), Seq("vec_id"))
              .withColumn("src_batch", lit(batchId))
              .select("vec_id", "cid", "q", "nq", "src_batch"),
            cellsTable, batchId)
        }
        ()
      }
      .start()
}
