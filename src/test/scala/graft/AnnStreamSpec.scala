package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables.Warehouse
import graft.streaming.AnnStream

/** Streaming ANN ingest: the first micro-batch trains the frozen IVF
  * index, later batches route to it without retraining, the streamed
  * assignments equal the batch operator's over the same corpus + index,
  * and an at-least-once replay changes nothing.
  */
class AnnStreamSpec extends SparkTestBase {
  import spark.implicits._

  // two well-separated clusters (by id parity) + per-id jitter — cell
  // assignment is unambiguous, ccos values are distinct across ids
  private def vec(id: Long): Seq[Double] = {
    val base = if (id % 2 == 0) Seq(1.0, 0.1, 0.5, -0.2)
               else Seq(-1.0, 0.8, -0.5, 0.3)
    base.zipWithIndex.map { case (b, d) => b + (id * 7 + d * 3) % 11 * 0.01 }
  }

  private def runBatch(input: MemoryStream[(Long, Seq[Double])],
      wh: Warehouse, ckpt: String, ids: Long*): Unit = {
    input.addData(ids.map(i => (i, vec(i))): _*)
    val q = AnnStream.start(
      input.toDS().toDF("vec_id", "embedding"), wh, ckpt)
    q.awaitTermination()
  }

  private def assignments(wh: Warehouse): Set[(Long, Long, Double)] =
    wh.read(spark, "ann_assignments").select("vec_id", "cid", "ccos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed assignments == batch operator over the same corpus and frozen index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    val wh = Warehouse(tmpDir("ann-stream-wh"))
    val ckpt = tmpDir("ann-stream-ckpt")

    runBatch(input, wh, ckpt, 0L to 9L: _*)   // trains on these 10
    runBatch(input, wh, ckpt, 10L to 15L: _*) // routed to the frozen index
    runBatch(input, wh, ckpt, 16L, 17L)

    // batch path: identical recipe — centroids from batch 0 only, then one
    // assignScored over everything ingested
    val all = (0L to 17L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val qAll = Similarity.quantized(all).select("vec_id", "q", "nq")
    val q0 = qAll.filter(col("vec_id") <= 9)
    val seeds = q0.orderBy(col("vec_id")).limit(AnnStream.IvfK)
      .select(col("vec_id").as("cid"), col("q").as("csum"), col("nq").as("nc"))
    val batchScored = Similarity
      .assignScored(qAll, Similarity.ivfCentroids(q0, seeds))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(assignments(wh) == batchScored,
      "streaming and batch must produce identical (vec_id, cid, ccos) rows")

    // the index is FROZEN after batch 0: stored centroids equal a retrain
    // on batch-0 data alone, and later batches did not bump the version
    assert(wh.currentVersion("ann_centroids") == Some(1L),
      "later batches must not retrain/recommit the centroid table")
    val stored = wh.read(spark, "ann_centroids")
      .select("cid", "csum", "nc")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSet
    val retrained = Similarity.ivfCentroids(q0, seeds)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSet
    assert(stored == retrained, "frozen centroids = deterministic batch-0 train")

    // the routed per-cell store holds every ingested vector exactly once
    assert(wh.read(spark, "ann_cells").select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq == (0L to 17L).toSeq)
  }

  test("at-least-once replay of a batch leaves assignments and cells unchanged") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    val wh = Warehouse(tmpDir("ann-replay-wh"))
    val ckpt = tmpDir("ann-replay-ckpt")
    runBatch(input, wh, ckpt, 0L to 9L: _*)
    runBatch(input, wh, ckpt, 10L, 11L)
    val before = assignments(wh)
    val cellsBefore = wh.read(spark, "ann_cells")
      .collect().map(_.toString).sorted.toSeq
    // crash AFTER batch 1's offsets were logged, BEFORE its commit marker:
    // restart replays batch 1 against tables already holding its rows
    java.nio.file.Files.delete(java.nio.file.Paths.get(ckpt, "commits", "1"))
    val q = AnnStream.start(input.toDS().toDF("vec_id", "embedding"), wh, ckpt)
    q.awaitTermination()
    assert(assignments(wh) == before, "replay must be a no-op on assignments")
    assert(wh.read(spark, "ann_cells").collect().map(_.toString).sorted.toSeq
      == cellsBefore, "replay must be a no-op on the cell store")
    assert(wh.currentVersion("ann_centroids") == Some(1L),
      "replay must not recommit the centroid table")
  }
}
