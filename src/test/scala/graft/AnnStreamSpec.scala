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

  // a distribution FAR from both training clusters: near-orthogonal to
  // either base pattern, so every best-centroid cosine sits well under
  // the default drift threshold
  private def driftedVec(id: Long): Seq[Double] = {
    val base = Seq(0.0, 0.0, 5.0, 5.0)
    base.zipWithIndex.map { case (b, d) => b + (id * 7 + d * 3) % 11 * 0.01 }
  }

  test("undersized first batches stage without freezing a degenerate index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    val wh = Warehouse(tmpDir("ann-seed-wh"))
    val ckpt = tmpDir("ann-seed-ckpt")

    // 3 rows < IvfK: nothing may train, nothing may route, nothing drops
    runBatch(input, wh, ckpt, 0L, 1L, 2L)
    assert(!wh.exists("ann_centroids"),
      "an undersized seed batch must not commit a centroid table")
    assert(!wh.exists("ann_assignments") && !wh.exists("ann_cells"),
      "unrouted rows wait in the stage, not in the sinks")

    // next batch brings the staged total to 10 >= IvfK: train on the WHOLE
    // staged set and route every staged row — no arrival dropped
    runBatch(input, wh, ckpt, 3L to 9L: _*)
    assert(wh.currentVersion("ann_centroids") == Some(1L))
    assert(wh.read(spark, "ann_cells").select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq == (0L to 9L).toSeq,
      "training must route the full staged set exactly once")

    // the trained index equals a deterministic batch train over all staged
    val all = (0L to 9L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val qAll = Similarity.quantized(all).select("vec_id", "q", "nq")
    val seeds = qAll.orderBy(col("vec_id")).limit(AnnStream.IvfK)
      .select(col("vec_id").as("cid"), col("q").as("csum"), col("nq").as("nc"))
    val retrained = Similarity.ivfCentroids(qAll, seeds)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSet
    val stored = wh.read(spark, "ann_centroids").select("cid", "csum", "nc")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSet
    assert(stored == retrained)
  }

  test("replaying a stage-only batch is a no-op; training still completes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    val wh = Warehouse(tmpDir("ann-seed-replay-wh"))
    val ckpt = tmpDir("ann-seed-replay-ckpt")
    runBatch(input, wh, ckpt, 0L, 1L, 2L)
    // crash after offsets, before commit: replay re-stages identically
    java.nio.file.Files.delete(java.nio.file.Paths.get(ckpt, "commits", "0"))
    val q = AnnStream.start(input.toDS().toDF("vec_id", "embedding"), wh, ckpt)
    q.awaitTermination()
    assert(!wh.exists("ann_centroids") && !wh.exists("ann_assignments"))
    runBatch(input, wh, ckpt, 3L to 9L: _*)
    assert(wh.read(spark, "ann_cells").select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq == (0L to 9L).toSeq)
  }

  test("drift retrains, atomically swaps to v2, and keeps replay exact") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    val wh = Warehouse(tmpDir("ann-drift-wh"))
    val ckpt = tmpDir("ann-drift-ckpt")

    runBatch(input, wh, ckpt, 0L to 9L: _*) // trains v1 on cluster A/B mix
    assert(wh.currentVersion("ann_centroids") == Some(1L))

    // batch 1: a shifted distribution — mean best-centroid cosine < tau
    input.addData((100L to 109L).map(i => (i, driftedVec(i))): _*)
    var q = AnnStream.start(input.toDS().toDF("vec_id", "embedding"), wh, ckpt)
    q.awaitTermination()
    assert(wh.currentVersion("ann_centroids") == Some(2L),
      "a drifted batch must retrain and commit v2")

    // post-swap: the triggering batch routed against v2, and its rows
    // equal a batch rebuild trained on exactly that batch
    val drifted = (100L to 109L).map(i => (i, driftedVec(i)))
      .toDF("vec_id", "embedding")
    val qd = Similarity.quantized(drifted).select("vec_id", "q", "nq")
    val seeds2 = qd.orderBy(col("vec_id")).limit(AnnStream.IvfK)
      .select(col("vec_id").as("cid"), col("q").as("csum"), col("nq").as("nc"))
    val rebuilt = Similarity.assignScored(qd, Similarity.ivfCentroids(qd, seeds2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = wh.read(spark, "ann_assignments")
      .filter(col("src_batch") === 1)
      .select("vec_id", "cid", "ccos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == rebuilt,
      "post-swap routing must equal a batch rebuild on the drifted data")

    // provenance: v1-routed rows carry cver=1, swap-batch rows cver=2
    val cvers = wh.read(spark, "ann_assignments")
      .select("src_batch", "cver").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cvers == Set((0L, 1L), (1L, 2L)))

    // replay the SWAP batch: crash landed after the v2 commit but before
    // the checkpoint commit — the marker makes the rerun byte-identical
    val before = assignments(wh)
    val cellsBefore = wh.read(spark, "ann_cells")
      .collect().map(_.toString).sorted.toSeq
    java.nio.file.Files.delete(java.nio.file.Paths.get(ckpt, "commits", "1"))
    q = AnnStream.start(input.toDS().toDF("vec_id", "embedding"), wh, ckpt)
    q.awaitTermination()
    assert(assignments(wh) == before, "swap-batch replay must be a no-op")
    assert(wh.read(spark, "ann_cells").collect().map(_.toString).sorted.toSeq
      == cellsBefore)
    assert(wh.currentVersion("ann_centroids") == Some(2L),
      "swap-batch replay must not recommit a v3")

    // a further in-distribution batch routes against v2 without a v3
    input.addData((110L to 115L).map(i => (i, driftedVec(i))): _*)
    q = AnnStream.start(input.toDS().toDF("vec_id", "embedding"), wh, ckpt)
    q.awaitTermination()
    assert(wh.currentVersion("ann_centroids") == Some(2L),
      "arrivals matching the new distribution must not cascade a v3")
    assert(wh.read(spark, "ann_assignments")
      .filter(col("src_batch") === 2).select("cver").distinct()
      .collect().map(_.getLong(0)).toSeq == Seq(2L),
      "post-swap arrivals must carry v2 provenance")
  }
}
