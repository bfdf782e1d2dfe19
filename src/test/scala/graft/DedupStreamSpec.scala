package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables.Warehouse
import graft.streaming.DedupStream

/** Streaming dedup-at-ingest: the LSH index grows append-only with each
  * micro-batch, later batches find near-dups of EARLIER ingests only, and
  * an at-least-once replay changes nothing.
  */
class DedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  // near-identical pair generator: w1..wN and w1..w(N+1) share all but one
  // 3-gram shingle -> jaccard well above the 0.5 verify threshold
  private def doc(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  private def runBatch(input: MemoryStream[(Long, String)], wh: Warehouse,
      ckpt: String, rows: (Long, String)*): Unit = {
    input.addData(rows: _*)
    val q = DedupStream.start(
      input.toDS().toDF("doc_id", "text"), wh, ckpt)
    q.awaitTermination() // AvailableNow drains what was added, then stops
  }

  private def matches(wh: Warehouse): Set[(Long, Long)] = {
    if (!wh.exists("dedup_matches")) return Set.empty
    wh.read(spark, "dedup_matches").select("new_id", "old_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("later batches match earlier ingests only; index grows append-only") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val wh = Warehouse(tmpDir("dedup-stream-wh"))
    val ckpt = tmpDir("dedup-stream-ckpt")

    // batch 0: two unrelated docs — nothing to match, index seeded
    runBatch(input, wh, ckpt,
      (1L, doc(20)),
      (2L, (100 to 130).map(i => s"x$i").mkString(" ")))
    assert(matches(wh).isEmpty, "first batch has no prior corpus to match")

    // batch 1: near-dup of doc 1 plus a fresh doc; 3 and 1 must pair up.
    // 10 and 2's doc share nothing.
    runBatch(input, wh, ckpt,
      (3L, doc(21)),
      (10L, (200 to 230).map(i => s"y$i").mkString(" ")))
    assert(matches(wh) == Set((3L, 1L)),
      s"batch 1 must match its near-dup against batch 0: ${matches(wh)}")

    // batch 2: near-dup of BOTH earlier versions — matches 1 and 3, and the
    // jaccard column is the exact set ratio
    runBatch(input, wh, ckpt, (7L, doc(22)))
    assert(matches(wh) == Set((3L, 1L), (7L, 1L), (7L, 3L)))
    val j = wh.read(spark, "dedup_matches")
      .filter(col("new_id") === 7L && col("old_id") === 3L)
      .select("jaccard").collect()(0).getDouble(0)
    // doc(22) vs doc(21): 19 shared shingles of 20/19 distinct -> 19/20
    assert(math.abs(j - 19.0 / 20.0) < 1e-12, s"jaccard=$j")

    // the index holds every ingested doc exactly once
    assert(wh.read(spark, "dedup_index_sets").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 7L, 10L))
  }

  test("index compaction (small-file GC) preserves probe behavior for later batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val wh = Warehouse(tmpDir("dedup-compact-wh"))
    val ckpt = tmpDir("dedup-compact-ckpt")
    runBatch(input, wh, ckpt, (1L, doc(20)))
    runBatch(input, wh, ckpt, (3L, doc(21)))
    val before = matches(wh)
    // per-micro-batch appends = one file tree per batch; at 100 TB the
    // index would be millions of small files — compact to a bounded count
    val filesBefore = graft.plans.Maintenance
      .dataFiles(spark, wh, "dedup_index_buckets").size
    graft.plans.Maintenance.compact(spark, wh, "dedup_index_buckets", 1)
    graft.plans.Maintenance.compact(spark, wh, "dedup_index_sets", 1)
    assert(graft.plans.Maintenance.dataFiles(spark, wh, "dedup_index_buckets").size
      < filesBefore, "compaction must reduce the file count")
    assert(matches(wh) == before, "compaction must not touch the matches table")
    // the NEXT batch probes the compacted index and appends normally
    runBatch(input, wh, ckpt, (9L, doc(22)))
    assert(matches(wh) == before ++ Set((9L, 1L), (9L, 3L)),
      s"post-compaction probe must still find both stored docs: ${matches(wh)}")
    assert(wh.read(spark, "dedup_index_sets").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 9L))
  }

  test("at-least-once replay of a batch leaves matches and index unchanged") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val wh = Warehouse(tmpDir("dedup-replay-wh"))
    val ckpt = tmpDir("dedup-replay-ckpt")
    runBatch(input, wh, ckpt, (1L, doc(20)))
    runBatch(input, wh, ckpt, (3L, doc(21)))
    val before = matches(wh)
    assert(before == Set((3L, 1L)))
    // the faithful at-least-once case: crash AFTER batch 1's offsets were
    // logged but BEFORE its commit marker — on restart Spark replays batch
    // 1 against index tables that already contain batch 1's own entries.
    // The same-batch anti-join (no self-matches) + per-batch-subdir
    // overwrite (no duplicated rows) must make the replay byte-identical.
    java.nio.file.Files.delete(java.nio.file.Paths.get(ckpt, "commits", "1"))
    val q = DedupStream.start(input.toDS().toDF("doc_id", "text"), wh, ckpt)
    q.awaitTermination()
    assert(matches(wh) == before, "replay must be a no-op on matches")
    assert(wh.read(spark, "dedup_index_sets").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }
}
