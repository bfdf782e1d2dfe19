package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables.Warehouse
import graft.streaming.CleanStream

/** Streaming cleaning-at-ingest: the frequent-gram set trains ONCE on the
  * seed stage (never on an undersized prefix), later batches score
  * against the frozen set, streamed coverage equals the batch kernel on
  * the same data, and an at-least-once replay changes nothing.
  */
class CleanStreamSpec extends SparkTestBase {
  import spark.implicits._

  // docs built from a shared boilerplate prefix ("nav home nav") plus a
  // unique tail — the boilerplate bigrams clear any df threshold while
  // tail bigrams stay unique
  private def doc(id: Long): String =
    s"nav home nav u${id}a u${id}b u${id}c u${id}d"

  private def runBatch(input: MemoryStream[(Long, String, String)],
      wh: Warehouse, ckpt: String, rows: (Long, String, String)*): Unit = {
    input.addData(rows: _*)
    import spark.implicits._
    val q = CleanStream.start(
      input.toDS().toDF("doc_id", "source", "text"), wh, ckpt)
    q.awaitTermination()
  }

  private def report(wh: Warehouse): Map[Long, (Long, Long)] = {
    if (!wh.exists("clean_report")) return Map.empty
    wh.read(spark, "clean_report")
      .select("doc_id", "n_tokens", "covered_tokens").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("census trains once on the full stage; frozen set scores later batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val wh = Warehouse(tmpDir("clean-stream-wh"))
    val ckpt = tmpDir("clean-stream-ckpt")

    // batch 0: 10 docs — below MinSeedDocs, so no set, no report yet
    runBatch(input, wh, ckpt, (0L until 10L).map(i => (i, "s0", doc(i))): _*)
    assert(!wh.exists("boiler_grams"), "undersized stage must not train")
    assert(report(wh).isEmpty, "no report before the set exists")

    // batch 1: 15 more — stage reaches 25 >= MinSeedDocs: train + report
    // the WHOLE backlog (all 25 docs, including batch 0's)
    runBatch(input, wh, ckpt, (10L until 25L).map(i => (i, "s1", doc(i))): _*)
    assert(wh.exists("boiler_grams"))
    val r1 = report(wh)
    assert(r1.keySet == (0L until 25L).toSet,
      s"training batch reports the full staged backlog: ${r1.keySet}")
    // every doc: 7 tokens; "nav home" + "home nav" cover positions 0,1,2
    // (the seed-corpus boilerplate); unique-tail bigrams are df=1
    r1.foreach { case (id, (nt, cov)) =>
      assert(nt == 7L && cov == 3L, s"doc $id: ($nt, $cov)")
    }

    // batch 2: scored against the FROZEN set — a doc of pure boilerplate
    // is fully covered, a doc of fresh tokens not at all, even though a
    // per-batch census over this batch would classify differently
    runBatch(input, wh, ckpt,
      (100L, "s2", "nav home nav home nav"),
      (101L, "s2", "fresh alpha beta gamma"))
    val r2 = report(wh)
    assert(r2(100L) == ((5L, 5L)), s"all-boilerplate doc: ${r2(100L)}")
    assert(r2(101L) == ((4L, 0L)), s"fresh doc: ${r2(101L)}")

    // streamed coverage == the batch kernel applied with the same frozen
    // set (the twin contract): recompute via the shared q137 kernel
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val all = ((0L until 25L).map(i => (i, doc(i))) ++
        Seq((100L, "nav home nav home nav"), (101L, "fresh alpha beta gamma")))
      .toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
    val fq = wh.read(spark, "boiler_grams").select("g")
    val expected = graft.operators.TextAnalysis.coveredPerDoc(all, fq)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamed = report(wh)
    streamed.foreach { case (id, (_, cov)) =>
      assert(cov == expected.getOrElse(id, 0L),
        s"doc $id: streamed $cov != batch ${expected.getOrElse(id, 0L)}")
    }
  }

  test("report compaction (small-file GC) preserves the rows and later batches append normally") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val wh = Warehouse(tmpDir("clean-compact-wh"))
    val ckpt = tmpDir("clean-compact-ckpt")
    runBatch(input, wh, ckpt, (0L until 25L).map(i => (i, "s0", doc(i))): _*)
    runBatch(input, wh, ckpt, (25L until 30L).map(i => (i, "s1", doc(i))): _*)
    val before = report(wh)
    val filesBefore = graft.plans.Maintenance
      .dataFiles(spark, wh, "clean_report").size
    graft.plans.Maintenance.compact(spark, wh, "clean_report", 1)
    assert(graft.plans.Maintenance.dataFiles(spark, wh, "clean_report").size
      < filesBefore, "compaction must reduce the file count")
    assert(report(wh) == before, "compaction must not change report rows")
    // next batch scores against the unchanged frozen set and appends
    runBatch(input, wh, ckpt, (100L, "s2", "nav home nav"))
    assert(report(wh)(100L) == ((3L, 3L)))
  }

  test("replay is a no-op: same checkpoint + same input changes nothing") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val wh = Warehouse(tmpDir("clean-replay-wh"))
    val ckpt = tmpDir("clean-replay-ckpt")
    runBatch(input, wh, ckpt, (0L until 25L).map(i => (i, "s0", doc(i))): _*)
    val before = report(wh)
    assert(before.size == 25)
    // restart against the same checkpoint with nothing new: no re-ingest,
    // no duplicate report rows, grams version unchanged
    val q = {
      import spark.implicits._
      CleanStream.start(input.toDS().toDF("doc_id", "source", "text"), wh, ckpt)
    }
    q.awaitTermination()
    assert(report(wh) == before)
    assert(wh.read(spark, "clean_report").count() == 25L)
  }
}
