package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Curation}
import graft.sources.Tables.Warehouse

/** End-to-end composition of the two halves of the engine: the CDC control
  * plane (bootstrap -> changelog -> mirror via the SHIPPED
  * [[PipelineMain.run]] path) feeding the LLM-curation data plane (the q83
  * funnel) — proving a curation pass can run off the continuously-
  * maintained MIRROR and produce exactly what it would produce over the
  * equivalent static corpus. CDC churn is part of the fixture: an update
  * rewrites a junk doc into a clean one (it must re-enter the funnel's
  * survivor set), a delete removes a live doc (it must leave every stage),
  * and an idle re-run must change nothing.
  */
class E2eCurationSpec extends SparkTestBase {
  import spark.implicits._

  private var clock = 0
  private def ts(): String = { clock += 1; f"2024-01-01T00:00:00.$clock%06d" }

  // clean docs: distinct long tokens -> TTR 1, no short/punct/stopword hits
  private def clean(seed: Int): String =
    (0 until 8).map(i => s"token${seed}x$i").mkString(" ")
  // junk: one token repeated -> TTR 1/6, quality score 0.583 < 0.7
  private val junk = "spam spam spam spam spam spam"

  /** (id, text, op) rows -> a DMS-log parquet file. */
  private def writeLogs(path: String, logs: Seq[(Long, String, String)]): Unit =
    logs.map { case (id, t, op) => (id, t, "docs", op, ts()) }
      .toDF("id", "text", "table", "op", "ts")
      .coalesce(1).write.mode("overwrite").parquet(path)

  private def funnelRows(docs: DataFrame): Seq[(Long, String, Long, Long)] =
    Curation.funnelOf(docs).orderBy(col("stage"))
      .as[(Long, String, Long, Long)].collect().toSeq

  private def mirrorDocs(wh: Warehouse): DataFrame =
    Cdc.currentState(wh.read(spark, "docs"))
      .select(col("id").as("doc_id"), col("text"))

  test("q83 funnel over the CDC mirror == funnel over the equivalent static corpus, through churn") {
    val src = tmpDir("e2e-src")
    val docsDir = s"$src/docs"
    val wh = Warehouse(tmpDir("e2e-wh"))
    val config = PipelineConfig(wh.root, CdcConfig("id", "ts"), Seq(s"$docsDir/"))

    // batch 1: 6 inserts — 1 and 2 are exact duplicates (stage-2 drop for
    // the higher id), 3 is junk (stage-3 drop), 4..6 clean and distinct
    val texts0 = Map(
      1L -> clean(1), 2L -> clean(1), 3L -> junk,
      4L -> clean(4), 5L -> clean(5), 6L -> clean(6))
    writeLogs(s"$docsDir/dms_logs_1.parquet",
      texts0.toSeq.sortBy(_._1).map { case (id, t) => (id, t, "I") })
    PipelineMain.run(spark, config)

    val expected0 = texts0.toSeq.toDF("doc_id", "text")
    assert(funnelRows(mirrorDocs(wh)) == funnelRows(expected0),
      "funnel(mirror) must equal funnel(static corpus) after the initial load")

    // batch 2: churn — junk doc 3 is UPDATED to clean text (re-enters the
    // survivor set), clean doc 5 is DELETED (leaves every stage); the
    // shipped pipeline picks the new file up incrementally (checkpointed)
    writeLogs(s"$docsDir/dms_logs_2.parquet", Seq(
      (3L, clean(3), "U"),
      (5L, texts0(5L), "D")))
    PipelineMain.run(spark, config)

    val texts1 = texts0 - 5L + (3L -> clean(3))
    val expected1 = texts1.toSeq.toDF("doc_id", "text")
    val afterChurn = funnelRows(mirrorDocs(wh))
    assert(afterChurn == funnelRows(expected1),
      "funnel(mirror) must track CDC churn exactly")
    // the churn moved the funnel the way curation semantics say it must:
    // 5 live docs, doc 2 still the only exact-dup drop, no junk left
    assert(afterChurn.map(r => (r._1, r._3)) == Seq((1L, 5L), (2L, 4L), (3L, 4L), (4L, 4L)),
      s"stage doc counts after churn: $afterChurn")

    // idle re-run of the pipeline must not move the funnel
    PipelineMain.run(spark, config)
    assert(funnelRows(mirrorDocs(wh)) == afterChurn,
      "an idle pipeline re-run must be a funnel no-op")
  }

  test("the same composition through the MERGE-ON-READ mirror: funnel(MOR mirror) tracks churn") {
    val src = tmpDir("e2e-mor-src")
    val docsDir = s"$src/docs"
    val wh = Warehouse(tmpDir("e2e-mor-wh"))
    // the CLI surface: GRAFT_MIRROR_MOR + GRAFT_MIRROR_BUCKETS
    val config = PipelineConfig(wh.root, CdcConfig("id", "ts"), Seq(s"$docsDir/"),
      mirrorBuckets = Some(4), mirrorMor = true)
    def morDocs(): DataFrame =
      graft.plans.MorMirror.read(spark, wh, "docs")
        .select(col("id").as("doc_id"), col("text"))

    val texts0 = Map(
      1L -> clean(1), 2L -> clean(1), 3L -> junk,
      4L -> clean(4), 5L -> clean(5), 6L -> clean(6))
    writeLogs(s"$docsDir/dms_logs_1.parquet",
      texts0.toSeq.sortBy(_._1).map { case (id, t) => (id, t, "I") })
    PipelineMain.run(spark, config)
    assert(graft.plans.MorMirror.storedConfig(wh, "docs").isDefined,
      "the pipeline must have taken the MOR layout")
    assert(funnelRows(morDocs()) == funnelRows(texts0.toSeq.toDF("doc_id", "text")))

    writeLogs(s"$docsDir/dms_logs_2.parquet", Seq(
      (3L, clean(3), "U"),
      (5L, texts0(5L), "D")))
    PipelineMain.run(spark, config)
    assert(graft.plans.MorMirror.pendingDeltas(wh, "docs") >= 1,
      "the churn batch must have landed as an O(delta) commit")
    val texts1 = texts0 - 5L + (3L -> clean(3))
    val afterChurn = funnelRows(morDocs())
    assert(afterChurn == funnelRows(texts1.toSeq.toDF("doc_id", "text")),
      "funnel(MOR mirror) must track CDC churn exactly")
    // compaction mid-pipeline must not move the funnel either
    graft.plans.MorMirror.compact(spark, wh, "docs")
    assert(funnelRows(morDocs()) == afterChurn,
      "compaction must be invisible to the curation pass")
  }
}
