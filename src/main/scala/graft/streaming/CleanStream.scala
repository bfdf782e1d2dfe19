package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis
import graft.sources.Tables.Warehouse

/** Streaming cleaning-at-ingest — the continuous twin of q137's
  * boilerplate removal, completing the at-ingest trio next to
  * [[DedupStream]] (dedup) and [[AnnStream]] (indexing): documents
  * arrive as a stream, and each micro-batch's per-document boilerplate
  * coverage is appended to a report table the downstream curation reads.
  *
  * The frequent-gram set is FROZEN, not rolling: batches stage into
  * `seedTable` until [[MinSeedDocs]] documents accumulate, the census
  * trains ONCE on the whole staged set ([[TextAnalysis
  * .boilerplateGramsOf]] — the [[AnnStream]] seed-stage recipe, round-8
  * advice: an undersized or empty first batch must never commit a
  * degenerate artifact), and every later batch is scored against that
  * one stored set. A per-batch census would silently re-define
  * "boilerplate" as the stream's topic mix drifts — scores stop being
  * comparable across time, which defeats the report's purpose; when the
  * set HAS drifted, the operator answer is a versioned retrain-and-swap
  * (AnnStream's lifecycle), not a per-batch mutation.
  *
  * Replay safety: the report append is a per-batch-subdir overwrite
  * ([[Warehouse.appendBatch]]); the grams commit is existence-guarded
  * and carries `trained_batch`, so a replay of the training batch
  * re-reports the full staged set (byte-identical — the census is
  * deterministic) instead of just its own rows.
  *
  * Scale notes (100 TB): the stored gram set is corpus-size-independent
  * (q137's df>=p·N bound) and broadcasts to each batch; per batch the
  * work is one codegen `word_ngrams` scan and a batch-local agg. No
  * corpus rescan ever — the stage is touched only before training.
  */
object CleanStream {

  /** Minimum staged documents before the frequent-gram census trains —
    * a df-threshold census over a handful of docs is noise (below
    * ~13 docs the 8% threshold floors at df >= 1 and everything is
    * "boilerplate"). Consequence a deployment must know: a stream whose
    * LIFETIME volume stays under this floor stages forever and emits no
    * reports — by design (no degenerate set is ever committed); the
    * operator remedy is lowering the floor, not removing the guard.
    */
  val MinSeedDocs = 20

  def start(
      docs: DataFrame,
      wh: Warehouse,
      checkpointDir: String,
      gramsTable: String = "boiler_grams",
      reportTable: String = "clean_report",
      seedTable: String = "clean_seed_stage"): StreamingQuery =
    docs.writeStream
      .queryName(s"clean-$reportTable")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the micro-batch frame lives in a CLONED session with its own
        // function registry — register word_ngrams there
        val session = batch.sparkSession
        graft.functions.GraftFunctions.register(session)
        val withToks = (d: DataFrame) =>
          d.withColumn("toks", split(col("text"), " "))

        def reportOf(d0: DataFrame, fq: DataFrame): DataFrame = {
          val d = withToks(d0).localCheckpoint(true)
          d.select(col("doc_id"), col("source"),
              size(col("toks")).cast("long").as("n_tokens"))
            .join(TextAnalysis.coveredPerDoc(d, fq), Seq("doc_id"), "left")
            .select(col("doc_id"), col("source"), col("n_tokens"),
              coalesce(col("covered"), lit(0L)).as("covered_tokens"))
        }

        if (!wh.exists(gramsTable)) {
          // stage until the census has enough documents to be meaningful;
          // an empty or undersized stage never trains (no degenerate set)
          if (!batch.isEmpty)
            wh.appendBatch(batch.select("doc_id", "source", "text"),
              seedTable, batchId)
          if (wh.exists(seedTable)) {
            val staged = wh.read(session, seedTable)
              .select("doc_id", "source", "text").localCheckpoint(true)
            if (staged.count() >= MinSeedDocs) {
              val fq = TextAnalysis.boilerplateGramsOf(
                withToks(staged).localCheckpoint(true))
              // durable marker OUTSIDE the data rows: a corpus with no
              // frequent bigram trains an EMPTY set (legitimate — "no
              // boilerplate"), and max(trained_batch) over zero rows is
              // null — the marker must not live only in the data. Written
              // BEFORE the grams commit: a crash between the two replays
              // into the table-absent branch (marker harmlessly
              // re-written); the reverse order would replay into the
              // marker=-1 branch and permanently skip the staged
              // backlog's coverage report.
              graft.sources.Tables.TableProps.write(wh, gramsTable,
                graft.sources.Tables.TableProps.read(wh, gramsTable) +
                  ("trained_batch" -> batchId.toString))
              wh.overwrite(fq.withColumn("trained_batch", lit(batchId)),
                gramsTable)
              // the training batch reports the WHOLE staged backlog —
              // every doc ingested so far gets its coverage row
              wh.appendBatch(reportOf(staged,
                wh.read(session, gramsTable).select("g")),
                reportTable, batchId)
            }
          }
        } else {
          val grams = wh.read(session, gramsTable)
          // props marker first (survives an empty trained set); null-safe
          // column fallback for tables written before the props marker
          val marker = graft.sources.Tables.TableProps.read(wh, gramsTable)
            .get("trained_batch").map(_.toLong).getOrElse {
              val r = grams.select(max(col("trained_batch"))).head()
              if (r.isNullAt(0)) -1L else r.getLong(0)
            }
          if (marker == batchId) {
            // at-least-once replay of the batch that trained: re-report
            // the identical staged set (deterministic -> same bytes into
            // the same per-batch subdir)
            val staged = wh.read(session, seedTable)
              .select("doc_id", "source", "text").localCheckpoint(true)
            wh.appendBatch(reportOf(staged, grams.select("g")),
              reportTable, batchId)
          } else if (!batch.isEmpty) {
            wh.appendBatch(reportOf(batch, grams.select("g")),
              reportTable, batchId)
          }
        }
        ()
      }
      .start()
}
