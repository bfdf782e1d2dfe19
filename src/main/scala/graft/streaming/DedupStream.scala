package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup
import graft.sources.Tables.Warehouse

/** Streaming dedup-at-ingest — the continuous twin of the batch probe
  * (q67): documents arrive as a stream; each micro-batch
  *
  *  1. probes the warehouse's banded-MinHash bucket index for candidates
  *     against everything ingested BEFORE it (an equi-join on (band, sig),
  *     never a corpus scan),
  *  2. verifies candidates with exact Jaccard over stored shingle sets
  *     (read back only for the candidate doc ids — semi-join reduction),
  *  3. appends confirmed matches to `matchesTable`, and
  *  4. appends its OWN buckets + shingle sets to the index tables —
  *     maintenance is append-only, so the index is always exactly "all
  *     previous batches" when the next batch probes it.
  *
  * Replay safety: every append is a per-batch-subdir overwrite
  * ([[Warehouse.appendBatch]]), so an at-least-once foreachBatch replay
  * rewrites the same files instead of duplicating index entries or
  * matches.
  *
  * Scale notes (100 TB): the bucket index is the only relation the probe
  * shuffles, and it carries one (band, sig) row per doc per band — at
  * rest it would be partitioned/bucketed by sig so the per-batch probe
  * partition-prunes; the shingle-set table is only ever read semi-joined
  * down to candidate ids. Cross-batch matches only: intra-batch dup
  * detection is the batch operator's job (q32 on the batch), keeping each
  * stage's semantics single-purpose.
  */
object DedupStream {

  /** Jaccard threshold for a confirmed match (q32/q67's verify level). */
  val Threshold = 0.5

  def start(
      docs: DataFrame,
      wh: Warehouse,
      checkpointDir: String,
      bucketsTable: String = "dedup_index_buckets",
      setsTable: String = "dedup_index_sets",
      matchesTable: String = "dedup_matches"): StreamingQuery =
    docs.writeStream
      .queryName(s"dedup-$matchesTable")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the micro-batch frame lives in a CLONED session with its own
        // function registry — register word_ngrams there, and do all reads
        // through that session so no plan mixes sessions
        val session = batch.sparkSession
        graft.functions.GraftFunctions.register(session)
        val sh = Dedup.shinglesOf(batch).localCheckpoint(true)
        // index rows carry their writing batch id: the replay guard below
        // excludes exactly the replayed batch's OWN entries — not every row
        // sharing a doc_id, which would silently drop legitimate matches
        // when a doc_id is re-ingested in a later batch (each stored
        // version then matches independently, documented semantics)
        val bk = Dedup.lshBuckets(sh)
          .withColumn("src_batch", lit(batchId)).localCheckpoint(true)
        val sets = sh.groupBy(col("doc_id"))
          .agg(collect_list(col("s")).as("sset"))
          .withColumn("src_batch", lit(batchId)).localCheckpoint(true)
        // probe only when BOTH index tables exist: batch 0 appends sets
        // first then buckets, so a crash between the two appends can never
        // leave a later replay probing buckets with no sets to verify from
        if (wh.exists(bucketsTable) && wh.exists(setsTable)) {
          val corpusBk = wh.read(session, bucketsTable)
            .filter(col("src_batch") =!= batchId)
          val candidates = bk.as("n").join(corpusBk.as("c"),
              col("n.band") === col("c.band") && col("n.sig") === col("c.sig"))
            .select(col("n.doc_id").as("new_id"), col("c.doc_id").as("old_id"))
            .distinct().localCheckpoint(true)
          val ids = candidates.select(col("old_id").as("doc_id")).distinct()
          val oldSets = wh.read(session, setsTable)
            .filter(col("src_batch") =!= batchId)
            .join(broadcast(ids), Seq("doc_id"), "left_semi")
          val matches = candidates
            .join(sets.as("sa"), col("new_id") === col("sa.doc_id"))
            .join(oldSets.as("sb"), col("old_id") === col("sb.doc_id"))
            .withColumn("inter",
              size(array_intersect(col("sa.sset"), col("sb.sset"))).cast("long"))
            .withColumn("jaccard", col("inter").cast("double") /
              (size(col("sa.sset")) + size(col("sb.sset")) - col("inter")))
            .filter(col("jaccard") >= Threshold)
            .select(col("new_id"), col("old_id"), col("jaccard"))
          wh.appendBatch(matches, matchesTable, batchId)
        }
        wh.appendBatch(sets, setsTable, batchId)
        wh.appendBatch(bk, bucketsTable, batchId)
        ()
      }
      .start()
}
