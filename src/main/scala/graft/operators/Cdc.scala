package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{CdcConfig, DmsEnvelope => E}

/** The CDC fold: apply a DMS-style I/U/D changelog to a mirror table.
  *
  * Semantics pinned by the reference (behavior declared at tabular.py:39-64,
  * record shape + expected final state defined by
  * generate_sample_dms_parquet.py):
  *   - latest record per key (possibly COMPOSITE — [[CdcConfig.keyCols]]),
  *     ordered by `tsCol`, wins (tabular.py:47-49)
  *   - op `I`/`U` upserts the row, `D` removes it
  *     (generate_sample_dms_parquet.py:16-55)
  *   - late/out-of-order records with an older ts than the stored mirror row
  *     lose — the merge is order-insensitive across batches (T2 in SURVEY §2.9)
  *
  * Scale design (100 TB): the whole fold is ONE aggregation keyed by
  * `keyCol` — `groupBy(key).agg(latest_row(payload, ordering))` using the
  * custom [[graft.functions.LatestRow]] TypedImperativeAggregate, which
  * runs under ObjectHashAggregateExec with map-side partial aggregation
  * (`partial_latest_row` below the exchange and the absence of any sort,
  * both asserted in PlanContractSpec). The shuffle carries at most one
  * candidate row per key per map partition instead of the raw changelog.
  * (Built-in `max_by` would compute the same answer but its struct-typed
  * buffer degrades the plan to SortAggregate; a `row_number()` window
  * formulation would carry every change record through the shuffle and
  * then sort — both strictly worse.) Combined with a mirror stored
  * hash-partitioned by `keyCol` (plans/PartitionedMirror.scala), only
  * touched buckets merge.
  */
object Cdc {

  /** Internal tie-break column: position of the record in ingestion order.
    * The reference leaves equal-`ts` ordering unspecified (tabular.py:47-49
    * names only the ts column); we define file-order + row-position as the
    * deterministic tie-break, with mirror rows losing to incoming changes at
    * equal (ts, seq) so that re-applying a batch is idempotent.
    */
  val SeqCol = "_ingest_seq"

  /** Attach the ingestion-order tie-break. `monotonically_increasing_id` is
    * monotone in (partition index, row position) and Spark lists files in
    * sorted order, so ids follow file order + row position within a static
    * read. Streaming ingestion instead stamps `batchId << 40 | id`.
    */
  def withIngestSeq(changes: DataFrame): DataFrame =
    if (changes.columns.contains(SeqCol)) changes
    else changes.withColumn(SeqCol, monotonically_increasing_id())

  /** Stamp a batch-unique, globally ordered ingest sequence:
    * `batchId * 2^44 + rowId`. `monotonically_increasing_id` is
    * `(partitionId << 33) + rowInPartition`, so the intra-batch id stays
    * below 2^44 iff the batch has < 2^11 = 2048 input partitions — guarded
    * explicitly, because an overflow would leak into the batch bits and
    * INVERT cross-batch ordering for equal-ts rows. batchId itself fits
    * the remaining 19 bits (~500k micro-batches). Shared by the streaming
    * ingest ([[graft.streaming.CdcStream]]) and the merge-on-read mirror
    * ([[graft.plans.MorMirror]]): one encoding contract means a (ts, seq)
    * ordering resolves cross-batch ties identically everywhere.
    */
  def stampBatchSeq(df: DataFrame, batchId: Long): DataFrame = {
    val parts = df.rdd.getNumPartitions
    require(parts < (1 << 11),
      s"micro-batch has $parts partitions; ingest-seq encoding supports < 2048 — " +
        "bound the batch size (e.g. maxFilesPerTrigger)")
    require(batchId < (1L << 19),
      s"batchId $batchId exceeds the 19-bit budget of the ingest-seq encoding")
    df.withColumn(SeqCol,
      (lit(batchId) * lit(1L << 44)) + monotonically_increasing_id())
  }

  /** Ordering key for latest-wins: (ts, ingest-seq). */
  private def orderingStruct(cfg: CdcConfig, cols: Seq[String]): Column = {
    val seq = if (cols.contains(SeqCol)) col(SeqCol) else lit(0L)
    struct(col(cfg.tsCol), seq)
  }

  /** Latest record per key (SURVEY A1/W1): one ObjectHashAggregate via the
    * custom [[graft.functions.LatestRow]] argmax (hash map of key -> best
    * row, no sort — built-in max_by's struct buffer would degrade the plan
    * to SortAggregate).
    */
  def latestPerKey(changes: DataFrame, cfg: CdcConfig): DataFrame = {
    graft.functions.GraftFunctions.register(changes.sparkSession)
    val df = withIngestSeq(changes)
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(cfg.keyCols.zipWithIndex
        .map { case (c, i) => col(c).as(s"__k$i") }: _*)
      .agg(call_function("latest_row", payload, orderingStruct(cfg, df.columns))
        .as("__latest"))
      .select(df.columns.map(c => col(s"__latest.`$c`")): _*)
  }

  /** Apply one changelog batch to the mirror (SURVEY A2/J1/P4).
    *
    * The stored mirror retains `tsCol`, the tie-break seq, AND the op
    * column — deleted keys persist as TOMBSTONES. Both retentions exist for
    * the same reason (T2 order-insensitivity across late batches): a
    * late-arriving change older than the stored row loses, and a
    * late-arriving update older than a stored DELETE also loses — without
    * the tombstone, an out-of-order batch would resurrect a deleted key.
    * Mirror rows re-enter the fold with source-priority 0; incoming changes
    * carry priority 1 and win exact (ts, priority) ties, making re-applying
    * the same batch a no-op (idempotent restart, SURVEY T4).
    *
    * Returns the new stored mirror: data columns + `tsCol` + seq + op
    * (incl. tombstones). [[currentState]] is the user-facing view.
    * Tombstones older than the lateness horizon are GC'd by
    * [[graft.plans.Maintenance.expireTombstones]].
    */
  def applyBatch(mirror: DataFrame, changes: DataFrame, cfg: CdcConfig): DataFrame = {
    val pri = "_src_priority"
    val ch0 = withIngestSeq(changes).drop(E.SourceTableCol)
    // Schema alignment is SYMMETRIC (union of columns): a mirror column
    // missing from the batch (additive schema evolution, or a legacy batch
    // replayed after a column was added) must survive the merge as a typed
    // null on incoming rows - aligning to the change schema alone would
    // silently DROP the evolved column from the whole table.
    val mirrorOnly = mirror.columns
      .filterNot(c => ch0.columns.contains(c) || c == E.SourceTableCol)
    val ch = mirrorOnly.foldLeft(ch0) { (df, c) =>
      df.withColumn(c, lit(null).cast(mirror.schema(c).dataType))
    }
    val cols = ch.columns // union of data cols + op + tsCol + SeqCol
    val mirrorAsChanges = {
      // align the mirror to the change schema: a mirror bootstrapped from
      // plain initial-load files (DMS LOAD*) has NO envelope — no op, no
      // tsCol. Missing op defaults to U; any other missing column (incl.
      // tsCol) becomes a typed null. A null ts orders below every real ts
      // (Catalyst ordering: nulls first), so initial-load rows lose to any
      // change — and still survive when no change ever arrives for the key.
      val m0 = if (mirror.columns.contains(SeqCol)) mirror
               else mirror.withColumn(SeqCol, lit(0L))
      // coalesce, not just column-presence: a seed built from MIXED files
      // (LOAD rows + change rows under one mergeSchema read) carries an op
      // COLUMN whose LOAD rows are null — they are present rows and must
      // re-enter as updates, not as null ops that downstream visibility
      // filters would silently drop
      val m1 = if (m0.columns.contains(E.OpCol))
                 m0.withColumn(E.OpCol, coalesce(col(E.OpCol), lit(E.Update)))
               else m0.withColumn(E.OpCol, lit(E.Update))
      val m2 = cols.foldLeft(m1) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(ch.schema(c).dataType))
      }
      m2.withColumn(pri, lit(0)).select((cols.map(col) :+ col(pri)): _*)
    }
    val incoming = ch.withColumn(pri, lit(1))
      .select((cols.map(col) :+ col(pri)): _*)
    // register on BOTH sessions: inside foreachBatch the batch frame lives
    // in a cloned session with its own function registry, while the mirror
    // frame was read through the outer session — analysis of the combined
    // plan resolves against the left (mirror) side's registry
    graft.functions.GraftFunctions.register(changes.sparkSession)
    graft.functions.GraftFunctions.register(mirror.sparkSession)
    val all = mirrorAsChanges.unionByName(incoming)
    val payload = struct(all.columns.map(col): _*)
    val ordering = struct(col(cfg.tsCol), col(pri), col(SeqCol))
    all.groupBy(cfg.keyCols.zipWithIndex
        .map { case (c, i) => col(c).as(s"__k$i") }: _*)
      .agg(call_function("latest_row", payload, ordering).as("__latest"))
      .select(all.columns.map(c => col(s"__latest.`$c`")): _*)
      .drop(pri)
  }

  /** Fold a whole changelog into stored-mirror form: latest record per key
    * INCLUDING delete tombstones (op retained). This is what gets persisted.
    */
  def fold(changes: DataFrame, cfg: CdcConfig): DataFrame =
    latestPerKey(withIngestSeq(changes), cfg).drop(E.SourceTableCol)

  /** Apply a whole changelog and return the VISIBLE state (tombstones
    * dropped) — the one-shot query/bootstrap-compare path.
    */
  def applyAll(changes: DataFrame, cfg: CdcConfig): DataFrame =
    fold(changes, cfg)
      .filter(col(E.OpCol).isNull || col(E.OpCol) =!= E.Delete)
      .drop(E.OpCol)

  /** User-facing mirror state: hide tombstones, drop CDC bookkeeping.
    * Null-SAFE on the op: a stored row with a null op (a LOAD-seeded row
    * that predates the envelope) is a present row — `op =!= 'D'` alone
    * evaluates to null there and would silently hide it (found by the
    * independent MOR-layout checker, tools/verify_mor_layout.py).
    */
  def currentState(mirror: DataFrame): DataFrame = {
    val visible = if (mirror.columns.contains(E.OpCol))
      mirror.filter(col(E.OpCol).isNull || col(E.OpCol) =!= E.Delete)
    else mirror
    visible.drop(SeqCol, E.OpCol, E.SourceTableCol)
  }
}
