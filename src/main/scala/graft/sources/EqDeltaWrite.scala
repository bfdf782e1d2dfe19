package graft.sources

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.Tables.Warehouse

/** Merge-on-read `UPDATE` / `MERGE INTO` (round 15): Spark's DELTA-BASED
  * row-level operations ([[SupportsDelta]]) on the equality-delete
  * substrate — the commit writes O(changed rows), never a copy-on-write
  * file rewrite. This is Iceberg v2's merge-on-read write path
  * re-expressed on plain parquet (the same spec the reference's mirror
  * inherits via tabular.py:69-70):
  *
  *  - Spark's `RewriteUpdateTable` / `RewriteMergeIntoTable` see a
  *    [[SupportsDelta]] operation and plan a `WriteDelta` of exactly the
  *    TOUCHED rows (`representUpdateAsDeleteAndInsert` splits updates),
  *    instead of `ReplaceData`'s whole-group rewrite;
  *  - executor tasks stream INSERT/REINSERT rows straight into final
  *    parquet files in an exclusively-allocated stage (the
  *    [[GraftCowBatchWrite]] discipline — no `_temporary`, no Hadoop
  *    committer) and DELETE row-ids into the staged sidecar's
  *    `keys.parquet` directory;
  *  - the driver commit carries every base file by link (plus every
  *    PENDING sidecar — deltas stack by the census rule), writes the new
  *    sidecar's census = the PINNED snapshot's data files (so the new
  *    data files this very commit adds are OUTSIDE it: a re-written key
  *    is visible, exactly Iceberg's sequence-number scoping), and
  *    publishes with the pointer CAS against the version observed at
  *    plan time.
  *
  * Loud refusals instead of silent wrongness: a DELETE record with a
  * NULL key (no sidecar can identify it) and a matched set past
  * [[EqDeletes.MaxKeys]] (the read tax would stop being "broadcast
  * small side") both abort the statement with the remedial CALL named.
  */
private[graft] object MorDeltaOperation {
  /** Test seam: the last runtime-narrowed file selection a delta
    * MERGE's target scan settled on (None = no narrowing ran). Written
    * by the scan's selection callback, read by specs/stress harnesses.
    */
  @volatile private[graft] var lastScanSelection: Option[Seq[String]] = None
}

private[sources] class MorDeltaOperation(wh: Warehouse, table: String,
    tableSchema: StructType, keyCols: Seq[String],
    cmd: RowLevelOperation.Command, pinnedDir: String,
    scanBuilderFor: CaseInsensitiveStringMap => ScanBuilder,
    expected: Option[Long],
    branch: Option[(String, Long)] = None)
  extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String =
    s"MorDeltaOperation($table, $cmd, key=${keyCols.mkString(",")})"

  /** The table's declared key (possibly COMPOSITE — Iceberg identifier
    * fields) IS the row identity — the same contract every keyed path
    * in this engine holds (exact when unique).
    */
  override def rowId(): Array[NamedReference] =
    keyCols.map(Expressions.column).toArray

  /** Updates split into DELETE + REINSERT: the sidecar removes the old
    * row by key, the reinserted row lands outside the census.
    */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    scanBuilderFor(options)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new MorDeltaWrite(wh, table, tableSchema, keyCols, pinnedDir,
          expected, branch)
    }
}

private class MorDeltaWrite(wh: Warehouse, table: String,
    schema: StructType, keyCols: Seq[String], pinnedDir: String,
    expected: Option[Long],
    branch: Option[(String, Long)] = None) extends DeltaWrite {

  private val keySchema = StructType(keyCols.map(c =>
    StructField(c, schema(c).dataType, nullable = false)))

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    private var stage: java.nio.file.Path = _
    private var legacyMoved = false
    private var sidecarDir: java.nio.file.Path = _

    override def createBatchWriterFactory(
        info: PhysicalWriteInfo): DeltaWriterFactory = {
      val spark = SparkSession.active
      legacyMoved = wh.migrateLegacy(table)
      stage = wh.allocateStage(table)
      sidecarDir = stage.resolve(EqDeletes.Dir)
        .resolve(s"d${System.nanoTime()}-${UUID.randomUUID()}")
      java.nio.file.Files.createDirectories(
        sidecarDir.resolve("keys.parquet"))
      def prepared(s: StructType) = {
        val job = Job.getInstance(spark.sessionState.newHadoopConf())
        val f = ParquetUtils.prepareWrite(spark.sessionState.conf, job, s,
          new ParquetOptions(Map.empty[String, String],
            spark.sessionState.conf))
        (f, new SerializableHadoopConf(job.getConfiguration))
      }
      val (rowF, rowC) = prepared(schema)
      val (keyF, keyC) = prepared(keySchema)
      new MorDeltaWriterFactory(stage.toString,
        sidecarDir.resolve("keys.parquet").toString,
        schema, keySchema, rowF, rowC, keyF, keyC)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val commits = messages.collect { case m: MorDeltaCommit => m }
      val nullDeletes = commits.map(_.nullKeyDeletes).sum
      if (nullDeletes > 0) {
        wh.discardStage(stage)
        throw new UnsupportedOperationException(
          s"merge-on-read ${table} rewrite matched $nullDeletes row(s) " +
            s"with a NULL key component " +
            s"('${keyCols.mkString("','")}'): an equality-delete " +
            "sidecar cannot identify them. Repair the keys, or UNSET " +
            s"${EqDeletes.ModeProp} (after CALL compact) for a " +
            "copy-on-write rewrite")
      }
      val nKeys = commits.map(_.deletedKeys).sum
      if (nKeys > EqDeletes.MaxKeys) {
        wh.discardStage(stage)
        throw new UnsupportedOperationException(
          s"merge-on-read ${table} rewrite matched $nKeys keys — past " +
            s"the ${EqDeletes.MaxKeys} sidecar bound a copy-on-write " +
            s"rewrite is the better plan: CALL compact first and rerun " +
            s"with ${EqDeletes.ModeProp} unset")
      }
      val dataCommitted = commits.flatMap(_.dataFile).toSet
      val keyCommitted = commits.flatMap(_.keyFile).toSet
      if (dataCommitted.isEmpty && nKeys == 0) {
        // the operation matched nothing and inserted nothing: no-op,
        // no new version (the deleteWhere no-op discipline)
        wh.discardStage(stage)
        return
      }
      // prune uncommitted task attempts (speculative/retried)
      def prune(dir: java.nio.file.Path, keep: Set[String]): Unit = {
        val s = java.nio.file.Files.list(dir)
        try s.iterator().asScala.foreach { f =>
          val n = f.getFileName.toString
          if (n.endsWith(".parquet") && !keep(n))
            java.nio.file.Files.delete(f)
        } finally s.close()
      }
      prune(stage, dataCommitted)
      prune(sidecarDir.resolve("keys.parquet"), keyCommitted)
      // the census is the PINNED snapshot's file set — captured before
      // the carry so the new data files stay outside it (a reinserted
      // key's row is visible past its own delete record) — NARROWED to
      // the files that can contain a deleted key when the snapshot
      // carries zone-map evidence for the key column (keep-conservative
      // bloom/min-max probe, so exclusion is proof of absence): the
      // read-side split then keeps every other file vectorized
      val spark = SparkSession.active
      val all = graft.plans.ZoneMap.dataFileCensus(spark, pinnedDir)
      val census = EqDeletes.narrowedCensus(spark, pinnedDir, keyCols,
        keySchema.map(_.dataType),
        spark.read.schema(keySchema)
          .parquet(sidecarDir.resolve("keys.parquet").toString)
          .collect().map(r => keyCols.indices.map(r.get)).toIndexedSeq,
        nKeys, all)
      // carry source: on MAIN the freshest published version below the
      // stage (the pinned snapshot unless a rival landed — the CAS then
      // fails and the stage discards); on a BRANCH the pinned branch
      // HEAD (carryPreviousInto reasons over published main history,
      // which a branch commit is not part of)
      branch match {
        case Some(_) => wh.carryVersionInto(
          java.nio.file.Paths.get(pinnedDir), stage)
        case None => wh.carryPreviousInto(table, stage)
      }
      if (nKeys > 0) {
        // a carried zone-map manifest turns STALE here regardless (this
        // commit adds data files the census never saw), and its `rows`
        // would overcount the deleted keys — drop it; the next cluster
        // (which folds first) rebuilds
        val zm = stage.resolve("_zonemap")
        if (java.nio.file.Files.isDirectory(zm))
          Tables.deleteRecursively(zm)
        java.nio.file.Files.write(sidecarDir.resolve("census.txt"),
          census.sorted.mkString("\n").getBytes("UTF-8"))
        // key signature: pin the frame's identity columns at write time
        // (see EqDeletes.Sidecar.storedKeyCols)
        java.nio.file.Files.write(
          sidecarDir.resolve(EqDeletes.KeyColsFile),
          keyCols.mkString("\n").getBytes("UTF-8"))
      } else {
        // pure-insert delta (a MERGE with only NOT MATCHED rows): a
        // plain fast append, no sidecar
        Tables.deleteRecursively(sidecarDir)
        val eq = stage.resolve(EqDeletes.Dir)
        val empty = {
          val s = java.nio.file.Files.list(eq)
          try !s.iterator().hasNext finally s.close()
        }
        if (empty) java.nio.file.Files.delete(eq)
      }
      branch match {
        // write-audit-publish routing: the delta commits as the
        // branch's new head; main's pointer never moves
        case Some((b, expectHead)) =>
          wh.publishStageToBranch(table, stage, b, expectHead)
        case None =>
          wh.publishStage(table, stage, expected, legacyMoved)
      }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      if (stage != null) wh.discardStage(stage)
  }
}

private case class MorDeltaCommit(dataFile: Option[String],
    keyFile: Option[String], deletedKeys: Long, nullKeyDeletes: Long)
  extends WriterCommitMessage

/** Per-task delta writer: INSERT/REINSERT rows stream into one LAZILY
  * opened parquet file in the stage; DELETE row-ids into one lazily
  * opened file under the staged sidecar's `keys.parquet/`. Lazy because
  * a delta plan routinely runs tasks that touch nothing — an eager open
  * would litter every commit with empty footers.
  */
private class MorDeltaWriterFactory(stageDir: String, keysDir: String,
    rowSchema: StructType, keySchema: StructType,
    rowFactory: OutputWriterFactory, rowConf: SerializableHadoopConf,
    keyFactory: OutputWriterFactory, keyConf: SerializableHadoopConf)
  extends DeltaWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] = {
    val dataName = f"part-$partitionId%05d-$taskId-${UUID.randomUUID()}.parquet"
    val keyName = f"keys-$partitionId%05d-$taskId-${UUID.randomUUID()}.parquet"
    new DeltaWriter[InternalRow] {
      private var dataWriter: org.apache.spark.sql.execution.datasources.OutputWriter = _
      private var keyWriter: org.apache.spark.sql.execution.datasources.OutputWriter = _
      private var deleted = 0L
      private var nullDeletes = 0L
      // the projections Spark hands over are VIEWS over the input row —
      // consumed immediately by the parquet writers, never retained
      private def ctx(kind: String) = new TaskAttemptContextImpl(
        (if (kind == "row") rowConf else keyConf).value,
        new TaskAttemptID(s"graft-delta-$kind", 0, TaskType.MAP,
          partitionId, (taskId % Int.MaxValue).toInt))

      override def insert(row: InternalRow): Unit = {
        if (dataWriter == null)
          dataWriter = rowFactory.newInstance(
            s"$stageDir/$dataName", rowSchema, ctx("row"))
        dataWriter.write(row)
      }
      override def reinsert(metadata: InternalRow, row: InternalRow): Unit =
        insert(row)
      override def delete(metadata: InternalRow, id: InternalRow): Unit = {
        // ANY null component disqualifies the row id (SQL equality on
        // the sidecar could never re-match it)
        if (keySchema.indices.exists(id.isNullAt)) { nullDeletes += 1; return }
        if (keyWriter == null)
          keyWriter = keyFactory.newInstance(
            s"$keysDir/$keyName", keySchema, ctx("key"))
        keyWriter.write(id)
        deleted += 1
      }
      override def update(metadata: InternalRow, id: InternalRow,
          row: InternalRow): Unit =
        throw new IllegalStateException(
          "updates split into delete+reinsert (representUpdateAsDeleteAndInsert)")

      override def commit(): WriterCommitMessage = {
        if (dataWriter != null) dataWriter.close()
        if (keyWriter != null) keyWriter.close()
        MorDeltaCommit(Option(dataWriter).map(_ => dataName),
          Option(keyWriter).map(_ => keyName), deleted, nullDeletes)
      }
      override def abort(): Unit = {
        if (dataWriter != null) dataWriter.close()
        if (keyWriter != null) keyWriter.close()
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(stageDir, dataName))
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(keysDir, keyName))
      }
      override def close(): Unit = ()
    }
  }
}
