package graft.plans

import org.apache.spark.sql.SparkSession

import graft.PipelineSpec
import graft.operators.Cdc
import graft.sources.{CatalogClient, Tables, WarehouseCatalog}
import graft.sources.Tables.Warehouse

/** Control-plane orchestration: replicate the reference's per-prefix bootstrap
  * loop (batch_bootstrapper.py:49-94) — in order:
  *   1. bootstrap changelog table (auto-load, excluding `**&#47;LOAD*`)  :59-71
  *   2. wire changelog -> mirror dependency                              :72
  *   3. bootstrap mirror table (one-time load, excluding `**&#47;*-*`)   :75-87
  *   4. configure the CDC merge (key/ts columns)                         :88
  * with per-target fault isolation (:91-94): one failing target is logged and
  * skipped, the loop continues.
  */
object Bootstrapper {

  final case class Result(spec: PipelineSpec, createdChangelog: Boolean,
                          createdMirror: Boolean, error: Option[Throwable])

  /** Persist the CDC wiring as durable table properties — the reference's
    * `update_changelog_table` / `update_mirror_table` commits
    * (tabular.py:66-75): the mirror carries the merge parameterization, the
    * changelog declares its dependent mirror. Idempotent (overwrite).
    * Property commits go through the [[CatalogClient]] seam (REST catalog
    * at scale, warehouse metadata files offline).
    */
  def writeCdcProperties(wh: Warehouse, spec: PipelineSpec,
      catalog: Option[CatalogClient] = None): Unit = {
    val cat = catalog.getOrElse(new WarehouseCatalog(wh))
    writeMergeConfig(cat, spec)
    writeChangelogWiring(cat, spec)
  }

  /** changelog -> mirror dependency (the reference's
    * `update_changelog_table`, tabular.py:72-75 via batch_bootstrapper:72).
    */
  def writeChangelogWiring(cat: CatalogClient, spec: PipelineSpec): Unit =
    cat.setProperties(spec.changelogTable, Map(
      "dependent-tables" -> spec.mirrorTable))

  /** CDC merge parameterization on the mirror (the reference's
    * `update_mirror_table`, tabular.py:58-70 via batch_bootstrapper:88).
    */
  def writeMergeConfig(cat: CatalogClient, spec: PipelineSpec): Unit =
    cat.setProperties(spec.mirrorTable, Map(
      "etl.job-type" -> "cdc",
      "cdc.type" -> "DMS",
      "cdc.ts-column" -> spec.cdc.tsCol,
      "cdc.key-column" -> spec.cdc.keyCol))

  /** Read the merge parameterization back from the mirror's stored
    * properties (None when the table was never configured).
    */
  def readCdcConfig(wh: Warehouse, mirrorTable: String,
      catalog: Option[CatalogClient] = None): Option[graft.CdcConfig] = {
    val p = catalog.getOrElse(new WarehouseCatalog(wh)).properties(mirrorTable)
    for (k <- p.get("cdc.key-column"); t <- p.get("cdc.ts-column"))
      yield graft.CdcConfig(k, t)
  }

  /** Mirror initial load only (the reference's second bootstrap_table call,
    * batch_bootstrapper.py:75-87): if the mirror doesn't exist and the
    * prefix holds non-changelog files (DMS LOAD* full loads — everything
    * NOT matching the mirror exclusion glob), load them as the mirror's
    * starting state. Returns true if the mirror was created. Used by the
    * streaming pipeline before the changelog stream starts; initial-load
    * rows carry no CDC envelope and lose to any subsequent change
    * (null-ts alignment in Cdc.applyBatch).
    */
  def bootstrapMirrorInitialLoad(
      spark: SparkSession, wh: Warehouse, spec: PipelineSpec): Boolean = {
    if (wh.exists(spec.mirrorTable)) return false
    // format-aware: a csv/json pipeline's LOAD* files are csv/json too —
    // a parquet read here would throw and take the whole target (including
    // its stream) down with it
    val initialFiles = Tables.listFilesExcluding(
      spec.sourcePath, Some(spec.mirrorExcludeGlob),
      extension = Some(spec.format))
    Tables.readFilesAs(spark, spec.format, initialFiles) match {
      case Some(df) => wh.overwrite(Cdc.withIngestSeq(df), spec.mirrorTable); true
      case None => false
    }
  }

  /** Bootstrap a single source prefix. Idempotent: a second run is a no-op
    * for tables that already exist (tabular.py:91-99). Existence probes and
    * property commits route through `catalog` ([[WarehouseCatalog]] by
    * default); data writes stay on the warehouse.
    */
  def bootstrap(spark: SparkSession, wh: Warehouse, spec: PipelineSpec,
      catalog: Option[CatalogClient] = None): Result = {
    val cat = catalog.getOrElse(new WarehouseCatalog(wh))
    try {
      // 1. changelog: load all non-initial-load files (the managed file
      //    loader's CREATE_AUTO_LOAD mode, tabular.py:128; continuous ingest
      //    is CdcStream's job). Stamped with the ingest seq so the batch
      //    and streaming paths write the SAME changelog schema — a mixed
      //    with/without-seq directory would read footer-dependently.
      val createdChangelog =
        if (cat.tableExists(spec.changelogTable)) false // tabular.py:93-99
        else {
          val created = Tables.bootstrapTable(
            spark, wh, spec.changelogTable, spec.sourcePath,
            spec.changelogExcludeGlob, load = true,
            transform = Cdc.withIngestSeq, format = spec.format)
          // registration carries the as-written schema (one footer read)
          if (created) cat.tableCreated(spec.changelogTable,
            wh.read(spark, spec.changelogTable).schema)
          created
        }

      // 2. dependency wiring (tabular.py:72-75 via batch_bootstrapper:72):
      //    AFTER the changelog exists — a strict (REST) catalog rejects
      //    property commits on tables it has never seen.
      if (createdChangelog || cat.tableExists(spec.changelogTable))
        writeChangelogWiring(cat, spec)

      // 3. mirror: initial load from non-changelog files (CREATE_LOAD mode)
      //    if any exist, else materialize from the changelog via the CDC fold.
      val createdMirror =
        if (cat.tableExists(spec.mirrorTable)) false
        else {
          val initialFiles = Tables.listFilesExcluding(
            spec.sourcePath, Some(spec.mirrorExcludeGlob),
            extension = Some(spec.format))
          val created = Tables.readFilesAs(spark, spec.format, initialFiles) match {
            case Some(df) =>
              wh.overwrite(Cdc.withIngestSeq(df), spec.mirrorTable); true
            case None if cat.tableExists(spec.changelogTable) =>
              // batch subdirs may straddle a schema evolution - merge footers
              val changelog = wh.read(spark, spec.changelogTable, mergeSchema = true)
              // stored form retains delete tombstones (T2 across late batches)
              wh.overwrite(Cdc.fold(changelog, spec.cdc), spec.mirrorTable)
              true
            case None => false
          }
          if (created) cat.tableCreated(spec.mirrorTable,
            wh.read(spark, spec.mirrorTable).schema)
          created
        }

      // 4. CDC merge configuration (batch_bootstrapper:88) — after the
      //    mirror exists, same strict-catalog rule as step 2.
      if (createdMirror || cat.tableExists(spec.mirrorTable))
        writeMergeConfig(cat, spec)
      Result(spec, createdChangelog, createdMirror, None)
    } catch {
      case e: Exception => Result(spec, createdChangelog = false,
        createdMirror = false, error = Some(e))
    }
  }

  /** The main loop over all monitored prefixes (batch_bootstrapper.py:49).
    * Per-target try/continue keeps one bad prefix from halting the rest (T5).
    */
  def run(spark: SparkSession, wh: Warehouse, specs: Seq[PipelineSpec],
      catalog: Option[CatalogClient] = None): Seq[Result] =
    specs.map { spec =>
      val r = bootstrap(spark, wh, spec, catalog)
      r.error.foreach(e => System.err.println(
        s"[bootstrap] target '${spec.sourcePath}' failed, skipping: ${e.getMessage}"))
      r
    }
}
