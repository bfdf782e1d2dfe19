package graft

import org.apache.spark.sql.SparkSession

import graft.plans.{Maintenance, MorMirror, PartitionedMirror}
import graft.sources.Tables.{TableProps, Warehouse}

/** CLI entry point for the SCHEDULED MAINTENANCE role — the second
  * process of the deployment shape this engine's commit protocol exists
  * for (ingest JVM + maintenance JVM sharing one warehouse, the split
  * the reference gets from Tabular's managed background services:
  * compaction, snapshot expiry, orphan cleanup). Runs, per table:
  *
  *  1. compaction ([[Maintenance.compact]] — MOR delta fold or flat/
  *     bucketed file-count rewrite; optimistic conflict retry against a
  *     live ingest stream is built in),
  *  2. tombstone expiry when a lateness horizon is configured
  *     (`GRAFT_TOMBSTONE_HORIZON` + the table's recorded cdc ts column),
  *  3. orphan-file GC ([[Maintenance.removeOrphans]], age-guarded).
  *
  * A flat table with a DECLARED clustering ([[Maintenance.declareClustering]])
  * gets the sort-order rewrite + zone-map manifest instead of plain
  * compaction, guarded by manifest freshness (a fresh census skips the
  * rewrite; any interim commit staling it is exactly when re-clustering
  * pays). A tombstone expiry on the same tick rewrites after the
  * cluster and stales the manifest until the next tick — reads stay
  * correct through the ZoneMap census fallback, by design.
  *
  * Usage: MaintenanceMain <warehouseDir> [table ...]
  * (no tables listed = every data table in the warehouse — `_`-prefixed
  * entries such as `_checkpoints`/`_metadata` are infrastructure, not
  * tables, and are excluded; every included table's layout
  * self-describes, so maintenance needs no per-table config).
  * Exits non-zero when any table's maintenance failed.
  * Env: GRAFT_COMPACT_TARGET_FILES (set = pin a file count; unset =
  *        size-targeted bin-packing, the 100 TB-correct default — the
  *        count derives from data volume),
  *      GRAFT_COMPACT_TARGET_BYTES (default 512 MB, the bin-pack grain),
  *      GRAFT_TOMBSTONE_HORIZON (no default — expiry skipped unless set),
  *      GRAFT_ORPHAN_AGE_MS (default 24h).
  */
object MaintenanceMain {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MaintenanceMain <warehouseDir> [table ...]")
    val wh = Warehouse(args(0))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .appName("graft-maintenance")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val tables = if (args.length > 1) args.drop(1).toSeq else discover(wh)
    // explicit GRAFT_COMPACT_TARGET_FILES pins a count (the pre-20
    // behavior every drill sets); unset → size-targeted bin-packing
    val pinnedFiles = sys.env.get("GRAFT_COMPACT_TARGET_FILES").map(_.toInt)
    val failed = run(spark, wh, tables,
      targetFiles = pinnedFiles.getOrElse(8),
      tombstoneHorizon = sys.env.get("GRAFT_TOMBSTONE_HORIZON"),
      orphanAgeMs = sys.env.get("GRAFT_ORPHAN_AGE_MS").map(_.toLong)
        .getOrElse(24L * 3600 * 1000),
      targetBytes =
        if (pinnedFiles.isDefined) None
        else Some(sys.env.get("GRAFT_COMPACT_TARGET_BYTES").map(_.toLong)
          .getOrElse(Maintenance.DefaultTargetBytes)))
    spark.stop()
    // a scheduled job must not report success when tables failed — the
    // orchestrator's alert is the operator's only signal
    if (failed.nonEmpty) sys.exit(1)
  }

  /** Data tables under the warehouse root: directories and version
    * pointers, excluding checkpoints/metadata and version/stage dirs
    * themselves (the per-table maintenance reaches into those).
    */
  def discover(wh: Warehouse): Seq[String] = {
    val root = java.nio.file.Paths.get(wh.root)
    if (!java.nio.file.Files.isDirectory(root)) return Seq.empty
    val s = java.nio.file.Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filterNot(_.startsWith("_"))
        .filterNot(_.startsWith("."))
        // `.vN` version dirs plus their machinery siblings: `.vN.stage`
        // allocation markers and transient `.vN.discardM` trash dirs
        .filterNot(_.matches(".*\\.v\\d+(\\..*)?$"))
        .filterNot(_.matches(".*\\.(ptr\\d+|commitlock|morstage)(\\..*)?$"))
        // transient per-epoch staging (streaming epochs, object-store
        // appendBatch commits) is machinery, not a table
        .filterNot(_.matches(".*\\.(streamepoch|epochstage)_.*"))
        .toSeq.sorted
    } finally s.close()
  }

  /** Separated from session lifecycle so tools can drive the shipped
    * path. Per-table fault isolation, same contract as the pipeline.
    * @return the tables whose maintenance FAILED (empty = all clean)
    */
  def run(spark: SparkSession, wh: Warehouse, tables: Seq[String],
      targetFiles: Int, tombstoneHorizon: Option[String],
      orphanAgeMs: Long, targetBytes: Option[Long] = None): Seq[String] = {
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    tables.foreach { table =>
      try {
        // a changelog-feed VIEW table's per-hop batch subdirs ARE its
        // consumer contract (maintainAggregate reads batch_<version>
        // directly) — compacting it would break every feed consumer, so
        // maintenance leaves it alone (its rows are delta-sized anyway)
        if (TableProps.read(wh, table).contains("changelog.last-version")) {
          // never compacted — but consumed-and-aged hops are sweepable
          // once every REGISTERED consumer is past them (cursor-aware
          // retention; unconsumed hops always survive)
          val expired = graft.plans.MirrorChangelog.expireConsumedHops(
            wh, table, orphanAgeMs)
          println(s"[maintenance] table=$table layout=feed compacted=false " +
            s"hops_expired=${expired.size}")
        } else {
        val layout =
          if (MorMirror.storedConfig(wh, table).isDefined) "mor"
          else if (PartitionedMirror.storedBuckets(wh, table).isDefined) "cow"
          else "flat"
        // a MATERIALIZED PROJECTION refreshes from its declared source
        // (stamp-guarded: an idle source costs two metadata reads) —
        // this takes precedence over the plain re-cluster below, which
        // would refresh the LAYOUT but not the content
        val projSource = TableProps.read(wh, table)
          .get(Maintenance.ProjectionSourceProp)
        val declaredProj =
          if (projSource.isDefined) Maintenance.declaredClustering(wh, table)
          else None
        if (declaredProj.isDefined) {
          val (dims, bloomKeys, declaredFiles) = declaredProj.get
          // honor the creator's declared column projection — refreshing
          // with all source columns would silently widen the schema
          val declaredCols = TableProps.read(wh, table)
            .get(Maintenance.ProjectionColsProp)
            .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
          val refreshed = Maintenance.materializeProjection(spark, wh,
            projSource.get, table, dims, bloomKeys,
            declaredFiles.getOrElse(targetFiles), cols = declaredCols)
          val swept = Maintenance.removeOrphans(wh, table, orphanAgeMs)
          println(s"[maintenance] table=$table layout=projection " +
            s"source=${projSource.get} refreshed=$refreshed " +
            s"orphans_swept=${swept.size}")
        } else {
        // a flat table may DECLARE a clustering layout
        // (Maintenance.declareClustering); maintenance then keeps the
        // sort-order rewrite + zone-map manifest fresh INSTEAD of plain
        // compaction (clustering subsumes it: same targetFiles rewrite)
        val declared =
          if (layout == "flat") Maintenance.declaredClustering(wh, table) else None
        // skip the full rewrite when the table is already within the
        // file-count budget (MOR's own compact no-ops on an empty delta
        // set; the flat/COW rewrite had no such guard — at scale an
        // unconditional rewrite is a full-warehouse pass per cron tick).
        // For a declared-clustered table the guard is manifest freshness:
        // a writer that committed since the last rewrite leaves a stale
        // census, which is exactly when re-clustering pays
        val needsCompact = declared match {
          case Some(_) =>
            !graft.plans.ZoneMap.isFresh(spark, wh.snapshotPath(table))
          // size-targeted mode self-guards (compactToSize no-ops on an
          // already-packed layout without a new version) — the file-
          // count gate only applies to an explicitly pinned count
          case None => layout == "mor" || targetBytes.isDefined ||
            Maintenance.dataFiles(spark, wh, table).size > targetFiles
        }
        // pending equality-delete sidecars past the declared fold
        // budget fold on their OWN trigger: the freshness/file-count
        // guards above say nothing about read debt (a pure delete
        // changes no file names, so the manifest stays "fresh" while
        // every affected-file read stacks another per-row probe chain)
        val props = TableProps.read(wh, table)
        val foldEvery = props.get(graft.sources.EqDeletes.FoldEveryProp)
          .map(_.toInt).getOrElse(graft.sources.EqDeletes.DefaultFoldEvery)
        val pendingDeletes =
          if (graft.sources.EqDeletes.morEnabled(props))
            graft.sources.EqDeletes.pending(wh.snapshotPath(table)).size +
              graft.sources.PosDeletes.pending(wh.snapshotPath(table)).size
          else 0
        val foldedNow = pendingDeletes >= foldEvery && foldEvery > 0 &&
          graft.sources.EqDeletes.fold(spark, wh, table)
        var clusterMode = "none"
        if (needsCompact) declared match {
          case Some((dims, bloomKeys, declaredFiles)) =>
            // churn-proportional first: a census stale only from APPENDED
            // files rewrites just the disordered region; anything the
            // incremental path declines falls through to the full rewrite
            clusterMode =
              if (Maintenance.clusterIncremental(spark, wh, table, dims,
                  bloomKeys)) "incremental"
              else {
                Maintenance.cluster(spark, wh, table, dims,
                  declaredFiles.getOrElse(targetFiles), bloomKeys = bloomKeys)
                "full"
              }
          case None => targetBytes match {
            case Some(tb) =>
              clusterMode =
                if (Maintenance.compactToSize(spark, wh, table, tb))
                  "binpack"
                else "packed" // already at grain — no new version
            case None => Maintenance.compact(spark, wh, table, targetFiles)
          }
        }
        // tombstone expiry needs the table's CDC config: MOR self-
        // describes (nested props); flat/COW tables record it in the
        // reference-style cdc.* props when bootstrapped — absent either,
        // the table has no CDC semantics and expiry is skipped
        val cfg = MorMirror.storedConfig(wh, table).map(_._1).orElse {
          val p = TableProps.read(wh, table)
          for (k <- p.get("cdc.key-column"); t <- p.get("cdc.ts-column"))
            yield CdcConfig(k, t)
        }
        (tombstoneHorizon, cfg) match {
          case (Some(h), Some(c)) =>
            Maintenance.expireTombstones(spark, wh, table, c, h)
          case _ => ()
        }
        val swept = Maintenance.removeOrphans(wh, table, orphanAgeMs)
        println(s"[maintenance] table=$table layout=$layout " +
          s"${if (declared.isDefined) "clustered" else "compacted"}=$needsCompact " +
          (if ((declared.isDefined || targetBytes.isDefined) && needsCompact)
            s"mode=$clusterMode " else "") +
          (if (pendingDeletes > 0 || foldedNow)
            s"sidecars_folded=$foldedNow (pending=$pendingDeletes/$foldEvery) "
          else "") +
          s"expired=${tombstoneHorizon.isDefined && cfg.isDefined} " +
          s"orphans_swept=${swept.size}")
        }
        }
      } catch {
        case e: Exception =>
          failed += table
          System.err.println(
            s"[maintenance] table '$table' FAILED: ${e.getMessage}")
      }
    }
    failed.toSeq
  }
}
