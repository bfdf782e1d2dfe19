package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Cdc
import graft.sources.Tables.Warehouse
import graft.streaming.CdcStream

/** CLI entry point — the engine's equivalent of the reference's
  * `batch_bootstrapper.main()` (batch_bootstrapper.py:34-94): for each source
  * prefix, bootstrap the (changelog, mirror) pair and drain available files
  * through the streaming CDC path.
  *
  * Usage: PipelineMain <warehouseDir> <keyCol> <tsCol> <sourceDir> [sourceDir ...]
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    // CLI args, or the reference-style env config when invoked bare
    // (GRAFT_WAREHOUSE_DIR / GRAFT_CDC_KEY / GRAFT_CDC_TS / GRAFT_SOURCES)
    val config =
      if (args.isEmpty) PipelineConfig.fromEnv()
      else {
        require(args.length >= 4,
          "usage: PipelineMain <warehouseDir> <keyCol> <tsCol> <sourceDir> [sourceDir ...]")
        // mirror layout + catalog stay environment-shaped even when the
        // source paths come from argv (the reference's TABULAR_* pattern)
        PipelineConfig(args(0), CdcConfig(args(1), args(2)), args.drop(3).toSeq,
          mirrorBuckets = PipelineConfig.mirrorBucketsFromEnv(),
          catalog = PipelineConfig.catalogFromEnv(),
          mirrorMor = PipelineConfig.mirrorMorFromEnv(),
          changelogTimePartition =
            PipelineConfig.changelogTimePartitionFromEnv(),
          changelogTimeGranularity =
            PipelineConfig.changelogTimeGranularityFromEnv())
      }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .appName("graft-cdc-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, config)
    spark.stop()
  }

  /** The per-source control loop, separated from session lifecycle so the
    * spec suite can drive the SHIPPED entry-point path (not a test-only
    * twin) against a stub REST catalog.
    */
  def run(spark: SparkSession, config: PipelineConfig): Unit = {
    val whDir = config.warehouseDir
    val sources = config.sources
    val wh = Warehouse(whDir)
    val cdc = config.cdc
    // control-plane seam: REST catalog (OAuth2 client-credentials) when
    // configured, offline warehouse catalog otherwise
    val catalog: Option[graft.sources.CatalogClient] =
      config.catalog.map { case (url, ns, cred) =>
        new graft.sources.RestCatalogClient(url, ns, cred)
      }
    // per-target fault isolation, same contract as batch_bootstrapper.py:91-94
    sources.foreach { src =>
      try {
        val spec = PipelineSpec.forPrefix(src, cdc)
        println(s"[pipeline] target=$src changelog=${spec.changelogTable} mirror=${spec.mirrorTable}")
        // the reference's second bootstrap_table call: initial-load (LOAD*)
        // files seed the mirror before the change stream starts
        val seeded = graft.plans.Bootstrapper.bootstrapMirrorInitialLoad(spark, wh, spec)
        if (seeded) println(s"[pipeline] mirror=${spec.mirrorTable} seeded from initial-load files")
        val q = CdcStream.start(spark, wh, spec,
          s"$whDir/_checkpoints/${spec.mirrorTable}",
          mirrorBuckets = config.mirrorBuckets,
          mirrorMor = config.mirrorMor,
          changelogTimePartition = config.changelogTimePartition,
          changelogTimeGranularity = config.changelogTimeGranularity)
        q.awaitTermination()
        // Catalog registration AFTER data exists: registering first would
        // let a crash-before-ingest leave catalog entries for empty tables,
        // and a later Bootstrapper run (which trusts the catalog's
        // existence probe, like the reference) would skip materializing
        // them entirely. Registration is idempotent (409-tolerated);
        // property commits follow registration so a strict catalog
        // accepts them.
        val cat = catalog.getOrElse(new graft.sources.WarehouseCatalog(wh))
        // Register with the REAL materialized schema — the data exists at
        // this point (registration deliberately happens after ingest), so
        // external readers resolving through the catalog see the actual
        // columns, not an empty field list.
        if (wh.exists(spec.changelogTable)) {
          // mergeSchema: the changelog's batch subdirs may straddle an
          // upstream schema evolution — a single-footer read would
          // register whichever batch's shape it sampled and the catalog
          // would never see the widened column
          catalog.foreach(_.tableCreated(spec.changelogTable,
            wh.read(spark, spec.changelogTable, mergeSchema = true).schema))
          graft.plans.Bootstrapper.writeChangelogWiring(cat, spec)
        }
        if (wh.exists(spec.mirrorTable)) {
          catalog.foreach(_.tableCreated(spec.mirrorTable,
            wh.read(spark, spec.mirrorTable).schema))
          graft.plans.Bootstrapper.writeMergeConfig(cat, spec)
        }
        // the STORED layout decides how to read (config may lag a table
        // created under a different layout — the stored-wins rule)
        val state =
          if (graft.plans.PartitionedMirror.storedBuckets(wh, spec.mirrorTable).isDefined)
            graft.plans.PartitionedMirror.read(spark, wh, spec.mirrorTable)
          else if (graft.plans.MorMirror.storedConfig(wh, spec.mirrorTable).isDefined)
            graft.plans.MorMirror.read(spark, wh, spec.mirrorTable)
          else Cdc.currentState(wh.read(spark, spec.mirrorTable))
        println(s"[pipeline] mirror=${spec.mirrorTable} rows=${state.count()}")
      } catch {
        case e: Exception =>
          System.err.println(s"[pipeline] target '$src' failed, skipping: ${e.getMessage}")
      }
    }
  }
}
