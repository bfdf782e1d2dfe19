package graft

/** Core configuration model.
  *
  * Mirrors the reference's declarative table properties so the semantics stay
  * traceable to `/root/reference/batch-bootstrapper/tabular.py:58-64,75`:
  *   - `cdc.key-column`   -> [[CdcConfig.keyCol]]
  *   - `cdc.ts-column`    -> [[CdcConfig.tsCol]]
  *   - `cdc.type=DMS`     -> the I/U/D op encoding in [[DmsEnvelope]]
  *   - `dependent-tables` -> [[PipelineSpec.mirrorTable]]
  */

/** CDC merge parameterization (reference: tabular.py:39-64).
  *
  * @param keyCol  unique row identity ("tells tabular whether to update or
  *                insert a row", tabular.py:44-45)
  * @param tsCol   ordering column: latest value per key wins
  *                (tabular.py:47-49). ISO-8601 strings sort lexicographically;
  *                numeric sequence columns (prod default `transact_seq`,
  *                batch_bootstrapper.py:21) sort numerically.
  */
final case class CdcConfig(keyCol: String, tsCol: String) {
  require(keyCol.nonEmpty, "cdc.key-column must be a non-empty string")
  require(tsCol.nonEmpty, "cdc.ts-column must be a non-empty string")
  /** COMPOSITE keys (round 17): `cdc.key-column = a,b` declares a
    * multi-column row identity — Iceberg's identifier FIELDS are a
    * list, and compound-PK source tables (the common DMS junction/fact
    * shape) need the mirror keyed on the full tuple. `keyCol` stays the
    * stored property value; every fold/bucket/join consumer keys on
    * [[keyCols]]. Single-column configs are unchanged (`keyCols.head ==
    * keyCol`), so existing layouts keep their bucket mapping.
    */
  def keyCols: Seq[String] = CdcConfig.parseKeyCols(keyCol)
}

object CdcConfig {
  /** THE parser of the `cdc.key-column` comma list — every surface that
    * accepts the property value (the fold, the equality-delete DML, the
    * changelog diff) parses through here so the syntax can never
    * diverge.
    */
  def parseKeyCols(declared: String): Seq[String] = {
    val ks = declared.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    require(ks.nonEmpty, "cdc.key-column must name at least one column")
    ks
  }
}

/** The DMS changelog envelope columns appended to every change record
  * (reference: generate_sample_dms_parquet.py:20-24).
  */
object DmsEnvelope {
  val SourceTableCol = "table"
  val OpCol = "op"
  val TsCol = "ts"
  val Insert = "I"
  val Update = "U"
  val Delete = "D"
  /** Envelope columns dropped when materializing the mirror's user-facing
    * state. `ts` is retained internally for cross-batch latest-wins (T2).
    */
  val envelopeCols: Seq[String] = Seq(SourceTableCol, OpCol)
}

/** One monitored source prefix -> (changelog, mirror) pair
  * (reference: batch_bootstrapper.py:49-88).
  *
  * @param sourcePath      the monitored directory (S3 prefix in the reference)
  * @param changelogTable  append-only change stream table  (`{name}_changelog`)
  * @param mirrorTable     upserted current-state table     (`{name}`)
  * @param changelogExcludeGlob files excluded from the changelog load
  *                             (`**&#47;LOAD*` — DMS initial-load files,
  *                             batch_bootstrapper.py:69)
  * @param mirrorExcludeGlob    files excluded from the mirror initial load
  *                             (`**&#47;*-*` — changelog files,
  *                             batch_bootstrapper.py:85)
  */
final case class PipelineSpec(
    sourcePath: String,
    changelogTable: String,
    mirrorTable: String,
    cdc: CdcConfig,
    changelogExcludeGlob: String = "**/LOAD*",
    mirrorExcludeGlob: String = "**/*-*",
    autoLoad: Boolean = true,
    /** Source file format — the reference's `fileLoaderConfig.fileFormat`
      * (tabular.py:136, 'parquet' in the reference; DMS also emits csv/json
      * change files, so the loader accepts all three).
      */
    format: String = "parquet") {
  require(Set("parquet", "json", "csv").contains(format),
    s"unsupported source format '$format' (parquet|json|csv)")
}

object PipelineSpec {
  /** Derive table names from a source path the way the reference does
    * (batch_bootstrapper.py:55-56): mirror = last path segment,
    * changelog = `{mirror}_changelog`.
    */
  def forPrefix(sourcePath: String, cdc: CdcConfig): PipelineSpec = {
    val mirror = sourcePath.stripSuffix("/").split('/').last
    PipelineSpec(sourcePath, s"${mirror}_changelog", mirror, cdc)
  }
}

/** Environment-driven pipeline configuration — the engine's analog of the
  * reference's env/config block (batch_bootstrapper.py:10-27: catalog
  * coordinates, key/ts columns, monitored URI list).
  *
  * @param warehouseDir warehouse root (GRAFT_WAREHOUSE_DIR)
  * @param cdc          key/ts columns (GRAFT_CDC_KEY / GRAFT_CDC_TS;
  *                     defaults mirror the reference's production values
  *                     `id`/`transact_seq`, batch_bootstrapper.py:20-21)
  * @param sources      monitored prefixes (GRAFT_SOURCES, comma-separated —
  *                     the reference's S3_URIS list, batch_bootstrapper.py:24-27)
  * @param mirrorBuckets optional key-hash bucket count for the partitioned
  *                      mirror layout (GRAFT_MIRROR_BUCKETS; absent = flat
  *                      mirror, the reference-faithful default)
  * @param catalog      optional REST catalog endpoint: (baseUrl, namespace,
  *                     credential) from GRAFT_CATALOG_URL /
  *                     GRAFT_CATALOG_NAMESPACE / GRAFT_CATALOG_CREDENTIAL —
  *                     the reference's TABULAR_BASE_URL + TABULAR_CREDENTIAL
  *                     surface (batch_bootstrapper.py:21-23,42-47); absent =
  *                     offline warehouse catalog
  */
final case class PipelineConfig(
    warehouseDir: String, cdc: CdcConfig, sources: Seq[String],
    mirrorBuckets: Option[Int] = None,
    catalog: Option[(String, String, String)] = None,
    /** Merge-on-read mirror commits (GRAFT_MIRROR_MOR=true) — requires
      * `mirrorBuckets`; the stored layout wins over the flag (see
      * [[graft.streaming.CdcStream.start]]).
      */
    mirrorMor: Boolean = false,
    /** Hidden time partitioning for the changelog
      * (GRAFT_CHANGELOG_TIME_PARTITION=true): batches land as
      * `p_day=<date>` day partitions derived from the CDC ts column — the
      * Iceberg `days(ts)` transform, so time-bounded replays and
      * tombstone expiry prune whole days. Only meaningful when the ts
      * column is a timestamp/date/ISO-string (a numeric sequence column
      * derives no date).
      */
    changelogTimePartition: Boolean = false,
    /** Granularity of the hidden time layout
      * (GRAFT_CHANGELOG_TIME_GRANULARITY=day|hour|month, default day) —
      * only read when `changelogTimePartition` is on. Hour grain is for
      * HIGH-RATE feeds (the Iceberg hours() transform); a later
      * day->hour flip is spec evolution, not a restart
      * ([[graft.sources.Tables.Warehouse.evolveTimeGranularity]]).
      */
    changelogTimeGranularity: String = "day")

object PipelineConfig {
  def fromEnv(env: Map[String, String] = sys.env): PipelineConfig = {
    def need(k: String) = env.getOrElse(k,
      throw new IllegalArgumentException(s"missing required env var $k"))
    PipelineConfig(
      warehouseDir = need("GRAFT_WAREHOUSE_DIR"),
      cdc = CdcConfig(
        env.getOrElse("GRAFT_CDC_KEY", "id"),
        env.getOrElse("GRAFT_CDC_TS", "transact_seq")),
      sources = need("GRAFT_SOURCES").split(',').map(_.trim).filter(_.nonEmpty).toSeq,
      mirrorBuckets = mirrorBucketsFromEnv(env),
      catalog = catalogFromEnv(env),
      mirrorMor = mirrorMorFromEnv(env),
      changelogTimePartition = changelogTimePartitionFromEnv(env),
      changelogTimeGranularity = changelogTimeGranularityFromEnv(env))
  }

  /** GRAFT_CHANGELOG_TIME_PARTITION — hidden day partitioning of the
    * changelog on the CDC ts column.
    */
  def changelogTimePartitionFromEnv(
      env: Map[String, String] = sys.env): Boolean =
    env.get("GRAFT_CHANGELOG_TIME_PARTITION").exists(_.toBoolean)

  /** GRAFT_CHANGELOG_TIME_GRANULARITY — day (default) / hour / month. */
  def changelogTimeGranularityFromEnv(
      env: Map[String, String] = sys.env): String =
    env.getOrElse("GRAFT_CHANGELOG_TIME_GRANULARITY", "day")

  /** GRAFT_MIRROR_BUCKETS — shared by [[fromEnv]] and the CLI-args entry
    * path (layout config is environment-shaped like the catalog's).
    */
  def mirrorBucketsFromEnv(env: Map[String, String] = sys.env): Option[Int] =
    env.get("GRAFT_MIRROR_BUCKETS").map { v =>
      val n = v.toInt
      require(n > 0, s"GRAFT_MIRROR_BUCKETS must be positive, got $v")
      n
    }

  /** GRAFT_MIRROR_MOR — merge-on-read sink mode. */
  def mirrorMorFromEnv(env: Map[String, String] = sys.env): Boolean =
    env.get("GRAFT_MIRROR_MOR").exists(_.toBoolean)

  /** REST-catalog coordinates from the environment, shared by [[fromEnv]]
    * and the CLI-args entry path: like the reference (TABULAR_BASE_URL +
    * TABULAR_CREDENTIAL, batch_bootstrapper.py:21-23), catalog endpoint
    * and credentials are environment-shaped even when source paths come
    * from argv — so `PipelineMain <wh> <key> <ts> <src>` with
    * GRAFT_CATALOG_URL set still talks to the remote catalog.
    */
  def catalogFromEnv(env: Map[String, String] = sys.env)
      : Option[(String, String, String)] =
    env.get("GRAFT_CATALOG_URL").map { url =>
      (url,
        env.getOrElse("GRAFT_CATALOG_NAMESPACE", "default"),
        env.getOrElse("GRAFT_CATALOG_CREDENTIAL",
          throw new IllegalArgumentException(
            "missing required env var GRAFT_CATALOG_CREDENTIAL")))
    }
}
