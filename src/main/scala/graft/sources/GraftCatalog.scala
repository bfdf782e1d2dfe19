package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{Maintenance, MirrorChangelog, MorMirror, PartitionedMirror}
import graft.sources.Tables.{TableProps, Warehouse}

/** The engine's SQL lifecycle surface — a Spark `TableCatalog` +
  * `ProcedureCatalog` over a graft warehouse, registered per session:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/path/to/wh")
  *   spark.sql("SELECT * FROM graft.events_changelog")
  *   spark.sql("SELECT * FROM graft.t VERSION AS OF 3")        // time travel
  *   spark.sql("CALL graft.system.merge_changes('chg','mirror','id','ts')")
  * }}}
  *
  * This is the SQL face the reference's users get free from their managed
  * Iceberg substrate (snapshot reads, `VERSION AS OF`, maintenance
  * procedures — `/root/reference/batch_bootstrapper/tabular.py` delegates
  * all of it): here it rides Spark 4's own connector hooks —
  * `TableCatalog.loadTable(ident, version)` for `VERSION AS OF` /
  * `TIMESTAMP AS OF`, `ProcedureCatalog` for `CALL` — no parser
  * extension, the stock analyzer resolves everything.
  *
  * Tables served: flat/versioned tables, append-batch changelogs, feed
  * view tables, clustered tables and materialized projections — anything
  * whose on-disk parquet IS its visible state. A hidden-time-partitioned
  * changelog serves through PARTITION DISCOVERY, so its `p_day`/`p_batch`
  * layout columns are queryable and a SQL `WHERE p_day BETWEEN ...`
  * prunes whole day dirs as real PartitionFilters. Merge-on-read and
  * key-bucketed mirrors are REFUSED loudly: their raw files are a fold
  * input (deltas, tombstones), not the table — serving them as rows
  * would silently expose deleted keys. Their SQL face is a read-optimized
  * materialized projection ([[Maintenance.materializeProjection]], kept
  * fresh by maintenance), or the `merge_changes` procedure's flat target.
  *
  * The catalog face is read-only by design (`CREATE/ALTER/DROP` refuse):
  * writes go through the engine's committed paths — the pipeline, the
  * warehouse API, and the `CALL graft.system.*` procedures below, which
  * cover the storage lifecycle (merge, compact, cluster, expiry, orphan
  * GC, feed emit/retention, snapshot listing).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces with ProcedureCatalog {

  private var catalogName: String = _
  private var wh: Warehouse = _

  /** The warehouse root this catalog serves (exposed for tooling). */
  def warehouse: Warehouse = wh

  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val root = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse must point at a graft warehouse root"))
    val retain = Option(options.get("retain")).map(_.toInt)
    wh = retain.map(r => Warehouse(root, retain = r)).getOrElse(Warehouse(root))
  }

  override def name(): String = catalogName

  // ------------------------------------------------------------------
  // namespaces: data tables live in the root (or `default`); `system`
  // holds the lifecycle procedures — the Iceberg `catalog.system.*` shape
  // ------------------------------------------------------------------

  private val SystemNs = Array("system")
  private def isDataNs(ns: Array[String]): Boolean =
    ns.isEmpty || ns.sameElements(Array("default"))

  override def listNamespaces(): Array[Array[String]] =
    Array(Array("default"), SystemNs)
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (isDataNs(namespace) || namespace.sameElements(SystemNs))
      Array.empty
    else throw new NoSuchNamespaceException(namespace)
  override def namespaceExists(namespace: Array[String]): Boolean =
    isDataNs(namespace) || namespace.sameElements(SystemNs)
  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] =
    if (namespaceExists(namespace)) java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = refuseWrite("CREATE NAMESPACE")
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = refuseWrite("ALTER NAMESPACE")
  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = refuseWrite("DROP NAMESPACE")

  // ------------------------------------------------------------------
  // tables
  // ------------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!isDataNs(namespace) && !namespace.sameElements(SystemNs))
      throw new NoSuchNamespaceException(namespace)
    if (namespace.sameElements(SystemNs)) Array.empty
    else graft.MaintenanceMain.discover(wh)
      .map(t => Identifier.of(namespace, t)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isDataNs(ident.namespace) && wh.exists(ident.name)

  private def resolved(ident: Identifier): String = {
    if (!isDataNs(ident.namespace) || !wh.exists(ident.name))
      throw new NoSuchTableException(ident)
    val t = ident.name
    // raw MOR/bucketed files are a FOLD INPUT (deltas, tombstones), not
    // the table — refuse rather than silently expose deleted keys
    if (MorMirror.storedConfig(wh, t).isDefined ||
        PartitionedMirror.storedBuckets(wh, t).isDefined)
      throw new UnsupportedOperationException(
        s"'$t' is a merge-on-read/key-bucketed mirror; its raw layout is " +
          "not row-visible. Query a read-optimized materialized projection " +
          "(Maintenance.materializeProjection) or fold through " +
          s"CALL $catalogName.system.merge_changes(...) instead.")
    t
  }

  private def mkTable(t: String, path: String): Table = {
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", path)
    opts.put("mergeSchema", "true")
    // a hidden-time-partitioned changelog serves with partition DISCOVERY
    // (p_day/p_batch queryable, day filters prune as PartitionFilters);
    // every other layout reads recursively (batch subdirs, flat versions)
    if (wh.timePartitionCol(t).isEmpty) opts.put("recursiveFileLookup", "true")
    ParquetTable(t, spark, new CaseInsensitiveStringMap(opts), Seq(path),
      None, classOf[ParquetFileFormat])
  }

  override def loadTable(ident: Identifier): Table = {
    val t = resolved(ident)
    mkTable(t, wh.snapshotPath(t))
  }

  /** `VERSION AS OF <v>` — served straight from the retained published
    * version dir (fails loudly when GC'd, same contract as
    * [[Tables.Warehouse.readVersion]]).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = resolved(ident)
    val v = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"graft versions are numbers; got VERSION AS OF '$version'"))
    val dir = wh.publishedVersions(t).collectFirst { case (`v`, p) => p }
      .getOrElse(throw new NoSuchTableException(ident))
    mkTable(t, dir.toString)
  }

  /** `TIMESTAMP AS OF <ts>` — the newest published version whose publish
    * stamp is at or before the asked instant (micros, per the connector
    * contract).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val t = resolved(ident)
    val asOfMillis = timestamp / 1000L
    val dir = wh.publishedVersions(t)
      .filter { case (_, p) => wh.publishTimeMillis(p) <= asOfMillis }
      .lastOption.map(_._2)
      .getOrElse(throw new NoSuchTableException(ident))
    mkTable(t, dir.toString)
  }

  private def refuseWrite(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"$what is not supported: the graft catalog is the READ/lifecycle " +
        "face; writes go through the engine's committed paths (pipeline, " +
        s"Warehouse API, CALL $catalogName.system.*)")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table =
    refuseWrite("CREATE TABLE")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    refuseWrite("ALTER TABLE")
  override def dropTable(ident: Identifier): Boolean = refuseWrite("DROP TABLE")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    refuseWrite("RENAME TABLE")

  // ------------------------------------------------------------------
  // procedures: CALL graft.system.<name>(...)
  // ------------------------------------------------------------------

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(SystemNs))
      procedures.keys.toArray.sorted.map(Identifier.of(SystemNs, _))
    else Array.empty

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(SystemNs),
      s"procedures live under $catalogName.system; got ${ident.namespace.mkString(".")}")
    procedures.getOrElse(ident.name, throw new NoSuchElementException(
      s"unknown procedure '${ident.name}' " +
        s"(available: ${procedures.keys.toSeq.sorted.mkString(", ")})"))
  }

  private def param(n: String, dt: DataType) = ProcedureParameter.in(n, dt).build()
  private def paramDefault(n: String, dt: DataType, sql: String) =
    ProcedureParameter.in(n, dt).defaultValue(sql).build()

  private def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString
  private def row(values: Any*): InternalRow =
    new GenericInternalRow(values.map {
      case s: String => UTF8String.fromString(s)
      case v => v
    }.toArray)

  private def procedure(pname: String, desc: String,
      params: Seq[ProcedureParameter], outSchema: StructType)(
      body: InternalRow => Seq[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = pname
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = pname
          override def description(): String = desc
          override def parameters(): Array[ProcedureParameter] = params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val out = body(input).toArray
            val scan: Scan = new LocalScan {
              override def readSchema(): StructType = outSchema
              override def rows(): Array[InternalRow] = out
            }
            java.util.List.of(scan).iterator()
          }
        }
    }

  private lazy val procedures: Map[String, UnboundProcedure] = Seq(

    // The MERGE INTO-shaped entry for the CDC fold (q18 semantics): fold
    // `source`'s change rows into flat/versioned `target`, latest-wins
    // by (ts, ingest order), tombstones retained for late arrivals.
    procedure("merge_changes",
      "Fold CDC change rows from SOURCE into flat mirror TARGET " +
        "(latest-wins by ts; exactly the streaming fold's semantics)",
      Seq(param("source", StringType), param("target", StringType),
        param("key_col", StringType), param("ts_col", StringType)),
      StructType(Seq(StructField("target", StringType),
        StructField("rows_after", LongType)))) { in =>
      val (source, target) = (str(in, 0), str(in, 1))
      val cfg = graft.CdcConfig(str(in, 2), str(in, 3))
      if (MorMirror.storedConfig(wh, target).isDefined ||
          PartitionedMirror.storedBuckets(wh, target).isDefined)
        throw new UnsupportedOperationException(
          s"'$target' is a MOR/bucketed mirror maintained by the " +
            "streaming ingest path; merge_changes targets flat mirrors")
      val changes = wh.read(spark, source, mergeSchema = true)
      val stored =
        if (wh.exists(target))
          graft.operators.Cdc.applyBatch(
            wh.read(spark, target, mergeSchema = true), changes, cfg)
        else graft.operators.Cdc.fold(changes, cfg)
      val pinned = stored.localCheckpoint(true)
      wh.overwrite(pinned, target)
      Seq(row(target, pinned.count()))
    },

    procedure("compact",
      "Layout-aware compaction (MOR delta fold / flat-bucketed rewrite / " +
        "time-partitioned in-place merge)",
      Seq(param("table", StringType),
        paramDefault("target_files", IntegerType, "8")),
      StructType(Seq(StructField("table", StringType),
        StructField("files_before", LongType),
        StructField("files_after", LongType)))) { in =>
      val t = str(in, 0)
      val before = Maintenance.dataFiles(spark, wh, t).size.toLong
      Maintenance.compact(spark, wh, t, in.getInt(1))
      Seq(row(t, before, Maintenance.dataFiles(spark, wh, t).size.toLong))
    },

    procedure("cluster",
      "Sort-order rewrite + zone-map manifest per the table's DECLARED " +
        "clustering; churn-proportional incremental path when possible",
      Seq(param("table", StringType)),
      StructType(Seq(StructField("table", StringType),
        StructField("mode", StringType)))) { in =>
      val t = str(in, 0)
      val (dims, bloomKeys, declaredFiles) =
        Maintenance.declaredClustering(wh, t).getOrElse(
          throw new IllegalStateException(
            s"'$t' declares no clustering (Maintenance.declareClustering)"))
      val mode =
        if (Maintenance.clusterIncremental(spark, wh, t, dims, bloomKeys))
          "incremental"
        else {
          Maintenance.cluster(spark, wh, t, dims,
            declaredFiles.getOrElse(8), bloomKeys = bloomKeys)
          "full"
        }
      Seq(row(t, mode))
    },

    procedure("expire_tombstones",
      "Drop delete markers older than the lateness horizon (time-" +
        "partitioned changelogs take the day-pruned path)",
      Seq(param("table", StringType), param("horizon", StringType)),
      StructType(Seq(StructField("table", StringType),
        StructField("expired", BooleanType)))) { in =>
      val t = str(in, 0)
      val cfg = MorMirror.storedConfig(wh, t).map(_._1).orElse {
        val p = TableProps.read(wh, t)
        for (k <- p.get("cdc.key-column"); ts <- p.get("cdc.ts-column"))
          yield graft.CdcConfig(k, ts)
      }.getOrElse(throw new IllegalStateException(
        s"'$t' records no cdc.* properties — nothing to expire"))
      Maintenance.expireTombstones(spark, wh, t, cfg, str(in, 1))
      Seq(row(t, true))
    },

    procedure("remove_orphans",
      "Age-guarded reachability sweep of crashed stages, stale locks and " +
        "task debris; returns each deleted path",
      Seq(param("table", StringType),
        paramDefault("older_than_ms", LongType, (24L * 3600 * 1000).toString)),
      StructType(Seq(StructField("deleted_path", StringType)))) { in =>
      Maintenance.removeOrphans(wh, str(in, 0), in.getLong(1)).map(row(_))
    },

    procedure("expire_consumed_hops",
      "Cursor-aware feed retention: sweep hop subdirs every registered " +
        "consumer has absorbed, behind the age guard",
      Seq(param("table", StringType),
        paramDefault("older_than_ms", LongType, (24L * 3600 * 1000).toString)),
      StructType(Seq(StructField("deleted_hop", StringType)))) { in =>
      MirrorChangelog.expireConsumedHops(wh, str(in, 0), in.getLong(1)).map(row(_))
    },

    // The changelog FEED face: emit pending snapshot diffs of `source`
    // into hop subdirs of `view` (then SELECT the view table itself).
    procedure("emit_changelog",
      "Emit pending snapshot-diff hops of SOURCE into feed view table " +
        "VIEW (consume them by querying the view table)",
      Seq(param("source", StringType), param("view", StringType),
        param("key_col", StringType)),
      StructType(Seq(StructField("from_version", LongType),
        StructField("to_version", LongType)))) { in =>
      MirrorChangelog.emitPending(spark, wh, str(in, 0), str(in, 1), str(in, 2))
        .map { case (f, t) => row(f, t) }
    },

    // The snapshot log as rows — what VERSION AS OF / TIMESTAMP AS OF
    // resolve against.
    procedure("snapshots",
      "Retained published versions of TABLE with their publish stamps",
      Seq(param("table", StringType)),
      StructType(Seq(StructField("version", LongType),
        StructField("published_at", TimestampType)))) { in =>
      wh.publishedVersions(str(in, 0)).map { case (v, p) =>
        row(v, wh.publishTimeMillis(p) * 1000L)
      }
    }
  ).map(p => p.name() -> p).toMap
}
