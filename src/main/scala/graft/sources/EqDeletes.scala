package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.StructType

import graft.sources.Tables.{TableProps, Warehouse}

/** Merge-on-read SQL DELETE (Iceberg's equality-delete files on plain
  * parquet — round-13 verdict item 4): a table that declares
  * `write.delete.mode = merge-on-read` turns `DELETE FROM ... WHERE`
  * into an O(deleted-keys) commit instead of a copy-on-write file
  * rewrite — the new version HARD-LINKS every base data file and adds
  * one sidecar under `_eqdeletes/`:
  *
  *   _eqdeletes/d<nanos>-<uuid>/keys.parquet   the matched KEY values
  *   _eqdeletes/d<nanos>-<uuid>/census.txt     the data files it applies to
  *
  * SEMANTICS — keyed, like everything in this engine: the table's
  * declared key (`cdc.key-column`) identifies rows, and the delete
  * removes every row whose key matched the predicate (exact when the
  * key is unique — the keyed-mirror contract; the mode refuses tables
  * that declare no key). The CENSUS scopes each sidecar to the data
  * files that existed when it committed — Iceberg's sequence-number
  * rule expressed on names: a key re-INSERTED after the delete lands in
  * a NEW file outside the census and is NOT re-deleted.
  *
  * READ SIDE ([[EqDeleteScanBuilder]]): the catalog scan splits the
  * file set by applicable-sidecar signature — unaffected files keep the
  * stock vectorized scan untouched; affected groups re-plan through the
  * same `ParquetTable` machinery (filters re-pushed, columns pruned
  * plus the key) and their readers drop rows whose key is in the
  * group's deleted-key set (row-based until folded, the Iceberg
  * eq-delete read tax). Aggregate pushdown is NOT offered while
  * sidecars are pending — a footer-credited count would count deleted
  * rows.
  *
  * `CALL compact` (and cluster, via [[fold]]) FOLDS pending sidecars:
  * one committed rewrite of the AFFECTED files minus their deleted
  * keys, everything else carried by link — cost tracks the touched
  * region, and the folded version serves plain scans again.
  */
private[graft] object EqDeletes {

  /** `copy-on-write` (default, absent) or `merge-on-read`. */
  val ModeProp = "write.delete.mode"
  /** The key column(s) the eq-deletes identify rows by — COMPOSITE keys
    * declare a comma-separated list (`cdc.key-column = a,b`), the
    * Iceberg identifier-fields rule: compound-PK source tables (the
    * common DMS junction/fact shape) get merge-on-read too. The
    * reference leaves the key configurable, not shaped
    * (tabular.py:44-45,62).
    */
  val KeyProp = "cdc.key-column"
  val Dir = "_eqdeletes"

  /** Parse the declared key columns (round 17: N ≥ 1) — the shared
    * [[graft.CdcConfig.parseKeyCols]] syntax.
    */
  def keyColsOf(props: Map[String, String]): Option[Seq[String]] =
    props.get(KeyProp).map(_.trim).filter(_.nonEmpty)
      .map(graft.CdcConfig.parseKeyCols)

  /** Above this many matched keys a COW rewrite is the better plan (and
    * the sidecar's broadcast fold would stop being "small side").
    */
  val MaxKeys = 1000000L

  /** Maintenance fold trigger (the I1 `morCompactEvery` analog for the
    * SQL MOR path): when a table's PENDING sidecar count reaches this
    * prop's value, the scheduled tick ([[graft.MaintenanceMain]]) folds
    * them even when every other compaction guard (file-count budget,
    * zone-map freshness) would skip — each pending sidecar adds a
    * per-row HashSet probe to affected-file reads, and nothing else
    * bounds that stack.
    */
  val FoldEveryProp = "write.delete.fold-every"

  /** Default fold trigger. The measured read-debt curve (graft.
    * DeltaStress read_side, SCALE.md round-16) is FLAT once censuses
    * narrow and key sets batch-load — 64 pending sidecars read at
    * 0.18 s vs 0.10 s clean on the 2M-row fixture, because affected
    * groups merge their stacked key sets into one probe HashSet. The
    * trigger therefore bounds the *metadata* accumulation instead:
    * every DELETE pays a foldedRead over the stack to compute its
    * matched set, every scan re-groups by census signature, and the
    * driver key-set cache holds one entry per pending sidecar. 16
    * keeps all three O(small) while folding at O(deletes/16) frequency.
    */
  val DefaultFoldEvery = 16

  def morEnabled(props: Map[String, String]): Boolean =
    props.get(ModeProp).contains("merge-on-read")

  private val nullFreeVerified =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Verify the snapshot holds NO NULL keys — the merge-on-read
    * contract (the key column reports REQUIRED; Iceberg's
    * identifier-field rule). Cost is one parquet FOOTER walk (null
    * counts are column-chunk statistics — no data pages), cached per
    * version dir because snapshots are immutable; a file without
    * usable stats falls back to one Spark count. Enforced when the
    * mode is DECLARED and before every delta write: a NULL key under a
    * non-nullable schema would not fail loudly — codegen elides the
    * null check and reads garbage, which is silent corruption.
    */
  def requireNullFreeKeys(spark: SparkSession, snapshotDir: String,
      keyCols: Seq[String], context: String): Unit =
    keyCols.foreach(requireNullFreeKey(spark, snapshotDir, _, context))

  /** The LOGICAL-content variant of [[requireNullFreeKeys]] for
    * snapshots with pending POSITIONAL tombstones (round 18): footer
    * null counts include rows the tombstones already hide — the normal
    * repair for NULL keys IS a positional `DELETE WHERE key IS NULL`,
    * after which the physical files still hold the nulls but the
    * logical content is null-free. One probe-filtered scan, memoized
    * per immutable (snapshot, keys) like the footer check.
    */
  def requireNullFreeKeysLogical(spark: SparkSession, snapshotDir: String,
      props: Map[String, String], keyCols: Seq[String],
      context: String): Unit = {
    val memoKey = s"$snapshotDir#logical#${keyCols.mkString(",")}"
    if (nullFreeVerified.contains(memoKey)) return
    val nulls = logicalMorRead(spark, snapshotDir, props)
      .filter(keyCols.map(col(_).isNull).reduce(_ || _)).count()
    if (nulls > 0) throw new UnsupportedOperationException(
      s"$context: $nulls LIVE row(s) carry a NULL key component " +
        s"('${keyCols.mkString("','")}') — merge-on-read declares the " +
        "key REQUIRED. Delete or repair the NULL-key rows first " +
        "(a predicate DELETE routes them to a positional sidecar)")
    nullFreeVerified.add(memoKey)
  }

  private def requireNullFreeKey(spark: SparkSession, snapshotDir: String,
      keyCol: String, context: String): Unit = {
    // memo key includes the KEY COLUMN, not just the snapshot: re-keying
    // a table (unset MOR, change cdc.key-column, re-declare) must
    // re-verify — a pass recorded for column A says nothing about
    // column B's nulls (advice finding, round 16)
    val memoKey = s"$snapshotDir#$keyCol"
    if (nullFreeVerified.contains(memoKey)) return
    val files = graft.plans.ZoneMap.dataFileCensus(spark, snapshotDir)
    lazy val conf = spark.sessionState.newHadoopConf()
    var statsNulls = 0L
    var statsUsable = true
    files.iterator.takeWhile(_ => statsUsable && statsNulls == 0L)
      .foreach { rel =>
        graft.plans.ZoneMap.footerStats(s"$snapshotDir/$rel", conf)
          .blocks.foreach { b =>
            b.cols.get(keyCol) match {
              case Some(st) =>
                if (!st.statsPresent || !st.numNullsSet) statsUsable = false
                else statsNulls += st.numNulls
              case None => statsNulls += b.rowCount // pre-key era: all null
            }
          }
      }
    val nulls =
      if (statsUsable) statsNulls
      else spark.read.parquet(files.map(f => s"$snapshotDir/$f"): _*)
        .filter(org.apache.spark.sql.functions.col(keyCol).isNull).count()
    if (nulls > 0) throw new UnsupportedOperationException(
      s"$context: $nulls row(s) carry a NULL '$keyCol' — merge-on-read " +
        "declares the key REQUIRED (equality deletes and delta writes " +
        "identify rows by it). Repair or delete the NULL-key rows first")
    nullFreeVerified.add(memoKey)
  }

  final case class Sidecar(dir: Path, census: Set[String]) {
    def keysPath: String = dir.resolve("keys.parquet").toString
    /** The key signature this sidecar was WRITTEN under (declared order,
      * one column per line in `keycols.txt`) — the columns its stored
      * key frame identifies rows by. `None` for sidecars written before
      * round 19 recorded it; readers fall back to the call-time declared
      * key, which the catalog's re-key guard keeps identical while any
      * sidecar pends in retained history (advice finding: `between()`
      * reads historical sidecars, and an API-level re-key must not
      * rebind an old frame to different columns).
      */
    def storedKeyCols: Option[Seq[String]] = {
      val f = dir.resolve(KeyColsFile)
      if (Files.isRegularFile(f))
        Some(Files.readAllLines(f).asScala.map(_.trim)
          .filter(_.nonEmpty).toSeq)
      else None
    }
  }

  /** Per-sidecar key-signature file (see [[Sidecar.storedKeyCols]]). */
  val KeyColsFile = "keycols.txt"

  /** Census narrowing for a new sidecar: scope it to the files that CAN
    * contain a deleted key — zone-map evidence first (bloom ∧ min/max,
    * keep-conservative), parquet FOOTER min/max as the manifest-less
    * fallback (driver-side, file-count-capped), the whole census last
    * (always correct, just unsplit). `keyRows` is only forced under the
    * probe cap.
    *
    * COMPOSITE keys narrow by PER-COLUMN INTERSECTION: a file survives
    * only when, for every key column with evidence, it can hold at
    * least one of that column's matched component values — a superset
    * of the files holding a matched tuple (keep-conservative, exact for
    * N = 1). A column without evidence constrains nothing.
    */
  def narrowedCensus(spark: SparkSession, snapshotDir: String,
      keyCols: Seq[String],
      keyTypes: Seq[org.apache.spark.sql.types.DataType],
      keyRows: => Seq[Seq[Any]], nKeys: Long,
      all: Seq[String]): Seq[String] =
    if (nKeys <= 0 || nKeys > graft.plans.ZoneMap.MaxProbeKeys) all
    else {
      val rows = keyRows
      val perCol = keyCols.zipWithIndex.map { case (c, i) =>
        val values = rows.map(_(i)).distinct.toIndexedSeq
        graft.plans.ZoneMap.keyedSurvivors(spark, snapshotDir, c, values,
          keyTypeHint = Some(keyTypes(i)))
          .orElse(graft.plans.ZoneMap.footerSurvivors(spark, snapshotDir,
            c, values, keyTypes(i)))
      }
      perCol.flatten
        .reduceOption((a, b) => (a.toSet intersect b.toSet).toSeq)
        .getOrElse(all)
    }

  /** Any pending merge-on-read sidecar — equality OR positional
    * ([[PosDeletes]]): the gate every raw-read/rewrite path checks.
    */
  def anyPending(snapshotDir: String): Boolean =
    pending(snapshotDir).nonEmpty ||
      PosDeletes.pending(snapshotDir).nonEmpty

  /** The snapshot's LOGICAL content through BOTH sidecar kinds —
    * positional tombstones probed per task, equality sidecars applied
    * census-scoped. The one read every DML matching / folded fallback
    * path shares.
    */
  def logicalMorRead(spark: SparkSession, snapshotDir: String,
      props: Map[String, String]): DataFrame =
    if (PosDeletes.pending(snapshotDir).nonEmpty)
      PosDeletes.logicalRead(spark, snapshotDir,
        SchemaEvolution.readTableWidened(spark, snapshotDir).schema,
        keyColsOf(props))
    else if (pending(snapshotDir).nonEmpty)
      // LOUD when the key declaration is gone but sidecars pend (the
      // pre-round-17 contract): a silent raw read would resurrect every
      // sidecar-deleted row through the DML matching / audit paths
      foldedRead(spark, snapshotDir, keyColsOf(props).getOrElse(
        throw new IllegalStateException(
          s"$snapshotDir carries pending equality-delete sidecars but " +
            s"no '$KeyProp' is declared — the sidecar key frames are " +
            "bound to the declared key; restore the property")))
    else SchemaEvolution.readTableWidened(spark, snapshotDir)

  /** One sidecar's key frame with its schema served DRIVER-SIDE from the
    * (memoized) footer instead of a per-construction Spark inference job
    * — a stack of k pending sidecars read by a fold/logical plan paid k
    * inference jobs per statement before round 21. Falls back to the
    * inferring read when the footer shortcut declines (multi-schema or
    * unreadable — cannot happen for frames this engine writes).
    */
  private[sources] def readKeyFrame(spark: SparkSession,
      sc: Sidecar): DataFrame =
    SchemaEvolution.uniformFooterSchema(spark, sc.keysPath) match {
      case Some(s) => spark.read.schema(s).parquet(sc.keysPath)
      case None => spark.read.parquet(sc.keysPath)
    }

  /** Pending sidecars of a snapshot dir, oldest first. */
  def pending(snapshotDir: String): Seq[Sidecar] = {
    val root = Paths.get(snapshotDir, Dir)
    if (!Files.isDirectory(root)) return Seq.empty
    val s = Files.list(root)
    try s.iterator().asScala
      .filter(p => Files.isDirectory(p))
      .toSeq.sortBy(_.getFileName.toString)
      .map { d =>
        val census = Files.readAllLines(d.resolve("census.txt"))
          .asScala.filter(_.nonEmpty).toSet
        Sidecar(d, census)
      }
    finally s.close()
  }

  /** Write one sidecar into a STAGED version dir. `keys` is a frame of
    * the matched key values (non-null, columns in declared key order);
    * `census` the relative data-file names the delete applies to. The
    * key signature (the frame's own column names) is recorded in
    * `keycols.txt` so a historical read never rebinds the frame to a
    * later key declaration ([[Sidecar.storedKeyCols]]).
    */
  def write(stagedDir: String, keys: DataFrame, census: Seq[String]): Unit = {
    val d = Paths.get(stagedDir, Dir,
      s"d${System.nanoTime()}-${java.util.UUID.randomUUID()}")
    Files.createDirectories(d)
    keys.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(d.resolve("keys.parquet").toString)
    Files.write(d.resolve(KeyColsFile),
      keys.columns.mkString("\n").getBytes("UTF-8"))
    Files.write(d.resolve("census.txt"),
      census.sorted.mkString("\n").getBytes("UTF-8"))
  }

  /** The folded view of a snapshot — every pending sidecar applied as a
    * broadcast LEFT ANTI join scoped to its census (the fold's own read;
    * catalog SCANS use the reader-level filter instead). Composite keys
    * anti-join on every key column. Each sidecar joins on the key
    * signature it was WRITTEN under ([[Sidecar.storedKeyCols]]) — a
    * historical version's sidecar must delete by ITS key columns even
    * if the table was since re-keyed (advice finding); `keyCols` is the
    * fallback for pre-signature sidecars, whose frames are positional
    * in declared order.
    */
  def foldedRead(spark: SparkSession, snapshotDir: String,
      keyCols: Seq[String]): DataFrame = {
    val sidecars = pending(snapshotDir)
    val all = graft.plans.ZoneMap.dataFileCensus(spark, snapshotDir)
    val base = SchemaEvolution.readTableWidened(spark, snapshotDir)
    if (sidecars.isEmpty) return base
    bySignature(all, sidecars).map { case (files, applicable) =>
      val df = spark.read.schema(base.schema)
        .parquet(files.map(f => s"$snapshotDir/$f"): _*)
      applicable.foldLeft(df) { (acc, sc) =>
        val kc = sc.storedKeyCols.getOrElse(keyCols)
        // no dropDuplicates: LEFT ANTI only tests existence — deduping
        // cost an aggregate+exchange stage per sidecar per fold
        acc.join(broadcast(readKeyFrame(spark, sc)
          .toDF(kc: _*)),
          kc, "left_anti")
      }
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Group the snapshot's data files by WHICH sidecars apply to each —
    * per-signature scans keep a re-inserted key alive (its new file is
    * outside the older sidecar's census).
    */
  def bySignature(allFiles: Seq[String], sidecars: Seq[Sidecar])
      : Seq[(Seq[String], Seq[Sidecar])] =
    allFiles.groupBy(f => sidecars.filter(_.census.contains(f)))
      .toSeq.map { case (applicable, files) => (files, applicable) }
      .sortBy(_._1.headOption.getOrElse(""))

  /** Fold every pending sidecar into one committed rewrite: affected
    * files rewrite minus their deleted keys, unaffected files carry by
    * link, sidecars do not carry — the folded version is a plain
    * snapshot again. Returns true when a fold committed.
    */
  /** Test seam: fired between the fold's snapshot read and its commit —
    * the spec uses it to land a rival commit deterministically inside
    * the conflict window (same pattern as MorMirror.beforeBaseCommit).
    */
  private[graft] var beforeFoldCommit: () => Unit = () => ()

  def fold(spark: SparkSession, wh: Warehouse, table: String): Boolean = {
    if (!anyPending(wh.snapshotPath(table))) return false
    val props = TableProps.read(wh, table)
    val keyColsOpt = keyColsOf(props)
    require(pending(wh.snapshotPath(table)).isEmpty || keyColsOpt.isDefined,
      s"'$table' has pending equality deletes but no '$KeyProp'")
    wh.retryingConflicts() {
      val expect = wh.currentVersion(table)
      val snap = wh.snapshotPath(table)
      val sidecars = pending(snap)
      val posDirs = PosDeletes.pending(snap)
      if (sidecars.nonEmpty || posDirs.nonEmpty) {
        val all = graft.plans.ZoneMap.dataFileCensus(spark, snap)
        // a file folds when ANY sidecar kind touches it: named in an
        // equality census, or carrying positional tombstones
        val posAffected = PosDeletes.affectedFiles(snap)
        val groups = bySignature(all, sidecars)
        val untouched = groups.collect { case (fs, a) if a.isEmpty => fs }
          .flatten.filterNot(posAffected)
        val affected = all.filterNot(untouched.toSet)
        val schema = SchemaEvolution.readTableWidened(spark, snap).schema
        // lazy: the staged write streams survivors straight from the
        // PINNED snapshot's immutable files (merge-on-read tables are
        // always versioned) — no localCheckpoint materialization pass.
        // A rival-GC vanishing-snapshot failure mid-write is conflict-
        // shaped (isSnapshotRace) and retried by retryingConflicts.
        val survivors =
          if (affected.isEmpty) None
          else Some(PosDeletes.logicalRead(spark, snap, schema, keyColsOpt,
            filesSubset = Some(affected)))
        val markers = Tables.readRootMarkers(snap)
        beforeFoldCommit()
        wh.commit(table, expectCurrent = expect) { staged =>
          survivors.foreach(_.write.mode(SaveMode.Overwrite).parquet(staged))
          untouched.foreach { f =>
            wh.io.linkOrCopy(Paths.get(snap, f), Paths.get(staged, f))
          }
          // a version dir needs at least one footer to serve its schema
          if (survivors.isEmpty && untouched.isEmpty)
            spark.createDataFrame(
              java.util.Collections.emptyList[org.apache.spark.sql.Row](),
              schema).repartition(1).write
              .mode(SaveMode.Append).parquet(staged)
          Tables.writeRootMarkers(markers, staged)
          // neither sidecar kind carries (the fold consumed them); no
          // _zonemap carry: rewritten names invalidate the census
        }
      }
    }
    true
  }

  /** Per-sidecar deleted-key sets in CATALYST INTERNAL form, cached by
    * sidecar dir (immutable once committed): the first scan after a
    * stack of deletes loads every still-uncached set in ONE Spark job
    * (the per-sidecar `spark.read.collect` shape paid one full job —
    * scheduler overhead, not I/O — per sidecar per scan; 64 pending
    * sidecars made every table scan a 64-job planning storm, measured
    * in DeltaStress round 16). Bounded: sets past [[CacheableKeys]]
    * are rebuilt per scan instead of cached.
    */
  private val keySetCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashSet[Any]]()
  private val CacheableKeys = 100000

  private[sources] def clearKeySetCache(): Unit = keySetCache.clear()

  /** Load a signature group's deleted keys (union over its applicable
    * sidecars) in CATALYST INTERNAL form, ready for per-row probes.
    * Composite keys probe as `List[Any]` of the components in declared
    * order (structural equality); single keys stay the raw value.
    */
  def internalKeySet(spark: SparkSession, applicable: Seq[Sidecar],
      keyTypes: Seq[org.apache.spark.sql.types.DataType])
      : java.util.HashSet[Any] = {
    val perSidecar = internalKeySets(spark, applicable, keyTypes)
    val set = new java.util.HashSet[Any]()
    perSidecar.values.foreach(set.addAll)
    set
  }

  /** Per-sidecar key sets for `sidecars`, loading all cache misses in
    * one batched read.
    */
  def internalKeySets(spark: SparkSession, sidecars: Seq[Sidecar],
      keyTypes: Seq[org.apache.spark.sql.types.DataType])
      : Map[String, java.util.HashSet[Any]] = {
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.functions.input_file_name
    // snapshot hits via get (one atomic read per sidecar — containsKey
    // then get raced with a concurrent clear and could serve null); a
    // set evicted between the two calls just degrades to a miss
    val hits = sidecars.flatMap { sc =>
      Option(keySetCache.get(sc.dir.toString)).map(sc.dir.toString -> _)
    }.toMap
    val misses = sidecars.filterNot(sc => hits.contains(sc.dir.toString))
    if (misses.nonEmpty) {
      val convs = keyTypes.map(
        CatalystTypeConverters.createToCatalystConverter).toArray
      // sidecar dir NAMES (d<nanos>-<uuid>) are globally unique — the
      // part-file path inside keys.parquet/ maps back through them
      val byName = misses.map(sc =>
        sc.dir.getFileName.toString -> sc.dir.toString).toMap
      val fresh = new scala.collection.mutable.HashMap[String, java.util.HashSet[Any]]()
      misses.foreach(sc => fresh(sc.dir.toString) = new java.util.HashSet[Any]())
      spark.read.parquet(misses.map(_.keysPath): _*)
        .select(input_file_name(), org.apache.spark.sql.functions.col("*"))
        .collect().foreach { r =>
        r.getString(0).split('/').collectFirst {
          case s if byName.contains(s) => byName(s)
        }.foreach { dir =>
          // stored keys are non-null by the write contract; a null
          // component (legacy/corrupt) can never match a row probe
          val nulls = convs.indices.exists(i => r.isNullAt(i + 1))
          if (!nulls) fresh(dir).add(
            if (convs.length == 1) convs(0)(r.get(1))
            else convs.indices.map(i => convs(i)(r.get(i + 1))).toList)
        }
      }
      // crude bound on ENTRY count too (folded sidecars leave stale
      // entries behind): past it, start over rather than grow forever.
      // This call's hit sets were snapshotted above, so the clear can
      // never null out the map we return.
      if (keySetCache.size > 256) keySetCache.clear()
      fresh.foreach { case (dir, set) =>
        if (set.size <= CacheableKeys) keySetCache.put(dir, set)
      }
      // serve this call from the freshly built sets (large ones too)
      // plus the pre-captured hits — never back through the cache
      return sidecars.map(sc => sc.dir.toString ->
        fresh.getOrElse(sc.dir.toString, hits(sc.dir.toString))).toMap
    }
    hits
  }

  /** The reader-level key filter of one affected group — serialized to
    * executors with its (bounded, ≤ [[MaxKeys]]) deleted-key set in
    * CATALYST internal form (UTF8String/Long/...), probed per row.
    * Composite keys probe a List of the components (any-NULL component
    * keeps the row — SQL equality can never have matched it).
    */
  final class FilteringReaderFactory(
      inner: org.apache.spark.sql.connector.read.PartitionReaderFactory,
      keyIdxs: Array[Int],
      keyTypes: Array[org.apache.spark.sql.types.DataType],
      deleted: java.util.HashSet[Any])
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}

    /** The row's probe element — null when any component is NULL (keep). */
    private def keyOf(r: InternalRow): Any =
      if (keyIdxs.length == 1) {
        if (r.isNullAt(keyIdxs(0))) null else r.get(keyIdxs(0), keyTypes(0))
      } else {
        if (keyIdxs.indices.exists(i => r.isNullAt(keyIdxs(i)))) null
        else keyIdxs.indices.map(i => r.get(keyIdxs(i), keyTypes(i))).toList
      }

    // the SCAN interface stays row-based (eq-deletes filter per row —
    // the Iceberg read tax until compact folds), but the DECODING does
    // not have to be: see createReader
    override def supportColumnarReads(p: InputPartition): Boolean = false

    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      // VECTORIZED DECODE under the row interface (round 16): when the
      // stock factory can serve ColumnarBatches (vectorized reader on,
      // atomic schema), decode through it and probe rows off
      // `rowIterator()` — parquet pages decompress through the
      // vectorized column readers instead of parquet-mr's per-record
      // assembly, and each emitted row is a live batch view consumed
      // one-at-a-time by the exec's projection (never buffered). The
      // Iceberg shape: delete files apply per row while the decode
      // stays columnar.
      if (inner.supportColumnarReads(p)) {
        val in = inner.createColumnarReader(p)
        new PartitionReader[InternalRow] {
          private var it: java.util.Iterator[InternalRow] =
            java.util.Collections.emptyIterator()
          private var current: InternalRow = _
          override def next(): Boolean = {
            while (true) {
              while (it.hasNext) {
                val r = it.next()
                val k = keyOf(r)
                if (k == null || !deleted.contains(k)) {
                  current = r; return true
                }
              }
              if (!in.next()) return false
              it = in.get().rowIterator()
            }
            false
          }
          override def get(): InternalRow = current
          override def close(): Unit = in.close()
        }
      } else {
        val in = inner.createReader(p)
        new PartitionReader[InternalRow] {
          private var current: InternalRow = _
          override def next(): Boolean = {
            while (in.next()) {
              val r = in.get()
              val k = keyOf(r)
              if (k == null || !deleted.contains(k)) { current = r; return true }
            }
            false
          }
          override def get(): InternalRow = current
          override def close(): Unit = in.close()
        }
      }
    }
  }
}

/** The catalog scan of a snapshot with PENDING equality deletes (see
  * [[EqDeletes]]): files split by applicable-sidecar signature, each
  * group re-planned through the stock `ParquetTable` machinery with the
  * recorded filters re-pushed and columns pruned PLUS the key column
  * (the reader needs it to probe; the Project Spark keeps above a V2
  * scan drops the extra column for free). Affected groups read row-based
  * with the per-row key filter; the no-sidecar group keeps the stock
  * vectorized path untouched. No aggregate pushdown — a footer-credited
  * count would count deleted rows.
  */
private[sources] class EqDeleteScanBuilder(tableName: String,
    baseDir: String, tableSchema: StructType, keyCols: Seq[String],
    options: org.apache.spark.sql.util.CaseInsensitiveStringMap,
    sidecars: Seq[EqDeletes.Sidecar],
    filesOverride: Option[Seq[String]] = None)
  extends org.apache.spark.sql.connector.read.ScanBuilder
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.connector.read._
  import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
  import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable

  private var recorded: Seq[Expression] = Nil
  private var required: StructType = tableSchema

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    recorded = filters
    filters // all residual upstream; re-pushed into each group's builder
  }
  override def pushedFilters(): Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val spark = SparkSession.active
    // pruned schema PLUS the key columns, in table order (uniform across
    // groups)
    val wanted = required.fieldNames.toSet ++ keyCols
    val pruned = StructType(tableSchema.fields.filter(f => wanted(f.name)))
    val keyTypes = keyCols.map(tableSchema(_).dataType)
    // an explicit file list comes from [[SplitEqDeleteScans]]' plan-level
    // split (this builder then serves ONLY the affected files; the
    // unaffected ones ride a stock columnar relation unioned beside it)
    val all = filesOverride.getOrElse(
      graft.plans.ZoneMap.dataFileCensus(spark, baseDir))
    val groups = EqDeletes.bySignature(all, sidecars)
    // when this builder still serves the WHOLE census (no session
    // extension split the relation pre-pushdown) and the census has
    // both clean and affected files, record everything the POST-pushdown
    // twin rule ([[SplitEqDeleteScanRelations]]) needs to restore the
    // Union shape — the round-16 split, unconditional on session wiring
    val splitSpec = if (filesOverride.isDefined) None else {
      val unaffected = groups.collect { case (fs, a) if a.isEmpty => fs }.flatten
      val affected = groups.collect { case (fs, a) if a.nonEmpty => fs }.flatten
      if (unaffected.isEmpty || affected.isEmpty) None
      else Some(EqDeleteSplitSpec(tableName, baseDir, tableSchema, keyCols,
        options, sidecars, recorded, pruned, unaffected, affected))
    }
    // warm every sidecar's key set in ONE batched read before the group
    // loop — per-group loading would pay one Spark job per cache-missing
    // group (a 64-sidecar stack made every scan a job storm)
    EqDeletes.internalKeySets(spark, sidecars, keyTypes)
    val built = groups.map { case (files, applicable) =>
      val opts = new java.util.HashMap[String, String]()
      opts.put("mergeSchema", "true")
      val sb = ParquetTable(tableName, spark,
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts),
        files.map(f => s"$baseDir/$f"), Some(tableSchema),
        classOf[ParquetFileFormat]).newScanBuilder(options)
        .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.FileScanBuilder]
      sb.pushFilters(recorded)
      sb.pruneColumns(pruned)
      val scan = sb.build()
      val deleted =
        if (applicable.isEmpty) None
        else Some(EqDeletes.internalKeySet(spark, applicable, keyTypes))
      (scan, deleted)
    }
    val readSchema = built.headOption.map(_._1.readSchema()).getOrElse(pruned)
    new EqDeleteScan(tableName, built, readSchema,
      keyCols.map(readSchema.fieldIndex).toArray, keyTypes.toArray,
      splitSpec)
  }
}

/** Everything [[SplitEqDeleteScanRelations]] needs to re-plan a built
  * whole-census eq-delete scan as Union(stock clean scan, affected-only
  * eq-delete scan) AFTER pushdown already ran: the recorded filters and
  * pruned schema replay into each side's fresh builder.
  */
private[sources] final case class EqDeleteSplitSpec(tableName: String,
    baseDir: String, tableSchema: StructType, keyCols: Seq[String],
    options: org.apache.spark.sql.util.CaseInsensitiveStringMap,
    sidecars: Seq[EqDeletes.Sidecar],
    recorded: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
    pruned: StructType, unaffected: Seq[String], affected: Seq[String])

private[sources] class EqDeleteScan(tableName: String,
    groups: Seq[(org.apache.spark.sql.connector.read.Scan, Option[java.util.HashSet[Any]])],
    schema: StructType, keyIdxs: Array[Int],
    keyTypes: Array[org.apache.spark.sql.types.DataType],
    private[sources] val splitSpec: Option[EqDeleteSplitSpec] = None)
  extends org.apache.spark.sql.connector.read.Scan
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  import org.apache.spark.sql.connector.read._

  override def readSchema(): StructType = schema

  /** Round 20 (verdict item 3): without statistics this scan's relation
    * falls back to `spark.sql.defaultSizeInBytes` — effectively
    * infinite — so a dimension-sized MOR table with ONE pending sidecar
    * silently degrades every join against it to sort-merge until
    * `CALL compact` folds. The estimate sums the wrapped per-group file
    * scans' own (pruning-prorated) estimates and haircuts the pending
    * deleted keys at the read schema's row width — deletions only
    * shrink the served rows, and the inner estimates are what the
    * FOLDED table would report, so the estimate stays within the same
    * trust tier as a stock parquet relation's.
    */
  override def estimateStatistics(): Statistics = {
    val sizes = groups.map {
      case (s: SupportsReportStatistics, _) =>
        s.estimateStatistics().sizeInBytes()
      case _ => java.util.OptionalLong.empty()
    }
    val est: java.util.OptionalLong =
      if (sizes.exists(!_.isPresent)) java.util.OptionalLong.empty()
      else {
        val total = sizes.map(_.getAsLong).sum
        val deletedKeys = groups.flatMap(_._2).map(_.size().toLong).sum
        val rowWidth = math.max(1, schema.defaultSize).toLong
        java.util.OptionalLong.of(
          math.max(0L, total - deletedKeys * rowWidth))
      }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = est
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }
  override def description(): String = {
    val affected = groups.count(_._2.isDefined)
    s"EqDeleteScan($tableName, ${groups.size} groups, $affected filtered)"
  }

  /** Uniformly row-based while sidecars are pending: affected groups
    * MUST read row-by-row (the key probe), and Spark 4's
    * `DataSourceV2ScanExecBase.supportsColumnar` refuses a scan whose
    * partitions mix row-based and columnar ("Cannot mix row-based and
    * columnar input partitions") — the default PARTITION_DEFINED mode
    * would crash every post-delete SELECT the moment an append lands a
    * file outside all censuses (unaffected → columnar) next to affected
    * ones. The read tax ends when `CALL compact` folds the sidecars.
    */
  override def columnarSupportMode(): org.apache.spark.sql.connector.read.Scan.ColumnarSupportMode =
    org.apache.spark.sql.connector.read.Scan.ColumnarSupportMode.UNSUPPORTED

  override def toBatch: Batch = new Batch {
    private lazy val batches = groups.map { case (s, del) => (s.toBatch, del) }
    override def planInputPartitions(): Array[InputPartition] =
      batches.zipWithIndex.flatMap { case ((b, _), gi) =>
        b.planInputPartitions().map(p => EqDeleteGroupedPartition(gi, p))
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory = {
      val factories = batches.map { case (b, del) =>
        val f = b.createReaderFactory()
        del.fold(f)(ks =>
          new EqDeletes.FilteringReaderFactory(f, keyIdxs, keyTypes, ks))
      }
      new EqDeleteCompositeFactory(factories.toArray)
    }
  }
}

private case class EqDeleteGroupedPartition(group: Int,
    inner: org.apache.spark.sql.connector.read.InputPartition)
  extends org.apache.spark.sql.connector.read.InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

private class EqDeleteCompositeFactory(
    factories: Array[org.apache.spark.sql.connector.read.PartitionReaderFactory])
  extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.connector.read._
  private def of(p: InputPartition) = {
    val gp = p.asInstanceOf[EqDeleteGroupedPartition]
    (factories(gp.group), gp.inner)
  }
  override def createReader(p: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val (f, in) = of(p); f.createReader(in)
  }
  // uniformly row-based (EqDeleteScan.columnarSupportMode=UNSUPPORTED):
  // a per-partition answer here would re-open the mixed-mode crash
  override def supportColumnarReads(p: InputPartition): Boolean = false
}
