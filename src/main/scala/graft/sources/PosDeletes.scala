package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** POSITIONAL delete files (Iceberg v2's position deletes on plain
  * parquet — round-16 verdict item 4): `(data file, row ordinal)`
  * tombstones for the deletes an EQUALITY sidecar cannot carry — a
  * matched set past [[EqDeletes.MaxKeys]] (enumerating keys stops being
  * "broadcast small side") and rows whose key is NULL (no equality can
  * identify them). The commit stays O(changed): every base data file
  * hard-links into the new version and one sidecar lands under
  *
  *   _posdeletes/d<nanos>-<uuid>/<dataFileName>.pos
  *
  * — per data file, the matched row ordinals as a SORTED little-endian
  * long array (Iceberg's position-delete file, keyed by file name the
  * way its spec keys by file path). No census is needed: ordinals are
  * inherently scoped to the named file, and a re-inserted row lands in
  * a NEW file no tombstone names.
  *
  * SCALE SHAPE — deliberately different from the equality path: a
  * positional matched set can be 10% of the table, so nothing here ever
  * collects tombstones on the driver. The WRITE is a distributed
  * `foreachPartition` over `(file, pos)` rows repartitioned by file
  * (idempotent: content per file is deterministic, the landing move is
  * atomic-replace). The READ probes per TASK: the affected-file scan
  * projects parquet's native `_metadata.row_index` and filters through
  * [[posDeletedUdf]], whose executor-side cache loads one file's sorted
  * ordinal array (bounded by rows-per-file) and binary-searches — the
  * Iceberg read: delete files apply where their data file is scanned.
  *
  * Reads of a posdelete-bearing snapshot go through the LOGICAL plan
  * ([[logicalRead]], spliced in by the same rules that split
  * equality-pending scans); `CALL compact` folds both sidecar kinds
  * back to a plain snapshot.
  */
private[graft] object PosDeletes {

  val Dir = "_posdeletes"

  /** Pending positional sidecar dirs of a snapshot, oldest first. */
  def pending(snapshotDir: String): Seq[Path] = {
    val root = Paths.get(snapshotDir, Dir)
    if (!Files.isDirectory(root)) return Seq.empty
    val s = Files.list(root)
    try s.iterator().asScala.filter(Files.isDirectory(_))
      .toSeq.sortBy(_.getFileName.toString)
    finally s.close()
  }

  /** Data-file names (relative, flat) any pending tombstone touches. */
  def affectedFiles(snapshotDir: String): Set[String] =
    pending(snapshotDir).flatMap { d =>
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".pos"))
        .map(_.stripSuffix(".pos")).toList
      finally s.close()
    }.toSet

  /** Write one positional sidecar into a STAGED version dir from a
    * distributed `(file: String, pos: Long)` frame — one `.pos` file
    * per touched data file, ordinals sorted, written by the executors
    * (the matched set is O(table) at its worst and must never visit
    * the driver). Returns the number of tombstones written.
    */
  def write(spark: SparkSession, stagedDir: String,
      positions: DataFrame): Long = {
    val d = Paths.get(stagedDir, Dir,
      s"d${System.nanoTime()}-${java.util.UUID.randomUUID()}")
    Files.createDirectories(d)
    val dir = d.toString
    val counts = positions.toDF("file", "pos")
      .repartition(col("file"))
      .sortWithinPartitions("file", "pos")
      .mapPartitions { rows =>
        // rows arrive grouped by file and sorted by pos; stream each
        // file's ordinals straight into its .pos array. The tmp name is
        // ATTEMPT-unique (a speculative/retried task racing the same
        // partition must never interleave into one tmp); the landing
        // move is atomic-replace and the content deterministic, so
        // whichever attempt lands last is byte-identical.
        val attempt = java.util.UUID.randomUUID().toString
        var current: String = null
        var out: java.io.DataOutputStream = null
        var n = 0L
        def tmpOf(f: String) = Paths.get(dir, s".$f.pos.$attempt.tmp")
        def close(): Unit = if (out != null) {
          out.close()
          Files.move(tmpOf(current), Paths.get(dir, s"$current.pos"),
            StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
          out = null
        }
        val it = rows.map { r =>
          val f = r.getString(0)
          if (f != current) {
            close()
            current = f
            out = new java.io.DataOutputStream(
              new java.io.BufferedOutputStream(
                Files.newOutputStream(tmpOf(current))))
          }
          out.writeLong(r.getLong(1))
          n += 1
          n
        }
        // drain, close the tail file, emit the partition's count
        var last = 0L
        while (it.hasNext) last = it.next()
        close()
        Iterator.single(last)
      }(org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    // sweep attempt debris: a failed/speculative-loser attempt leaves its
    // .tmp behind, and the version carry would hard-link it into every
    // later snapshot forever (review finding). All tasks are done here.
    val leftovers = Files.list(d)
    try leftovers.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".tmp"))
      .toList.foreach(Files.deleteIfExists(_))
    finally leftovers.close()
    counts.sum
  }

  /** The matched `(file, pos)` frame of a raw census scan — shared by
    * the main and branch positional-delete arms (their COMMIT shapes
    * differ; the position derivation must never). None when the layout
    * is nested (the flat ordinal keying cannot address it — COW owns
    * those).
    */
  def matchedPositions(spark: SparkSession, snapshotDir: String,
      pred: org.apache.spark.sql.Column): Option[DataFrame] = {
    val all = graft.plans.ZoneMap.dataFileCensus(spark, snapshotDir)
    if (all.exists(_.contains("/"))) return None
    val schema = SchemaEvolution.readTableWidened(spark, snapshotDir).schema
    Some(spark.read.schema(schema)
      .parquet(all.map(f => s"$snapshotDir/$f"): _*)
      .filter(coalesce(pred, lit(false)))
      .select(
        element_at(split(col("_metadata.file_path"), "/"), -1).as("file"),
        col("_metadata.row_index").as("pos")))
  }

  // ------------------------------------------------------------------
  // executor-side probe: per-(sidecar, file) sorted ordinal arrays,
  // lazily loaded and cached per JVM (snapshot sidecars are immutable)
  // ------------------------------------------------------------------
  private val posCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
  private[sources] def clearPosCache(): Unit = posCache.clear()
  /** Entry bound: folded sidecars leave stale entries behind on
    * long-lived executors — past it, start over rather than grow
    * forever (the keySetCache discipline; a cleared live entry just
    * re-reads its .pos file).
    */
  private val MaxCachedEntries = 1024

  private def ordinalsOf(sidecarDir: String, file: String): Array[Long] = {
    if (posCache.size > MaxCachedEntries) posCache.clear()
    posCache.computeIfAbsent(s"$sidecarDir/$file", { _ =>
      val p = Paths.get(sidecarDir, s"$file.pos")
      if (!Files.exists(p)) Array.emptyLongArray
      else {
        val bytes = Files.readAllBytes(p)
        val buf = java.nio.ByteBuffer.wrap(bytes)
        val out = new Array[Long](bytes.length / 8)
        var i = 0
        while (i < out.length) { out(i) = buf.getLong(); i += 1 }
        out // written sorted
      }
    })
  }

  private def deletedAt(sidecarDirs: Seq[String], file: String,
      pos: Long): Boolean =
    sidecarDirs.exists(d =>
      java.util.Arrays.binarySearch(ordinalsOf(d, file), pos) >= 0)

  /** The logical read of a snapshot with pending POSITIONAL deletes
    * (and, stacked beneath them, any pending equality sidecars): clean
    * files on the stock vectorized path, tombstoned files through a
    * `_metadata.row_index` projection + the per-task ordinal probe,
    * equality sidecars applied as their usual census-scoped anti-joins.
    * This IS the scan — the plan-split rules splice it in for catalog
    * reads, and fold/DML paths call it directly.
    */
  def logicalRead(spark: SparkSession, snapshotDir: String,
      schema: org.apache.spark.sql.types.StructType,
      eqKeyCols: Option[Seq[String]],
      filesSubset: Option[Seq[String]] = None): DataFrame = {
    val all = filesSubset.getOrElse(
      graft.plans.ZoneMap.dataFileCensus(spark, snapshotDir))
    val eq = EqDeletes.pending(snapshotDir)
    def withEq(df: DataFrame, files: Seq[String]): DataFrame =
      if (eq.isEmpty) df
      else {
        val ks = eqKeyCols.getOrElse(throw new IllegalStateException(
          s"$snapshotDir carries equality sidecars but no declared key"))
        // per-signature scoping preserved: a sidecar applies to a file
        // only when its census names it — group exactly like foldedRead
        // NO broadcast() hint here: this plan splices into another
        // query mid-optimization, where a ResolvedHint node would
        // survive past EliminateResolvedHint and fail the planner — the
        // key frames are ≤ MaxKeys rows, so AQE broadcasts them anyway
        EqDeletes.bySignature(files, eq).map { case (fs, applicable) =>
          val part = df.filter(col("_gf_file").isin(fs: _*))
          applicable.foldLeft(part) { (acc, sc) =>
            // no dropDuplicates: LEFT ANTI only tests existence, so
            // duplicate build-side keys change nothing — deduping cost
            // an aggregate+exchange stage per sidecar per scan.
            // explicit footer schema: a bare read.parquet runs one
            // schema-inference JOB per sidecar per plan construction
            acc.join(EqDeletes.readKeyFrame(spark, sc)
              .toDF(ks: _*), ks, "left_anti")
          }
        }.reduce(_.unionByName(_))
      }
    val tombstoned = affectedFiles(snapshotDir)
    val dirty = all.filter(tombstoned)
    val clean = all.filterNot(tombstoned)
    val sidecarDirs = pending(snapshotDir).map(_.toString)
    // deterministic: snapshot sidecars are immutable
    val probe = udf((file: String, pos: Long) =>
      !deletedAt(sidecarDirs, file, pos))
    // _gf_file: the file NAME (flat snapshot dirs only — the writer
    // refuses nested layouts), used by the probe and the eq grouping
    def named(files: Seq[String]): DataFrame =
      spark.read.schema(schema).parquet(files.map(f => s"$snapshotDir/$f"): _*)
        .withColumn("_gf_file",
          element_at(split(col("_metadata.file_path"), "/"), -1))
    val cleanDf =
      if (clean.isEmpty) None
      else Some(withEq(named(clean), clean))
    val dirtyDf =
      if (dirty.isEmpty) None
      else Some(withEq(
        named(dirty)
          .withColumn("_gf_pos", col("_metadata.row_index"))
          .filter(probe(col("_gf_file"), col("_gf_pos")))
          .drop("_gf_pos"),
        dirty))
    (cleanDf ++ dirtyDf)
      .reduceOption(_.unionByName(_))
      .map(_.drop("_gf_file"))
      .getOrElse(spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema))
  }
}
