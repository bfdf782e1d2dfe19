package graft.plans

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.sources.Tables.Warehouse

/** Table maintenance for the append-only changelog (SURVEY §7.5 "changelog
  * compaction"): streaming appends produce one small file per micro-batch;
  * at 100 TB that's millions of files whose listing/footer overhead
  * dominates scans. Compaction rewrites a table to a bounded file count.
  */
object Maintenance {

  /** True when `path` holds a key-bucket-partitioned layout (`_kb=N/`
    * subdirectories). Partition discovery and `recursiveFileLookup` are
    * mutually exclusive in Spark, so the layout decides how to read.
    */
  private def isBucketPartitioned(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isDirectory &&
        s.getPath.getName.startsWith(s"${PartitionedMirror.BucketCol}="))
  }

  /** Rewrite `table` into `targetFiles` files (atomically: stage + swap).
    * At scale this runs per partition on a schedule, bounded by a target
    * file size instead of a count; the stage-and-swap commit is the same.
    */
  def compact(spark: SparkSession, wh: Warehouse, table: String, targetFiles: Int): Unit = {
    // a merge-on-read table has its OWN compaction (delta fold + horizon
    // swap); a naive recursive rewrite here would union base versions
    // with delta files and destroy the layout — delegate instead
    if (MorMirror.storedConfig(wh, table).isDefined) {
      MorMirror.compact(spark, wh, table)
      return
    }
    // pin the current snapshot (resolved version dir): a stream commit
    // landing mid-rewrite must not swap files out from under the read;
    // the commit below is conditional on this version still being current
    // (optimistic CAS), so a concurrent stream merge wins over the rewrite
    val expect = wh.currentVersion(table)
    val path = wh.snapshotPath(table)
    // mergeSchema: batch subdirectories may straddle a schema evolution.
    // A bucket-partitioned mirror must be read via partition discovery
    // (recursiveFileLookup disables it and would silently flatten the
    // layout); flat/batch-subdir tables need the recursive lookup instead.
    val bucketed = isBucketPartitioned(spark, path)
    val reader = spark.read.option("mergeSchema", "true")
    // materialize BEFORE the commit: for a legacy (real-directory) table
    // the commit migrates the directory aside first, so a lazy read
    // through the old path would execute against moved files
    val df = (
      if (bucketed) reader.parquet(path)
      else reader.option("recursiveFileLookup", "true").parquet(path)
    ).localCheckpoint(true)
    // atomic publish: the rewrite fills a fresh version dir reading from
    // the still-live current version, then the pointer swaps (no window
    // where the table is absent or half-written)
    wh.commit(table, expectCurrent = expect) { staged =>
      if (bucketed) {
        // hash-repartition on the bucket column: each bucket lands in one
        // task, so the rewrite emits one file per bucket directory
        df.repartition(targetFiles,
            org.apache.spark.sql.functions.col(PartitionedMirror.BucketCol))
          .write.mode(SaveMode.Overwrite)
          .partitionBy(PartitionedMirror.BucketCol).parquet(staged)
      } else {
        df.repartition(targetFiles).write.mode(SaveMode.Overwrite).parquet(staged)
      }
    }
  }

  /** Tombstone GC: drop delete markers whose ts is older than `horizon`
    * (the maximum expected lateness). After the horizon no late change can
    * legally lose to the tombstone anymore, so it carries no information.
    * Preserves the key-bucket partitioning when present; a full-table
    * rewrite here, per-partition on a schedule at scale.
    */
  def expireTombstones(
      spark: SparkSession, wh: Warehouse, table: String,
      cfg: graft.CdcConfig, horizon: String): Unit = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val expect = wh.currentVersion(table)
    val path = wh.snapshotPath(table)
    // mergeSchema: bucket/batch dirs may straddle a schema evolution — a
    // single-footer inference could silently drop an evolved column from
    // the full-table rewrite below
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    if (!df.columns.contains(graft.DmsEnvelope.OpCol)) return // no tombstones
    // null-safe: a null-op (LOAD-seeded) row must be KEPT — the bare
    // conjunction evaluates to null for it and filter(!null) drops it
    val kept = df.filter(!coalesce(
      col(graft.DmsEnvelope.OpCol) === graft.DmsEnvelope.Delete &&
        col(cfg.tsCol) < lit(horizon), lit(false))).localCheckpoint(true)
    wh.commit(table, expectCurrent = expect) { staged =>
      val writer = kept.write.mode(SaveMode.Overwrite)
      if (df.columns.contains(PartitionedMirror.BucketCol))
        writer.partitionBy(PartitionedMirror.BucketCol).parquet(staged)
      else writer.parquet(staged)
    }
  }

  /** Data files of a table (parquet parts, not markers). */
  def dataFiles(spark: SparkSession, wh: Warehouse, table: String): Seq[String] =
    graft.sources.Tables.listFilesExcluding(wh.tablePath(table), None)
      .filter(_.endsWith(".parquet"))
}
