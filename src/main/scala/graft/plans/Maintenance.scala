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
    // pin the current snapshot (resolved version dir): a stream commit
    // landing mid-rewrite must not swap files out from under the read
    val path = wh.snapshotPath(table)
    // mergeSchema: batch subdirectories may straddle a schema evolution.
    // A bucket-partitioned mirror must be read via partition discovery
    // (recursiveFileLookup disables it and would silently flatten the
    // layout); flat/batch-subdir tables need the recursive lookup instead.
    val bucketed = isBucketPartitioned(spark, path)
    val reader = spark.read.option("mergeSchema", "true")
    val df =
      if (bucketed) reader.parquet(path)
      else reader.option("recursiveFileLookup", "true").parquet(path)
    // atomic publish: the rewrite fills a fresh version dir reading from
    // the still-live current version, then the pointer swaps (no window
    // where the table is absent or half-written)
    wh.commit(table) { staged =>
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
    import org.apache.spark.sql.functions.{col, lit}
    val path = wh.snapshotPath(table)
    val df = spark.read.parquet(path)
    if (!df.columns.contains(graft.DmsEnvelope.OpCol)) return // no tombstones
    val kept = df.filter(!(col(graft.DmsEnvelope.OpCol) === graft.DmsEnvelope.Delete &&
      col(cfg.tsCol) < lit(horizon))).localCheckpoint(true)
    wh.commit(table) { staged =>
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
