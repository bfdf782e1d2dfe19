package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.CdcConfig
import graft.operators.Cdc
import graft.sources.Tables.Warehouse

/** The 100 TB mirror layout: the mirror table is stored partitioned by a
  * key-hash bucket column, and each CDC batch rewrites ONLY the buckets its
  * changes touch.
  *
  * Why this matters at scale: the flat `Warehouse.overwrite` mirror rewrite
  * is O(mirror) per batch — fine at test SF, unacceptable at 100 TB. Here a
  * micro-batch touching k of N buckets reads k partitions (partition
  * pruning on `_kb`, visible as PartitionFilters in the scan) and rewrites
  * k partition directories (dynamic partition overwrite), so merge cost is
  * O(mirror_touched + delta), independent of total mirror size. This is the
  * plain-parquet equivalent of an Iceberg/Delta `MERGE INTO` with
  * bucket-clustered layout (reference semantics: tabular.py:58-64).
  */
object PartitionedMirror {

  /** Partition column: deterministic key-hash bucket. */
  val BucketCol = "_kb"

  private def withBucket(df: DataFrame, cfg: CdcConfig, nBuckets: Int): DataFrame =
    df.withColumn(BucketCol, pmod(hash(col(cfg.keyCol)), lit(nBuckets)))

  /** Create the mirror from an initial state, partitioned by key bucket. */
  def initialize(
      wh: Warehouse, name: String, state: DataFrame,
      cfg: CdcConfig, nBuckets: Int): Unit =
    withBucket(state, cfg, nBuckets)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(BucketCol)
      .parquet(wh.tablePath(name))

  /** Read the mirror's VISIBLE state (tombstones hidden, bucket col dropped). */
  def read(spark: SparkSession, wh: Warehouse, name: String): DataFrame =
    Cdc.currentState(spark.read.parquet(wh.tablePath(name)).drop(BucketCol))

  /** Apply one changelog batch, touching only the buckets present in it.
    *
    * Steps: (1) bucket the changes; (2) collect the touched bucket ids
    * (bounded by nBuckets — partition METADATA, not data, so the driver
    * collect is safe); (3) read only those partitions of the mirror;
    * (4) run the standard latest-wins fold; (5) dynamic-partition-overwrite
    * exactly the touched buckets. Deletes persist as tombstone rows, so a
    * touched bucket always has output — buckets only become empty (and
    * their directories removed) through
    * [[graft.plans.Maintenance.expireTombstones]] after the lateness
    * horizon.
    */
  def applyBatch(
      spark: SparkSession, wh: Warehouse, name: String,
      changes: DataFrame, cfg: CdcConfig, nBuckets: Int): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val ch = withBucket(Cdc.withIngestSeq(changes), cfg, nBuckets)
    val touched = ch.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return

    val raw = spark.read.parquet(wh.tablePath(name))
    if (!raw.columns.contains(BucketCol)) {
      // legacy/seeded flat mirror (e.g. LOAD-file initial load): migrate it
      // into the bucketed layout wholesale on first merge — dynamic
      // partition overwrite into a flat directory would mix layouts
      val merged = Cdc.applyBatch(raw, ch.drop(BucketCol), cfg).localCheckpoint(true)
      initialize(wh, name, merged, cfg, nBuckets)
      return
    }
    val mirrorTouched = raw
      .filter(col(BucketCol).isin(touched.map(Integer.valueOf): _*))
      .drop(BucketCol)
    val merged = Cdc.applyBatch(mirrorTouched, ch.drop(BucketCol), cfg)
    val out = withBucket(merged, cfg, nBuckets).localCheckpoint(true)

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try out.write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
      .parquet(wh.tablePath(name))
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
