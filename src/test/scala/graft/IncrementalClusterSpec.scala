package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.{Maintenance, ZoneMap}
import graft.plans.ZoneMap.Bound
import graft.sources.Tables.Warehouse

/** Incremental re-cluster (round-11 verdict item 6, the Iceberg
  * `rewrite_data_files` file-filter analog): a census stale from APPENDED
  * files rewrites only the disordered range — untouched files carry into
  * the new version by hard link under their own names, their manifest
  * rows verbatim — and every scope guard that must fall back to the full
  * rewrite does so explicitly.
  */
class IncrementalClusterSpec extends SparkTestBase {
  import spark.implicits._

  /** 100k rows, dim `d` uniform over [0, 1000); clustered into 10 files
    * each owning a ~100-wide `d` range.
    */
  private def mkClustered(wh: Warehouse, bloomKeys: Seq[String] = Nil): Unit = {
    val df = spark.range(100000).select(col("id"),
      pmod(col("id") * 37, lit(1000)).as("d"))
    wh.overwrite(df.repartition(8), "t")
    Maintenance.cluster(spark, wh, "t", Seq("d"), targetFiles = 10,
      bloomKeys = bloomKeys, bloomBits = 1 << 14)
  }

  private def dataFiles(path: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(path))
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSet
    finally s.close()
  }

  /** Write `df` as one foreign parquet file directly into the snapshot
    * dir (a writer that bypassed maintenance — disk is disk).
    */
  private def plant(df: DataFrame, path: String, name: String): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = Files.createTempDirectory("plant")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, Paths.get(path, name))
    graft.sources.Tables.deleteRecursively(tmp)
  }

  test("one out-of-order file rewrites only its range: untouched files carry by name, content and pruning exact") {
    val wh = Warehouse(tmpDir("ic-basic"))
    mkClustered(wh)
    val v0path = wh.snapshotPath("t")
    val before = dataFiles(v0path)
    assert(before.size == 10)
    val beforeManifest = ZoneMap.manifest(spark, v0path)
      .select("file", "min_d", "max_d").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // which original files does a [450, 460] insert overlap?
    val overlapping = beforeManifest
      .filter { case (_, lo, hi) => !(hi < 450L || lo > 460L) }.map(_._1).toSet
    assert(overlapping.nonEmpty && overlapping.size <= 2,
      s"a narrow range should overlap ~1 of 10 range-owned files: $overlapping")
    plant((0 until 100).map(i => (1000000L + i, 450L + i % 11))
      .toDF("id", "d"), v0path, "planted-0001.parquet")
    assert(!ZoneMap.isFresh(spark, v0path), "planting must stale the census")
    val expected = (wh.read(spark, "t").collect().map(_.toString).toSeq).sorted

    assert(Maintenance.clusterIncremental(spark, wh, "t", Seq("d")),
      "an append-only staleness must take the incremental path")
    val v1path = wh.snapshotPath("t")
    assert(v1path != v0path, "the rewrite must publish a NEW version")
    val after = dataFiles(v1path)
    // every non-overlapping original file carried BY NAME (hard link);
    // the planted file and the overlapped file(s) were consumed
    val untouched = before -- overlapping
    assert(untouched.subsetOf(after),
      s"untouched files must carry by name: missing ${untouched -- after}")
    assert(!after.contains("planted-0001.parquet"),
      "the planted file must be absorbed into the sorted region")
    assert((after -- untouched).nonEmpty, "the region rewrite emits files")
    // content exact, census fresh, pruned read exact
    assert(wh.read(spark, "t").collect().map(_.toString).toSeq.sorted == expected)
    assert(ZoneMap.isFresh(spark, v1path))
    val bounds = Seq(Bound.between("d", 440L, 470L))
    assert(ZoneMap.read(spark, v1path, bounds).collect().map(_.toString).sorted
      .toSeq ==
      wh.read(spark, "t").filter(col("d").between(440L, 470L))
        .collect().map(_.toString).sorted.toSeq)
    val (kept, total) = ZoneMap.pruneStats(spark, v1path, bounds)
    assert(kept < total, "the merged manifest must still prune")
  }

  test("scope guards: fresh census no-ops, deletions/multi-dim/schema-drift fall back to the full path") {
    val wh = Warehouse(tmpDir("ic-guards"))
    mkClustered(wh)
    val path = wh.snapshotPath("t")
    val v = wh.currentVersion("t")
    // fresh census: handled (true) with NO new version
    assert(Maintenance.clusterIncremental(spark, wh, "t", Seq("d")))
    assert(wh.currentVersion("t") == v, "a fresh census must not commit")
    // multi-dim with NO stored scaling (this table clustered 1-dim, so
    // no `_scaling` was written): immediate full-path signal — z codes
    // are only comparable under a recorded scaling
    assert(!Maintenance.clusterIncremental(spark, wh, "t", Seq("d", "id")))
    // schema drift in the planted file: full-path signal
    plant(Seq((1L, 2L, "x")).toDF("id", "d", "extra"), path, "planted-ev.parquet")
    assert(!Maintenance.clusterIncremental(spark, wh, "t", Seq("d")))
    Files.delete(Paths.get(path, "planted-ev.parquet"))
    // a REMOVED file invalidates carried stats wholesale: full-path signal
    val victim = dataFiles(path).head
    Files.delete(Paths.get(path, victim))
    assert(!Maintenance.clusterIncremental(spark, wh, "t", Seq("d")))
  }

  test("bloom-mode manifest: carried and rewritten rows keep one bloom geometry; lookups stay exact") {
    val wh = Warehouse(tmpDir("ic-bloom"))
    mkClustered(wh, bloomKeys = Seq("id"))
    val v0path = wh.snapshotPath("t")
    val cfg0 = {
      val m = ZoneMap.manifest(spark, v0path)
      (m.select(length(col("bloom_id"))).head.getInt(0),
        m.select("bloomhashes_id").head.getInt(0))
    }
    plant((0 until 50).map(i => (2000000L + i, 500L)).toDF("id", "d"),
      v0path, "planted-b.parquet")
    // declared bloom keys that do NOT match the manifest: full-path signal
    assert(!Maintenance.clusterIncremental(spark, wh, "t", Seq("d"),
      bloomKeys = Seq("d")))
    assert(Maintenance.clusterIncremental(spark, wh, "t", Seq("d"),
      bloomKeys = Seq("id")))
    val v1path = wh.snapshotPath("t")
    val m1 = ZoneMap.manifest(spark, v1path)
    assert(m1.columns.contains("bloom_id"))
    // the HASH COUNT is the one probe-shared constant and must carry
    // exactly; bitset SIZES are per-file NDV-adaptive by design (the
    // probe reads each row's own bitset length), so carried rows keep
    // their stored bytes while rewritten rows size to their own keys
    val hashes = m1.select(col("bloomhashes_id")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(hashes == Set(cfg0._2), s"hash count must carry exactly: $hashes")
    val lens = m1.select(length(col("bloom_id"))).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(lens.contains(cfg0._1),
      s"carried rows must keep their stored bitsets: $lens vs $cfg0")
    // a planted key resolves through the merged manifest's bitsets
    val keys: Seq[Any] = Seq(2000007L, 42L)
    assert(ZoneMap.lookupRead(spark, v1path, "id", keys)
      .collect().map(_.toString).sorted.toSeq ==
      wh.read(spark, "t").filter(col("id").isin(keys: _*))
        .collect().map(_.toString).sorted.toSeq)
  }

  test("a ZERO-ROW appended file is dropped as debris: the splice commits untouched files + manifest verbatim, census fresh, content unchanged") {
    val wh = Warehouse(tmpDir("ic-empty"))
    mkClustered(wh)
    val v0path = wh.snapshotPath("t")
    val expected = wh.read(spark, "t").count()
    // an empty append (a writer committed a batch that matched nothing):
    // its single part file holds zero rows, so a rewrite of it would
    // emit an output statsRows cannot census — the splice must DROP it
    plant(Seq.empty[(Long, Long)].toDF("id", "d"), v0path,
      "planted-empty.parquet")
    assert(!ZoneMap.isFresh(spark, v0path))
    assert(Maintenance.clusterIncremental(spark, wh, "t", Seq("d")),
      "an empty append must still take (and finish) the cheap path")
    val v1path = wh.snapshotPath("t")
    assert(v1path != v0path, "the debris drop commits a new version")
    assert(ZoneMap.isFresh(spark, v1path),
      "the manifest must match the census after the debris drop")
    assert(!dataFiles(v1path).contains("planted-empty.parquet"))
    assert(wh.read(spark, "t").count() == expected)
  }

  test("z-order incremental: an in-bounds append splices by its z-range under the STORED scaling; a range-extending one falls back to the full rewrite") {
    val wh = Warehouse(tmpDir("ic-zorder"))
    val df = spark.range(100000).select(col("id"),
      pmod(col("id") * 37, lit(1000)).as("x"),
      pmod(col("id") * 53, lit(1000)).as("y"))
    wh.overwrite(df.repartition(8), "t")
    Maintenance.cluster(spark, wh, "t", Seq("x", "y"), targetFiles = 16)
    val v0path = wh.snapshotPath("t")
    // every full z-order rewrite persists its min-max scaling beside the
    // manifest — the comparability contract incremental splices need
    assert(Files.isRegularFile(
      Paths.get(v0path, ZoneMap.ManifestDir, "_scaling")))
    val before = dataFiles(v0path)
    assert(before.size == 16)
    // an in-bounds patch: a tight (x, y) box well inside [0, 1000)^2
    plant((0 until 100).map(i => (1000000L + i, 450L + i % 11, 455L + i % 7))
      .toDF("id", "x", "y"), v0path, "planted-z.parquet")
    assert(!ZoneMap.isFresh(spark, v0path))
    val expected = wh.read(spark, "t").collect().map(_.toString).toSeq.sorted

    assert(Maintenance.clusterIncremental(spark, wh, "t", Seq("x", "y")),
      "an in-bounds z-order append must take the incremental path")
    val v1path = wh.snapshotPath("t")
    val after = dataFiles(v1path)
    val carried = before intersect after
    assert(carried.nonEmpty, "the splice must carry untouched files")
    assert((before -- after).size <= before.size / 2,
      s"a tight patch must not rewrite most of the table: " +
        s"rewrote ${(before -- after).size} of ${before.size}")
    assert(!after.contains("planted-z.parquet"),
      "the planted file must be absorbed into the z region")
    // content exact, census fresh, 2-dim box pruning exact and effective
    assert(wh.read(spark, "t").collect().map(_.toString).toSeq.sorted
      == expected)
    assert(ZoneMap.isFresh(spark, v1path))
    val bounds = Seq(Bound.between("x", 440L, 470L),
      Bound.between("y", 440L, 470L))
    assert(ZoneMap.read(spark, v1path, bounds).collect().map(_.toString)
      .sorted.toSeq ==
      wh.read(spark, "t")
        .filter(col("x").between(440L, 470L) &&
          col("y").between(440L, 470L))
        .collect().map(_.toString).sorted.toSeq)
    val (kept, total) = ZoneMap.pruneStats(spark, v1path, bounds)
    assert(kept < total, "the merged manifest must still prune both dims")
    // the scaling carried with the splice
    assert(Files.isRegularFile(
      Paths.get(v1path, ZoneMap.ManifestDir, "_scaling")))

    // OUT-OF-BOUNDS append (x past the stored hi): Morton codes under a
    // re-derived scaling would not be comparable — loud full-path signal
    plant(Seq((3000000L, 2000L, 500L)).toDF("id", "x", "y"), v1path,
      "planted-oob.parquet")
    assert(!Maintenance.clusterIncremental(spark, wh, "t", Seq("x", "y")),
      "a range-extending append must fall back to the full rewrite")
    // the full rewrite re-derives the scaling over the new range
    Maintenance.cluster(spark, wh, "t", Seq("x", "y"), targetFiles = 16)
    val v2path = wh.snapshotPath("t")
    assert(ZoneMap.isFresh(spark, v2path))
    assert(wh.read(spark, "t").filter(col("x") === 2000L).count() == 1L)
    // and the NEXT in-bounds append splices again under the new scaling
    plant(Seq((4000000L, 900L, 900L)).toDF("id", "x", "y"), v2path,
      "planted-z2.parquet")
    assert(Maintenance.clusterIncremental(spark, wh, "t", Seq("x", "y")))
    assert(ZoneMap.isFresh(spark, wh.snapshotPath("t")))
  }

  test("the maintenance tick takes the incremental path for append-only staleness") {
    val wh = Warehouse(tmpDir("ic-tick"))
    mkClustered(wh)
    Maintenance.declareClustering(wh, "t", Seq("d"), targetFiles = Some(10))
    val v0path = wh.snapshotPath("t")
    val before = dataFiles(v0path)
    plant((0 until 20).map(i => (3000000L + i, 42L)).toDF("id", "d"),
      v0path, "planted-t.parquet")
    val failed = MaintenanceMain.run(spark, wh, Seq("t"), targetFiles = 10,
      tombstoneHorizon = None, orphanAgeMs = Long.MaxValue)
    assert(failed.isEmpty)
    val after = dataFiles(wh.snapshotPath("t"))
    // the census proves the cheap path ran: a FULL rewrite keeps no
    // original file name; the incremental one carries every
    // non-overlapping file
    assert((before & after).size >= 8,
      s"tick must re-cluster incrementally (carried ${(before & after).size})")
    assert(ZoneMap.isFresh(spark, wh.snapshotPath("t")))
  }
}
