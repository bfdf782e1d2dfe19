package graft

import org.apache.spark.sql.functions._

import graft.plans.{Maintenance, ZoneMap}
import graft.sources.Tables.Warehouse

/** Beyond-bench-SF measurement of the zone-map read path (the numbers
  * SCALE.md cites): an N-row two-dimensional fact table queried with a
  * selective 2-D box, three ways —
  *
  *   1. full filtered scan of the UNclustered layout (the baseline every
  *      engine pays without layout work),
  *   2. full filtered scan of the z-CLUSTERED layout (parquet row-group
  *      stats start pruning once values cluster — the free win),
  *   3. [[ZoneMap.read]] on the clustered layout (file-level pruning from
  *      the manifest BEFORE any footer is opened).
  *
  * All three must return identical aggregates (asserted). Also reports
  * the manifest's own planning cost (census + survivor selection) and
  * the file census (survivors/total) — the number that scales: locally a
  * skipped footer is a page-cached open; on an object store it is a GET
  * round-trip per file per query.
  *
  * Run: `sbt "runMain graft.ZoneMapStress [nRows] [files]"` (defaults
  * 20M / 64). Prints one JSON line.
  */
object ZoneMapStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val files = if (args.length > 1) args(1).toInt else 64
    val spark = Harness.session("graft-zonemap-stress")
    import Harness.timed

    val base = java.nio.file.Files.createTempDirectory("graft-zm-stress").toString
    val wh = Warehouse(base)

    // two independent uniform dims (hash-scrambled so neither correlates
    // with row order — the unclustered layout is genuinely unclustered)
    val df = spark.range(n).select(
      col("id"),
      pmod(hash(col("id")), lit(100000)).cast("long").as("x"),
      pmod(hash(col("id") + 1234567), lit(100000)).cast("long").as("y"),
      (col("id") % 97).cast("double").as("v"))

    val (_, tWrite) = timed { wh.overwrite(df.repartition(files), "fact") }
    // bloom sized to ~10 bits per expected key per file (~1% FPP at 5
    // hashes), rounded up to a byte multiple of 8 bits
    val bloomBits = {
      val perFile = math.max(1L, n / files) * 10L
      math.min(1L << 24, java.lang.Long.highestOneBit(perFile) << 1).toInt
    }
    val (_, tCluster) = timed {
      Maintenance.cluster(spark, wh, "fact", Seq("x", "y"),
        targetFiles = files, bloomKeys = Seq("id"), bloomBits = bloomBits)
    }
    val path = wh.snapshotPath("fact")

    // a ~1% x 1% box (each dim selects 1/100 of its domain)
    val bounds = Seq(ZoneMap.Bound.between("x", 40000L, 40999L),
      ZoneMap.Bound.between("y", 70000L, 70999L))
    val rowPred = col("x").between(40000L, 40999L) &&
      col("y").between(70000L, 70999L)

    def agg(d: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val r = d.agg(count(lit(1)), sum(col("v"))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0.0 else r.getDouble(1))
    }

    // unclustered baseline: a separate plain-parquet copy
    val flatPath = s"$base/flat"
    df.repartition(files).write.parquet(flatPath)
    val (aFlat, tFlat) = timed { agg(spark.read.parquet(flatPath).filter(rowPred)) }
    val (aClustered, tClustered) = timed {
      agg(spark.read.parquet(path).filter(rowPred))
    }
    val (plan, tPlan) = timed { ZoneMap.pruneStats(spark, path, bounds) }
    val (aPruned, tPruned) = timed { agg(ZoneMap.read(spark, path, bounds)) }

    assert(aFlat == aClustered && aClustered == aPruned,
      s"layout/pruning changed results: $aFlat vs $aClustered vs $aPruned")

    // manifest-credited COUNT: a 20%-of-domain box on one clustered dim
    // (wide enough that many files are FULLY contained) — the count
    // should come mostly from manifest rows, scanning only boundary files
    val wideBounds = Seq(ZoneMap.Bound.between("x", 40000L, 59999L))
    val widePred = col("x").between(40000L, 59999L)
    val (cntScan, tCntScan) = timed {
      spark.read.parquet(path).filter(widePred).count()
    }
    val (cntFast, tCntFast) = timed { ZoneMap.countFast(spark, path, wideBounds) }
    assert(cntScan == cntFast, s"countFast diverged: $cntScan vs $cntFast")

    // point lookup on the UNclustered key: manifest blooms vs full scan
    val lookupKeys: Seq[Any] =
      Seq(42L, 424242L, 4242424L, 14242424L, n - 7).filter(_ < n).distinct
    val (cFull, tLookFull) = timed {
      spark.read.parquet(path).filter(col("id").isin(lookupKeys: _*)).count()
    }
    val (cBloom, tLookBloom) = timed {
      ZoneMap.lookupRead(spark, path, "id", lookupKeys).count()
    }
    assert(cFull == cBloom && cBloom == lookupKeys.size.toLong,
      s"bloom lookup changed results: $cFull vs $cBloom")

    // --- incremental re-cluster: maintenance cost tracks churn, not size ---
    // single-dim layout (the incremental path's scope), one planted
    // out-of-order file of ~0.1% of the rows in a narrow x band — the
    // "writer appended without sorting" shape
    wh.overwrite(df.repartition(files), "fact1d")
    val (_, tCluster1d) = timed {
      Maintenance.cluster(spark, wh, "fact1d", Seq("x"), targetFiles = files)
    }
    val p1d = wh.snapshotPath("fact1d")
    val nPlant = math.max(1000L, n / 1000)
    locally {
      import scala.jdk.CollectionConverters._
      val stagePlant = s"$base/plant"
      spark.range(nPlant).select((col("id") + n).as("id"),
          (lit(40000L) + pmod(col("id"), lit(500))).as("x"),
          pmod(hash(col("id") + 7), lit(100000)).cast("long").as("y"),
          (col("id") % 97).cast("double").as("v"))
        .coalesce(1).write.mode("overwrite").parquet(stagePlant)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(stagePlant))
        .iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part,
        java.nio.file.Paths.get(p1d, "planted-0001.parquet"))
    }
    val (incOk, tIncremental) = timed {
      Maintenance.clusterIncremental(spark, wh, "fact1d", Seq("x"))
    }
    assert(incOk, "append-only staleness must take the incremental path")
    val n1d = spark.read.parquet(wh.snapshotPath("fact1d")).count()
    assert(n1d == n + nPlant, s"incremental recluster lost rows: $n1d")

    // --- 2-dim (z-order) incremental (round 19): an in-bounds 0.1%
    // append splices under the STORED scaling instead of paying the
    // full z rewrite (tCluster above is exactly that full-rewrite cost)
    locally {
      import scala.jdk.CollectionConverters._
      val stagePlant = s"$base/plant2d"
      spark.range(nPlant).select((col("id") + 2L * n).as("id"),
          (lit(40000L) + pmod(col("id"), lit(500))).as("x"),
          (lit(70000L) + pmod(col("id"), lit(500))).as("y"),
          (col("id") % 97).cast("double").as("v"))
        .coalesce(1).write.mode("overwrite").parquet(stagePlant)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(stagePlant))
        .iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part,
        java.nio.file.Paths.get(path, "planted-2d.parquet"))
    }
    val filesBefore2d = ZoneMap.dataFileCensus(spark, path).toSet
    val (incOk2d, tIncremental2d) = timed {
      Maintenance.clusterIncremental(spark, wh, "fact", Seq("x", "y"),
        bloomKeys = Seq("id"))
    }
    assert(incOk2d, "an in-bounds z append must take the incremental path")
    val p2d = wh.snapshotPath("fact")
    val n2d = spark.read.parquet(p2d).count()
    assert(n2d == n + nPlant, s"z incremental recluster lost rows: $n2d")
    val carried2d =
      (filesBefore2d intersect ZoneMap.dataFileCensus(spark, p2d).toSet).size
    val (aPruned2d, _) = timed { agg(ZoneMap.read(spark, p2d, bounds)) }
    // the planted rows lie strictly inside the read bounds, so the box
    // read must gain EXACTLY nPlant — >= would let a splice that
    // duplicated or dropped planted rows inside the box pass (advice)
    assert(aPruned2d._1 == aPruned._1 + nPlant,
      s"post-splice box read must gain exactly $nPlant planted rows: " +
        s"${aPruned2d._1} vs ${aPruned._1}")

    println(s"""{"metric":"zonemap_stress","rows":$n,"files":$files,""" +
      s""""box_rows":${aPruned._1},""" +
      s""""write_s":${f"$tWrite%.2f"},"cluster_s":${f"$tCluster%.2f"},""" +
      s""""scan_flat_s":${f"$tFlat%.2f"},""" +
      s""""scan_clustered_s":${f"$tClustered%.2f"},""" +
      s""""plan_s":${f"$tPlan%.2f"},"scan_pruned_s":${f"$tPruned%.2f"},""" +
      s""""files_survived":${plan._1},"files_total":${plan._2},""" +
      s""""lookup_full_s":${f"$tLookFull%.2f"},""" +
      s""""lookup_bloom_s":${f"$tLookBloom%.2f"},""" +
      s""""count_scan_s":${f"$tCntScan%.2f"},""" +
      s""""count_fast_s":${f"$tCntFast%.2f"},""" +
      s""""cluster_1d_s":${f"$tCluster1d%.2f"},""" +
      s""""incremental_recluster_s":${f"$tIncremental%.2f"},""" +
      s""""incremental_recluster_2d_s":${f"$tIncremental2d%.2f"},""" +
      s""""carried_files_2d":$carried2d}""")
    graft.sources.Tables.deleteRecursively(java.nio.file.Paths.get(base))
    spark.stop()
  }
}
