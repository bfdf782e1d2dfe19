package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.plans.{Maintenance, ZoneMap}
import graft.sources.Tables.Warehouse

/** Beyond-the-manifest-ceiling measurement of point lookups (the numbers
  * SCALE.md cites for the two-tier bloom design), in two censuses:
  *
  * A. **Bloom mechanism at the 100 TB file shape** (`bloomRows` rows in
  *    `bloomFiles` files — enough distinct keys per file that the parquet
  *    dictionary overflows, the regime where footer blooms actually
  *    materialize; an all-dict tiny file is already exactly filterable
  *    from its dictionary page): the same point lookup against
  *      1. a clustered layout written WITHOUT bloom keys — min/max
  *         row-group stats are useless for a scattered key and there is
  *         no dictionary to filter on, so every data page is read;
  *      2. the above-ceiling layout [[Maintenance.cluster]] writes
  *         (footer blooms on the key, manifest min/max-only): the
  *         planning probe finds no manifest bloom, falls back to the
  *         filtered scan, and the parquet reader bloom-skips every
  *         non-matching row group — footer opens only.
  *    Reported per mode: wall time and RECORDS DECODED by the scan
  *    (locally a skipped row group is decode work avoided; on an object
  *    store it is a ranged data-page GET per file per query that never
  *    happens).
  *
  * B. **File-count scale at `files` files (default 10k, the manifest
  *    ceiling)**: the above-ceiling lookup stays exact and its input
  *    decoded records stay ≈ |keys| files' worth (small files here are
  *    all-dict, so parquet dictionary filtering provides the same
  *    row-group skip the blooms provide at census-A cardinality — EITHER
  *    way no non-matching data page is decoded); versus the
  *    below-ceiling design FORCED at the same file count: manifest
  *    bitsets are correct but the manifest itself drags bits x files
  *    bytes through every planning probe — the measured cost that
  *    motivates the ceiling.
  *
  * All lookups must return exactly the probed rows (asserted).
  *
  * Run: `sbt "runMain graft.FooterBloomStress [files] [bloomRows] [bloomFiles]"`
  * (defaults 10000 / 6.4M / 32). Prints one JSON line.
  */
object FooterBloomStress {
  def main(args: Array[String]): Unit = {
    val files = args.headOption.map(_.toInt).getOrElse(10000)
    val bloomRows = if (args.length > 1) args(1).toLong else 6400000L
    val bloomFiles = if (args.length > 2) args(2).toInt else 32
    val spark = Harness.session("graft-footer-bloom-stress")
    import Harness.timed

    // executor scan census per query: RECORDS the parquet reader actually
    // decoded, summed from task metrics. (bytesRead is NOT used: the local
    // filesystem's vectored parquet IO bypasses the FileSystem statistics
    // the metric samples, under-reporting wildly — records decoded is the
    // number a skipped row group actually changes.)
    val recsRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          recsRead.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    })
    def measured[T](f: => T): (T, Double, Long) = {
      // drain in-flight listener events from the PREVIOUS query so its
      // bytes don't leak into this census
      org.apache.spark.GraftSparkBridge.waitListenerBusEmpty(spark.sparkContext)
      recsRead.set(0L)
      val (r, t) = timed(f)
      org.apache.spark.GraftSparkBridge.waitListenerBusEmpty(spark.sparkContext)
      (r, t, recsRead.get())
    }

    val base = java.nio.file.Files.createTempDirectory("graft-fb-stress").toString
    val wh = Warehouse(base)
    def fact(n: Long) = spark.range(n).select(
      col("id"),
      pmod(hash(col("id")), lit(100000)).cast("long").as("x"),
      (col("id") % 97).cast("double").as("v"))

    // ---- census A: bloom mechanism at dict-overflow cardinality ----
    val keysA: Seq[Any] = Seq(42L, 424242L, 4242424L, bloomRows - 7)
      .filter(_ < bloomRows).distinct
    wh.overwrite(fact(bloomRows).repartition(32), "nb")
    Maintenance.cluster(spark, wh, "nb", Seq("x"), targetFiles = bloomFiles)
    val (cNb, tNb, bNb) = measured {
      spark.read.parquet(wh.snapshotPath("nb"))
        .filter(col("id").isin(keysA: _*)).count()
    }
    wh.overwrite(fact(bloomRows).repartition(32), "fb")
    val (_, tClusterFb) = timed {
      Maintenance.cluster(spark, wh, "fb", Seq("x"), targetFiles = bloomFiles,
        bloomKeys = Seq("id"), manifestBloomMaxFiles = bloomFiles - 1)
    }
    val fbPath = wh.snapshotPath("fb")
    assert(!ZoneMap.manifest(spark, fbPath).columns.exists(_.startsWith("bloom_")),
      "above the ceiling the manifest must be min/max-only")
    val (cFb, tFb, bFb) = measured {
      ZoneMap.lookupRead(spark, fbPath, "id", keysA).count()
    }
    assert(cNb == keysA.size.toLong && cFb == keysA.size.toLong,
      s"census A changed results: $cNb / $cFb vs ${keysA.size}")

    // ---- census B: file-count scale at the manifest ceiling ----
    val rowsB = files * 2000L
    val keysB: Seq[Any] = Seq(42L, 424242L, 4242424L, rowsB - 7)
      .filter(_ < rowsB).distinct
    wh.overwrite(fact(rowsB).repartition(64), "wide")
    val (_, tClusterWide) = timed {
      Maintenance.cluster(spark, wh, "wide", Seq("x"), targetFiles = files,
        bloomKeys = Seq("id"), manifestBloomMaxFiles = files - 1)
    }
    val widePath = wh.snapshotPath("wide")
    val (cWide, tWide, bWide) = measured {
      ZoneMap.lookupRead(spark, widePath, "id", keysB).count()
    }
    // manifest bitsets forced at the same file count — sized to ~10 bits
    // per expected key per file, the below-ceiling formula
    val bloomBits = {
      val perFile = math.max(1L, rowsB / files) * 10L
      math.max(64L, math.min(1L << 24,
        java.lang.Long.highestOneBit(perFile) << 1)).toInt
    }
    val (_, tManifest) = timed {
      ZoneMap.buildAndSave(spark, widePath, Seq("x"), Seq("id"), bloomBits)
    }
    val manifestBytes = {
      val p = java.nio.file.Paths.get(widePath, ZoneMap.ManifestDir)
      val s = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      } finally s.close()
    }
    val (cBitset, tBitset, bBitset) = measured {
      ZoneMap.lookupRead(spark, widePath, "id", keysB).count()
    }
    assert(cWide == keysB.size.toLong && cBitset == keysB.size.toLong,
      s"census B changed results: $cWide / $cBitset vs ${keysB.size}")

    // ---- census C: NDV saturation (round-12 verdict item 5) ----
    // key density that SATURATES a fixed 2^20 bitset: 500k distinct keys
    // per file fill ~92% of the bits (FPP ~65% at 5 hashes), so nearly
    // every file survives every probe and MERGE runtime narrowing
    // degrades to whole-table. NDV-adaptive sizing picks 2^23 bits for
    // the same files (~1% FPP) and the probe narrows to ~1 file again.
    val satFiles = 8
    val satRows = satFiles * 500000L
    wh.overwrite(fact(satRows).repartition(satFiles), "sat")
    val satPath = wh.snapshotPath("sat")
    val keysC: Seq[Long] = Seq(7L, 123457L, 1234567L, satRows - 3)
    def survivorsTotal(): Int = keysC.map { k =>
      ZoneMap.keyedSurvivors(spark, satPath, "id", Seq(k),
        keyTypeHint = Some(org.apache.spark.sql.types.LongType),
        bloomOnly = true).get.size
    }.sum
    // yesterday's fixed sizing, forced via the ceiling clamp
    val (_, tSatFixed) = timed {
      ZoneMap.buildAndSave(spark, satPath, Seq("x"), Seq("id"),
        bloomBits = 1 << 20)
    }
    val satFixedSurvivors = survivorsTotal()
    // NDV-adaptive (the default ceiling)
    val (_, tSatAdaptive) = timed {
      ZoneMap.buildAndSave(spark, satPath, Seq("x"), Seq("id"))
    }
    val satAdaptiveSurvivors = survivorsTotal()
    assert(satAdaptiveSurvivors <= keysC.size * 2,
      s"adaptive bitsets must narrow at saturating density: " +
        s"$satAdaptiveSurvivors survivors for ${keysC.size} keys")

    println(s"""{"metric":"footer_bloom_stress",""" +
      s""""satur_files":$satFiles,"satur_keys_per_file":500000,""" +
      s""""satur_fixed_survivors":$satFixedSurvivors,""" +
      s""""satur_adaptive_survivors":$satAdaptiveSurvivors,""" +
      s""""satur_fixed_build_s":${f"$tSatFixed%.2f"},""" +
      s""""satur_adaptive_build_s":${f"$tSatAdaptive%.2f"},""" +
      s""""bloom_rows":$bloomRows,"bloom_files":$bloomFiles,""" +
      s""""lookupA_nobloom_s":${f"$tNb%.2f"},"recsA_nobloom":$bNb,""" +
      s""""cluster_bloom_s":${f"$tClusterFb%.2f"},""" +
      s""""lookupA_footer_s":${f"$tFb%.2f"},"recsA_footer":$bFb,""" +
      s""""files":$files,"rows_wide":$rowsB,""" +
      s""""cluster_wide_s":${f"$tClusterWide%.2f"},""" +
      s""""lookupB_footer_s":${f"$tWide%.2f"},"recsB_footer":$bWide,""" +
      s""""manifest_build_s":${f"$tManifest%.2f"},""" +
      s""""manifest_bytes":$manifestBytes,""" +
      s""""lookupB_manifest_s":${f"$tBitset%.2f"},"recsB_manifest":$bBitset}""")
    graft.sources.Tables.deleteRecursively(java.nio.file.Paths.get(base))
    spark.stop()
  }
}
