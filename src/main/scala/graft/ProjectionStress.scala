package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc
import graft.plans.{Maintenance, MorMirror, ZoneMap}
import graft.sources.Tables.Warehouse

/** Beyond-bench-SF measurement of the materialized-projection refresh
  * (the numbers SCALE.md cites): an N-row MOR mirror with a derived
  * clustered projection, timing
  *
  *   1. the initial materialization (O(mirror) — the honest cost of the
  *      flat read-optimized layout),
  *   2. the stamped NO-OP refresh against the idle mirror (the number
  *      that makes a cron cadence affordable),
  *   3. the refresh after a SMALL delta (still O(mirror): stamp changed,
  *      full rewrite — quantifying the trade the scaladoc declares),
  *   4. a zone-map range read + a bloom point lookup on the projection
  *      vs the same answered by the MOR fold directly (what the
  *      projection buys readers).
  *
  * Run: `sbt "runMain graft.ProjectionStress [nRows] [nDelta]"`
  * (defaults 2M / 20k). Prints one JSON line.
  */
object ProjectionStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nDelta = if (args.length > 1) args(1).toLong else 20000L
    val spark = Harness.session("graft-projection-stress")
    import Harness.timed

    val base = java.nio.file.Files.createTempDirectory("graft-proj-stress").toString
    val wh = Warehouse(base)
    val cfg = CdcConfig(keyCol = "id", tsCol = "ts")

    def rows(ids: org.apache.spark.sql.DataFrame, ts: Long) = ids.select(
      col("id"), lit(ts).as("ts"),
      pmod(hash(col("id")), lit(1000)).cast("long").as("grp"),
      (pmod(hash(col("id") + 77), lit(100000)).cast("double") / 100).as("score"),
      lit("U").as("op"))

    MorMirror.initialize(wh, "mirror",
      Cdc.fold(rows(spark.range(n).toDF(), 1L), cfg), cfg, nBuckets = 64)

    val (_, tInit) = timed {
      Maintenance.materializeProjection(spark, wh, "mirror", "mirror_ro",
        dims = Seq("grp", "score"), bloomKeys = Seq("id"), targetFiles = 64)
    }
    val (skipped, tNoop) = timed {
      !Maintenance.materializeProjection(spark, wh, "mirror", "mirror_ro",
        dims = Seq("grp", "score"), bloomKeys = Seq("id"), targetFiles = 64)
    }
    assert(skipped, "idle-source refresh must be a stamped no-op")

    // a small spread delta (every bucket touched), then the full refresh
    val stride = math.max(1L, n / nDelta)
    MorMirror.appendDelta(wh, "mirror",
      rows(spark.range(nDelta).toDF()
        .select((col("id") * stride % n).as("id")), 2L),
      batchId = 1L)
    val (refreshed, tRefresh) = timed {
      Maintenance.materializeProjection(spark, wh, "mirror", "mirror_ro",
        dims = Seq("grp", "score"), bloomKeys = Seq("id"), targetFiles = 64)
    }
    assert(refreshed, "changed source must refresh")

    // what the projection buys a reader, vs the same question on the fold
    val boxPred = col("grp").between(100L, 109L) &&
      col("score").between(200.0, 299.99)
    def cnt(d: org.apache.spark.sql.DataFrame): Long = d.count()
    val (cMor, tMorScan) = timed {
      cnt(MorMirror.read(spark, wh, "mirror").filter(boxPred))
    }
    val roPath = wh.snapshotPath("mirror_ro")
    val (cRo, tRoScan) = timed {
      cnt(ZoneMap.read(spark, roPath,
        Seq(ZoneMap.Bound.between("grp", 100L, 109L),
          ZoneMap.Bound.between("score", 200.0, 299.99))))
    }
    assert(cMor == cRo, s"projection diverged from fold: $cMor vs $cRo")
    val probeKeys: Seq[Any] = Seq(42L, n / 3, n - 5).distinct
    val (cMorLk, tMorLookup) = timed {
      cnt(MorMirror.read(spark, wh, "mirror")
        .filter(col("id").isin(probeKeys: _*)))
    }
    val (cRoLk, tRoLookup) = timed {
      cnt(ZoneMap.lookupRead(spark, roPath, "id", probeKeys))
    }
    assert(cMorLk == cRoLk, s"lookup diverged: $cMorLk vs $cRoLk")

    println(s"""{"metric":"projection_stress","rows":$n,"delta":$nDelta,""" +
      s""""materialize_s":${f"$tInit%.2f"},"noop_refresh_s":${f"$tNoop%.2f"},""" +
      s""""delta_refresh_s":${f"$tRefresh%.2f"},""" +
      s""""box_scan_mor_s":${f"$tMorScan%.2f"},""" +
      s""""box_scan_projection_s":${f"$tRoScan%.2f"},""" +
      s""""lookup_mor_s":${f"$tMorLookup%.2f"},""" +
      s""""lookup_projection_s":${f"$tRoLookup%.2f"},"box_rows":$cRo}""")
    graft.sources.Tables.deleteRecursively(java.nio.file.Paths.get(base))
    spark.stop()
  }
}
