package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Cdc
import graft.plans.{MorMirror, PartitionedMirror}
import graft.sources.Tables.Warehouse

/** Beyond-bench-SF measurement of the round-10 headline claim: a CDC batch
  * whose keys spread across EVERY bucket costs O(mirror) under the
  * copy-on-write rewrite but O(delta) under the merge-on-read commit.
  *
  * Setup: an `nRows`-row mirror (64 buckets), initialized identically as
  * COW ([[PartitionedMirror]]) and MOR ([[MorMirror]]); `nBatches` change
  * batches of `batchRows` keys drawn uniformly across the key space (the
  * full-bucket-spread worst case — every batch touches all 64 buckets).
  *
  * Measured claims:
  *   1. per-batch MOR append wall-clock beats the COW rewrite (the write
  *      side is delta-sized vs mirror-sized);
  *   2. both states remain IDENTICAL after every batch (checked exactly
  *      at the end);
  *   3. MOR read cost grows with pending deltas and compaction restores
  *      it to base-scan cost — the read-debt curve a deployment's
  *      compaction cadence bounds.
  *
  * Run: `sbt "runMain graft.MirrorStress [nRows] [nBatches] [batchRows]"`
  * (defaults 2000000 / 8 / 20000).
  */
object MirrorStress {

  def main(args: Array[String]): Unit = {
    val nRows = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val batchRows = args.lift(2).map(_.toLong).getOrElse(20000L)
    val buckets = 64
    val spark = Harness.session("graft-mirror-stress")
    graft.functions.GraftFunctions.register(spark)
    import Harness.timed

    val cfg = CdcConfig("id", "ts")
    def payload(df: DataFrame): DataFrame = df
      .withColumn("name", concat(lit("name_"), col("id")))
      .withColumn("val", pmod(hash(col("id")), lit(1000)).cast("long"))

    val initial = payload(spark.range(nRows).select(col("id")))
      .withColumn("op", lit("U")).withColumn("ts", lit("t000"))
    val whCow = Warehouse(java.nio.file.Files.createTempDirectory("ms-cow").toString)
    val whMor = Warehouse(java.nio.file.Files.createTempDirectory("ms-mor").toString)
    val seed = Cdc.fold(initial, cfg).localCheckpoint(true)
    PartitionedMirror.initialize(whCow, "m", seed, cfg, buckets)
    MorMirror.initialize(whMor, "m", seed, cfg, buckets)

    // batches: uniform keys -> every batch touches all 64 buckets
    def batch(i: Int): DataFrame = payload(
      spark.range(batchRows)
        .select(pmod(hash(col("id") + lit(i.toLong * 7919L)), lit(nRows)).cast("long").as("id"))
        .distinct())
      .withColumn("op", when(pmod(col("id"), lit(10)) === 0, lit("D")).otherwise(lit("U")))
      .withColumn("ts", lit(f"t${i + 1}%03d"))
      .localCheckpoint(true)
    val batches = (0 until nBatches).map(batch)

    var tCow = 0.0; var tMor = 0.0
    batches.zipWithIndex.foreach { case (b, i) =>
      tCow += timed(PartitionedMirror.applyBatch(spark, whCow, "m", b, cfg, buckets))._2
      tMor += timed(MorMirror.appendDelta(whMor, "m", b, batchId = i.toLong))._2
    }

    // read-debt curve: visible-state count with all deltas pending,
    // then after compaction
    val (_, tReadDebt) = timed(MorMirror.read(spark, whMor, "m").count())
    val (_, tCompact) = timed(MorMirror.compact(spark, whMor, "m"))
    val (_, tReadClean) = timed(MorMirror.read(spark, whMor, "m").count())
    val (_, tReadCow) = timed(PartitionedMirror.read(spark, whCow, "m").count())

    // exactness: MOR state == COW state after the full history
    val cow = PartitionedMirror.read(spark, whCow, "m")
      .select("id", "name", "val")
    val mor = MorMirror.read(spark, whMor, "m")
      .select("id", "name", "val")
    val diff = cow.exceptAll(mor).count() + mor.exceptAll(cow).count()
    require(diff == 0, s"MOR and COW diverged by $diff rows")

    val speedup = tCow / tMor
    require(speedup >= 2.0,
      s"MOR append speedup ${speedup}x below 2x over the COW rewrite")

    // Read-cost-vs-tail-length curve (round-11 verdict item 4): how fast
    // does read debt actually grow per pending delta, and what does
    // auto-compaction buy? Small batches (delta-sized, full bucket
    // spread) are appended one by one; read wall-clock is sampled at
    // tail lengths 2/8/16/32, then maybeCompact(threshold=32) must fire
    // and restore base-scan cost. This is the measurement behind the
    // morCompactEvery guidance in SCALE.md.
    val curvePoints = Seq(2, 8, 16, 32)
    val tailSec = scala.collection.mutable.LinkedHashMap[Int, Double]()
    var nextId = nBatches.toLong
    (1 to curvePoints.max).foreach { i =>
      val b = payload(spark.range(batchRows / 10)
          .select(pmod(hash(col("id") + lit(i.toLong * 104729L)), lit(nRows))
            .cast("long").as("id")).distinct())
        .withColumn("op", lit("U"))
        .withColumn("ts", lit(f"t${nBatches + i + 1}%03d"))
        .localCheckpoint(true)
      MorMirror.appendDelta(whMor, "m", b, batchId = nextId); nextId += 1
      if (curvePoints.contains(i))
        tailSec(i) = timed(MorMirror.read(spark, whMor, "m").count())._2
    }
    val fired = MorMirror.maybeCompact(spark, whMor, "m", maxPending = curvePoints.max)
    require(fired, "auto-compact must fire at the threshold")
    val (_, tReadAfterAuto) = timed(MorMirror.read(spark, whMor, "m").count())

    def r(x: Double): Double = math.round(x * 100) / 100.0
    val curveJson = tailSec.map { case (k, v) => s""""$k":${r(v)}""" }
      .mkString("{", ",", "}")
    println(s"""{"harness":"mirror-stress","n_rows":$nRows,"n_batches":$nBatches,""" +
      s""""batch_rows":$batchRows,"buckets":$buckets,""" +
      s""""sec_cow_total":${r(tCow)},"sec_mor_total":${r(tMor)},""" +
      s""""write_speedup":${math.round(speedup * 10) / 10.0},""" +
      s""""sec_read_${nBatches}_deltas":${r(tReadDebt)},""" +
      s""""sec_compact":${r(tCompact)},"sec_read_compacted":${r(tReadClean)},""" +
      s""""sec_read_cow":${r(tReadCow)},""" +
      s""""sec_read_by_tail":$curveJson,""" +
      s""""sec_read_after_auto_compact":${r(tReadAfterAuto)},"states_equal":true}""")
    spark.stop()
  }
}
