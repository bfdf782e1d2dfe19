package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

import graft.operators.Cdc
import graft.sources.Tables.Warehouse
import graft.streaming.CdcStream

/** Beyond-bench-SF stress of the CDC pipeline (the numbers SCALE.md cites):
  * an N-key mirror bootstrapped through the real streaming path, an
  * incremental worst-case change batch, a checkpointed no-op rerun, and the
  * maintained aggregate (IVM) tracking it all — with exact correctness
  * asserts at the end. Run: `sbt "runMain graft.Stress [nKeys] [nChanges]"`
  * (defaults 2M / 150k). Prints one JSON line.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nChanges = if (args.length > 1) args(1).toLong else 150000L
    // the strided change keys are distinct only while nChanges <= n; with
    // wraparound the expected-rows formula below would be wrong
    require(nChanges <= n, s"nChanges ($nChanges) must be <= nKeys ($n)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Harness.session("graft-stress")

    val base = java.nio.file.Files.createTempDirectory("graft-stress").toString
    val src = s"$base/src/test_table"
    import Harness.timed

    // initial load (no CDC envelope), written as a single dash-free FILE —
    // the DMS layout the reference's `**/*-*` mirror glob assumes (Spark's
    // part-*-uuid names would match the exclusion; see the seeding spec)
    val loadStage = s"$base/load-stage"
    spark.range(n).select(col("id"),
        concat(lit("name"), col("id")).as("name"),
        lit("2024-01-01T00:00:00").as("modification_date"))
      .coalesce(1).write.mode("overwrite").parquet(loadStage)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val partFile = java.nio.file.Files.list(java.nio.file.Paths.get(loadStage))
      .iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(partFile, java.nio.file.Paths.get(s"$src/LOAD00000001.parquet"))
    // one worst-case change batch: stride keeps changed keys uniformly
    // spread so EVERY bucket is touched
    val stride = math.max(1L, n / nChanges)
    spark.range(nChanges).select(
        (col("id") * stride % n).as("id"),
        concat(lit("updated_"), col("id")).as("name"),
        lit("2024-01-02T00:00:00").as("modification_date"),
        lit("test_table").as("table"),
        when(pmod(col("id"), lit(10)) === 0, "D").otherwise("U").as("op"),
        concat(lit("2024-01-02T00:00:00."),
          lpad(pmod(col("id"), lit(1000000)).cast("string"), 6, "0")).as("ts"))
      .write.mode("overwrite").parquet(s"$src/dms_logs_1.parquet")
    val nDeletes = (0L until nChanges).count(_ % 10 == 0)

    val cdc = CdcConfig("id", "ts")
    val aggSpec = graft.plans.IncrementalAgg.Spec(pmod(col("id"), lit(64)), length(col("name")))

    // ---- flat mirror + maintained aggregate (IVM) ----
    val wh = Warehouse(s"$base/wh")
    val spec = PipelineSpec.forPrefix(src, cdc)
    val (_, tSeed) = timed {
      graft.plans.Bootstrapper.bootstrapMirrorInitialLoad(spark, wh, spec)
    }
    val (_, tIngest) = timed {
      CdcStream.start(spark, wh, spec, s"$base/ckpt",
        maintainedAggs = Seq("t_agg" -> aggSpec)).awaitTermination()
    }
    val (_, tNoop) = timed {
      CdcStream.start(spark, wh, spec, s"$base/ckpt",
        maintainedAggs = Seq("t_agg" -> aggSpec)).awaitTermination()
    }
    val visible = Cdc.currentState(wh.read(spark, spec.mirrorTable))
    val rows = visible.count()
    require(rows == n - nDeletes, s"expected ${n - nDeletes} rows, got $rows")
    val ((recomputed, maintained), tRecompute) = timed {
      val full = graft.plans.IncrementalAgg.full(visible, aggSpec)
        .collect().map(_.toString).sorted.toSeq
      val got = wh.read(spark, "t_agg")
        .select(col("g"), col("n"), col("s").cast("decimal(28,2)"))
        .collect().map(_.toString).sorted.toSeq
      (full, got)
    }
    require(maintained == recomputed, "maintained aggregate drifted from recompute")

    // ---- partitioned (bucketed) mirror, same data ----
    val wh2 = Warehouse(s"$base/wh2")
    val spec2 = spec.copy(changelogTable = "t2_changelog", mirrorTable = "t2")
    val (_, tPartIngest) = timed {
      CdcStream.start(spark, wh2, spec2, s"$base/ckpt2",
        mirrorBuckets = Some(cpus.toInt * 4)).awaitTermination()
    }
    val rows2 = graft.plans.PartitionedMirror.read(spark, wh2, "t2").count()
    // the partitioned path has no initial-load seeding here: it folds the
    // change batch only (LOAD files are excluded from the changelog), so
    // its row count is the non-deleted changed keys
    require(rows2 > 0, "partitioned mirror empty")

    println(s"""{"n":$n,"changes":$nChanges,"seed_s":${f"$tSeed%.1f"},""" +
      s""""ingest_ivm_s":${f"$tIngest%.1f"},"noop_s":${f"$tNoop%.1f"},""" +
      s""""agg_recompute_s":${f"$tRecompute%.1f"},"part_ingest_s":${f"$tPartIngest%.1f"},""" +
      s""""rows":$rows,"ok":true}""")
    spark.stop()
  }
}
