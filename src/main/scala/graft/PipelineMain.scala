package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Cdc
import graft.sources.Tables.Warehouse
import graft.streaming.CdcStream

/** CLI entry point — the engine's equivalent of the reference's
  * `batch_bootstrapper.main()` (batch_bootstrapper.py:34-94): for each source
  * prefix, bootstrap the (changelog, mirror) pair and drain available files
  * through the streaming CDC path.
  *
  * Usage: PipelineMain <warehouseDir> <keyCol> <tsCol> <sourceDir> [sourceDir ...]
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PipelineMain <warehouseDir> <keyCol> <tsCol> <sourceDir> [sourceDir ...]")
    val Array(whDir, keyCol, tsCol) = args.take(3)
    val sources = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .appName("graft-cdc-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wh = Warehouse(whDir)
    val cdc = CdcConfig(keyCol, tsCol)
    // per-target fault isolation, same contract as batch_bootstrapper.py:91-94
    sources.foreach { src =>
      try {
        val spec = PipelineSpec.forPrefix(src, cdc)
        println(s"[pipeline] target=$src changelog=${spec.changelogTable} mirror=${spec.mirrorTable}")
        val q = CdcStream.start(spark, wh, spec, s"$whDir/_checkpoints/${spec.mirrorTable}")
        q.awaitTermination()
        val state = Cdc.currentState(wh.read(spark, spec.mirrorTable))
        println(s"[pipeline] mirror=${spec.mirrorTable} rows=${state.count()}")
      } catch {
        case e: Exception =>
          System.err.println(s"[pipeline] target '$src' failed, skipping: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
