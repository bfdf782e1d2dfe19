package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{GraftCatalog, Tables}
import graft.sources.Tables.Warehouse

/** The streaming-catalog write's scale envelope, measured: every epoch
  * of `writeStream.toTable` commits a SNAPSHOT whose fast-append carry
  * hard-links the previous version's files — O(epoch data) bytes but
  * O(table files) link operations per epoch (Iceberg's
  * manifest-accumulation shape). MEASURED RESULT: the link pass does
  * NOT bind at realistic counts — per-epoch commit time stays FLAT
  * (~0.25 s) from 8 through 2000+ accumulated files on a local
  * filesystem (links are metadata-only syscalls; on an object store the
  * carry is manifest references, cheaper still — SCALE.md
  * §object-store mapping). What accumulation DOES cost is the read
  * side (footer opens per scan), which is the maintenance tick's job:
  * one `compact` collapses 2001 files to 8 in ~3 s and the stream
  * continues over the compacted snapshot without a pause (the next
  * epoch CAS-retries over the new version). This harness drives the
  * REAL streaming machinery (MemoryStream -> micro-batches -> the V2
  * StreamingWrite) and asserts exactly-once row counts end to end.
  *
  * Run: `sbt "runMain graft.StreamingStress [epochs] [rowsPerEpoch]"`
  * (defaults 60 / 100000). Prints one JSON line.
  */
object StreamingStress {
  def main(args: Array[String]): Unit = {
    val epochs = args.headOption.map(_.toInt).getOrElse(60)
    val rowsPerEpoch = if (args.length > 1) args(1).toLong else 100000L
    val spark = Harness.session("graft-streaming-stress")
    import Harness.timed
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft-ss").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ss-ckpt").toString
    val wh = Warehouse(base)
    spark.conf.set("spark.sql.catalog.gss", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gss.warehouse", base)
    spark.sql("CREATE TABLE gss.sink (id BIGINT, v DOUBLE)")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Long]
    val q = source.toDS()
      .select($"value".as("id"), ($"value" % 97 / 4.0).as("v"))
      .repartition(8) // several files per epoch: the census must GROW
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .toTable("gss.sink")

    def files(): Int = graft.plans.ZoneMap
      .dataFileCensus(spark, wh.snapshotPath("sink")).size

    var next = 0L
    def epoch(): Double = {
      source.addData(next until (next + rowsPerEpoch))
      next += rowsPerEpoch
      timed { q.processAllAvailable() }._2
    }

    val times = (1 to epochs).map(_ => epoch())
    val filesBefore = files()
    val rowsBefore = spark.sql("SELECT count(*) FROM gss.sink").head.getLong(0)
    // the maintenance tick: collapse the accumulated census
    val (_, tCompact) = timed {
      spark.sql("CALL gss.system.compact('sink', 8)").collect()
    }
    val filesAfter = files()
    val tAfterCompact = epoch()
    val rowsFinal = spark.sql("SELECT count(*) FROM gss.sink").head.getLong(0)
    q.stop()
    assert(rowsBefore == epochs * rowsPerEpoch &&
      rowsFinal == (epochs + 1) * rowsPerEpoch,
      s"exactly-once violated: $rowsBefore / $rowsFinal")

    def avg(xs: Seq[Double]) = xs.sum / xs.size
    println(s"""{"metric":"streaming_commit_stress",""" +
      s""""epochs":$epochs,"rows_per_epoch":$rowsPerEpoch,""" +
      s""""epoch_1_5_s":${f"${avg(times.take(5))}%.2f"},""" +
      s""""epoch_mid_s":${f"${avg(times.slice(epochs / 2 - 2, epochs / 2 + 3))}%.2f"},""" +
      s""""epoch_last5_s":${f"${avg(times.takeRight(5))}%.2f"},""" +
      s""""files_before_compact":$filesBefore,""" +
      s""""compact_s":${f"$tCompact%.2f"},"files_after_compact":$filesAfter,""" +
      s""""epoch_after_compact_s":${f"$tAfterCompact%.2f"}}""")
    Tables.deleteRecursively(java.nio.file.Paths.get(base))
    Tables.deleteRecursively(java.nio.file.Paths.get(ckpt))
    spark.stop()
  }
}
