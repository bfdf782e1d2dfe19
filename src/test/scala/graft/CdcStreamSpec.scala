package graft

import java.nio.file.{Files, Paths}

import graft.operators.Cdc
import graft.sources.Tables.Warehouse
import graft.streaming.CdcStream

/** Streaming parity: the Structured Streaming auto-load path must produce the
  * same mirror as the batch fold (incremental ≡ batch, SURVEY §7.3 phase 3),
  * must skip excluded files, and must be restartable (checkpoint, T4).
  */
class CdcStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def writeParquet(logs: Seq[DmsGenerator.Log], path: String): Unit =
    logs.toDF().withColumnRenamed("modificationDate", "modification_date")
      .coalesce(1).write.mode("overwrite").parquet(path)

  test("streaming replay equals the generator's expected final state; LOAD* files excluded") {
    val g = DmsGenerator.generate(42L)
    val src = tmpDir("stream-src")
    g.batches.zipWithIndex.foreach { case (b, i) =>
      writeParquet(b, s"$src/dms_logs_${i + 1}.parquet")
    }
    // a decoy initial-load file that must be skipped by the exclusion glob:
    // same schema, bogus content that would corrupt the state if ingested
    writeParquet(Seq(DmsGenerator.Log(1L, "BOGUS", "x", "t", "U",
      "2099-01-01T00:00:00")), s"$src/LOAD00000001.parquet")
    // parquet dirs nest the files; point the stream at the tree root
    val wh = Warehouse(tmpDir("stream-wh"))
    val spec = PipelineSpec(src, "tt_changelog", "tt", CdcConfig("id", "ts"),
      changelogExcludeGlob = "**/LOAD*")

    val q = CdcStream.start(spark, wh, spec, tmpDir("ckpt1"))
    q.awaitTermination() // AvailableNow terminates after draining

    val mirror = Cdc.currentState(wh.read(spark, "tt")).drop("ts")
      .select("id", "name", "modification_date")
      .as[(Long, String, String)].collect().toSet
    assert(mirror === g.expectedFinal.map(r => (r.id, r.name, r.modificationDate)).toSet)
    assert(!mirror.exists(_._2 == "BOGUS"))
  }

  test("streaming replay with the partitioned (bucketed) mirror equals the flat result") {
    val g = DmsGenerator.generate(77L)
    val src = tmpDir("stream-src-pm")
    val ckpt = tmpDir("ckpt-pm")
    val wh = Warehouse(tmpDir("stream-wh-pm"))
    val spec = PipelineSpec(src, "pm_changelog", "pm", CdcConfig("id", "ts"))

    // batch 1 bootstraps the partitioned layout; later files merge into it
    writeParquet(g.batches.head, s"$src/dms_logs_1.parquet")
    val q1 = CdcStream.start(spark, wh, spec, ckpt, mirrorBuckets = Some(8))
    q1.awaitTermination()
    g.batches.tail.zipWithIndex.foreach { case (b, i) =>
      writeParquet(b, s"$src/dms_logs_${i + 2}.parquet")
    }
    val q2 = CdcStream.start(spark, wh, spec, ckpt, mirrorBuckets = Some(8))
    q2.awaitTermination()

    val mirror = graft.plans.PartitionedMirror.read(spark, wh, "pm")
      .select("id", "name", "modification_date")
      .as[(Long, String, String)].collect().toSet
    assert(mirror === g.expectedFinal.map(r => (r.id, r.name, r.modificationDate)).toSet)
    // the mirror directory really is bucket-partitioned
    import scala.jdk.CollectionConverters._
    assert(Files.list(Paths.get(wh.tablePath("pm"))).iterator().asScala
      .exists(_.getFileName.toString.startsWith(graft.plans.PartitionedMirror.BucketCol)))
  }

  test("restart with checkpoint ingests only new files (exactly-once file tracking)") {
    val g = DmsGenerator.generate(9L)
    val src = tmpDir("stream-src2")
    val ckpt = tmpDir("ckpt2")
    val wh = Warehouse(tmpDir("stream-wh2"))
    val spec = PipelineSpec(src, "tt2_changelog", "tt2", CdcConfig("id", "ts"))

    writeParquet(g.batches.head, s"$src/dms_logs_1.parquet")
    val q1 = CdcStream.start(spark, wh, spec, ckpt)
    q1.awaitTermination()
    val afterFirst = wh.read(spark, "tt2_changelog").count()

    g.batches.tail.zipWithIndex.foreach { case (b, i) =>
      writeParquet(b, s"$src/dms_logs_${i + 2}.parquet")
    }
    val q2 = CdcStream.start(spark, wh, spec, ckpt)
    q2.awaitTermination()

    // changelog grew by exactly the new files' rows — batch 1 not re-ingested
    val total = wh.read(spark, "tt2_changelog").count()
    assert(afterFirst === g.batches.head.size.toLong)
    assert(total === g.batches.map(_.size).sum.toLong)

    val mirror = Cdc.currentState(wh.read(spark, "tt2")).drop("ts")
      .select("id", "name", "modification_date")
      .as[(Long, String, String)].collect().toSet
    assert(mirror === g.expectedFinal.map(r => (r.id, r.name, r.modificationDate)).toSet)
  }
}
