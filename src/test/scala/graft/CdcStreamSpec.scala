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

  test("maintained aggregate tracks the mirror through the stream, incl. restart") {
    import org.apache.spark.sql.functions.{col, length, pmod, lit}
    val g = DmsGenerator.generate(13L)
    val src = tmpDir("stream-src-ivm")
    val ckpt = tmpDir("ckpt-ivm")
    val wh = Warehouse(tmpDir("stream-wh-ivm"))
    val spec = PipelineSpec(src, "mv_changelog", "mv", CdcConfig("id", "ts"))
    val aspec = graft.plans.IncrementalAgg.Spec(pmod(col("id"), lit(4)), length(col("name")))
    val agg = Seq("mv_agg" -> aspec)

    writeParquet(g.batches.head, s"$src/dms_logs_1.parquet")
    CdcStream.start(spark, wh, spec, ckpt, maintainedAggs = agg).awaitTermination()
    // restart with the remaining batches: deltas continue from the checkpoint
    g.batches.tail.zipWithIndex.foreach { case (b, i) =>
      writeParquet(b, s"$src/dms_logs_${i + 2}.parquet")
    }
    CdcStream.start(spark, wh, spec, ckpt, maintainedAggs = agg).awaitTermination()

    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(col("g").cast("long"), col("n"), col("s").cast("decimal(28,2)"))
        .collect().map(_.toString).toSet
    val want = canon(graft.plans.IncrementalAgg.full(
      Cdc.currentState(wh.read(spark, "mv")), aspec))
    assert(canon(wh.read(spark, "mv_agg")) == want,
      "maintained aggregate must equal a recompute of the final mirror")
    assert(Files.exists(Paths.get(wh.snapshotPath("mv_agg"), "_ivm_batch_id")),
      "the batch marker must publish atomically inside the agg version dir")
  }

  test("maintained aggregate + partitioned mirror together: IVM from the touched-bucket delta") {
    import org.apache.spark.sql.functions.{col, length, pmod, lit}
    val g = DmsGenerator.generate(23L)
    val src = tmpDir("stream-src-ivmpm")
    val ckpt = tmpDir("ckpt-ivmpm")
    val wh = Warehouse(tmpDir("stream-wh-ivmpm"))
    val spec = PipelineSpec(src, "pv_changelog", "pv", CdcConfig("id", "ts"))
    val aspec = graft.plans.IncrementalAgg.Spec(pmod(col("id"), lit(4)), length(col("name")))
    val agg = Seq("pv_agg" -> aspec)

    writeParquet(g.batches.head, s"$src/dms_logs_1.parquet")
    CdcStream.start(spark, wh, spec, ckpt,
      mirrorBuckets = Some(8), maintainedAggs = agg).awaitTermination()
    // restart with the remaining batches: deltas continue from the
    // checkpoint, before-states read only the touched buckets
    g.batches.tail.zipWithIndex.foreach { case (b, i) =>
      writeParquet(b, s"$src/dms_logs_${i + 2}.parquet")
    }
    CdcStream.start(spark, wh, spec, ckpt,
      mirrorBuckets = Some(8), maintainedAggs = agg).awaitTermination()

    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(col("g").cast("long"), col("n"), col("s").cast("decimal(28,2)"))
        .collect().map(_.toString).toSet
    val visible = graft.plans.PartitionedMirror.read(spark, wh, "pv")
    assert(canon(wh.read(spark, "pv_agg")) ==
      canon(graft.plans.IncrementalAgg.full(visible, aspec)),
      "maintained aggregate must equal a recompute of the partitioned mirror")
    assert(visible.select("id", "name").as[(Long, String)].collect().toSet ==
      g.expectedFinal.map(r => (r.id, r.name)).toSet)
    // the mirror really took the bucketed layout while aggs were maintained
    assert(graft.plans.PartitionedMirror.storedBuckets(wh, "pv").contains(8))
  }

  test("lost-checkpoint replay: mirror re-merge is idempotent, IVM markers skip double-apply") {
    import org.apache.spark.sql.functions.{col, length, pmod, lit}
    val g = DmsGenerator.generate(31L)
    val src = tmpDir("stream-src-replay")
    val ckpt = tmpDir("ckpt-replay")
    val wh = Warehouse(tmpDir("stream-wh-replay"))
    val spec = PipelineSpec(src, "rp_changelog", "rp", CdcConfig("id", "ts"))
    val aspec = graft.plans.IncrementalAgg.Spec(pmod(col("id"), lit(4)), length(col("name")))
    val aggs = Seq("rp_agg" -> aspec)
    g.batches.zipWithIndex.foreach { case (b, i) =>
      writeParquet(b, s"$src/dms_logs_${i + 1}.parquet")
    }
    CdcStream.start(spark, wh, spec, ckpt, maintainedAggs = aggs).awaitTermination()
    def snap() = (
      Cdc.currentState(wh.read(spark, "rp")).drop("ts")
        .select("id", "name").as[(Long, String)].collect().toSet,
      wh.read(spark, "rp_agg").select(col("g").cast("long"), col("n"),
        col("s").cast("decimal(28,2)")).collect().map(_.toString).sorted.toSeq)
    val (mirror1, agg1) = snap()
    // simulate total checkpoint loss: the worst at-least-once case — every
    // batch replays from scratch against the already-committed warehouse
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    CdcStream.start(spark, wh, spec, ckpt, maintainedAggs = aggs).awaitTermination()
    val (mirror2, agg2) = snap()
    assert(mirror2 == mirror1, "mirror re-merge must be idempotent under full replay")
    assert(agg2 == agg1, "replay with no new data must leave the aggregate unchanged")
    assert(mirror1 == g.expectedFinal.map(r => (r.id, r.name)).toSet
      .map((t: (Long, String)) => t))

    // checkpoint lost AGAIN and a genuinely NEW change arrives: the replay
    // batch (old + new files under restarted batch ids) must still land
    // the new change in BOTH the mirror and the maintained aggregate —
    // a stale cross-lineage marker would silently skip the agg delta
    writeParquet(Seq(DmsGenerator.Log(9991L, "fresh-after-loss", "m9", "t", "I",
      "2024-12-31T00:00:00")), s"$src/dms_logs_99.parquet")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    CdcStream.start(spark, wh, spec, ckpt, maintainedAggs = aggs).awaitTermination()
    val (mirror3, agg3) = snap()
    assert(mirror3.contains((9991L, "fresh-after-loss")))
    val want3 = graft.plans.IncrementalAgg.full(
        Cdc.currentState(wh.read(spark, "rp")), aspec)
      .select(col("g").cast("long"), col("n"), col("s").cast("decimal(28,2)"))
      .collect().map(_.toString).sorted.toSeq
    assert(agg3 == want3,
      "new data in a replayed lineage must reach the maintained aggregate")
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

  test("seeded (versioned flat) mirror migrates cleanly into the bucketed layout") {
    import scala.jdk.CollectionConverters._
    val src = tmpDir("stream-src-mig")
    val wh = Warehouse(tmpDir("stream-wh-mig"))
    val spec = PipelineSpec(src, "sm_changelog", "sm", CdcConfig("id", "ts"))
    // seed the mirror the way bootstrapMirrorInitialLoad does: a VERSIONED
    // flat table behind a pointer symlink
    wh.overwrite(Cdc.withIngestSeq(
      Seq((1L, "load1", "m0"), (2L, "load2", "m0"))
        .toDF("id", "name", "modification_date")), "sm")
    assert(Files.isSymbolicLink(Paths.get(wh.tablePath("sm"))))
    writeParquet(Seq(DmsGenerator.Log(1L, "changed", "m1", "t", "U", "2024-01-02T00:00:00")),
      s"$src/dms_logs_1.parquet")
    CdcStream.start(spark, wh, spec, tmpDir("ckpt-mig"), mirrorBuckets = Some(4))
      .awaitTermination()
    // pointer layout fully dissolved: real dir, bucket subdirs, no orphans
    assert(!Files.isSymbolicLink(Paths.get(wh.tablePath("sm"))))
    assert(Files.list(Paths.get(wh.tablePath("sm"))).iterator().asScala
      .exists(_.getFileName.toString.startsWith("_kb=")))
    assert(!Files.list(Paths.get(wh.root)).iterator().asScala
      .exists(_.getFileName.toString.matches("sm\\.v\\d+")),
      "stale version dirs must not survive the migration")
    assert(graft.plans.PartitionedMirror.storedBuckets(wh, "sm").contains(4))
    val state = graft.plans.PartitionedMirror.read(spark, wh, "sm")
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(state == Map(1L -> "changed", 2L -> "load2"))
    // a maintenance commit on the migrated table must not wedge
    graft.plans.Maintenance.compact(spark, wh, "sm", targetFiles = 2)
    val after = graft.plans.PartitionedMirror.read(spark, wh, "sm")
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(after == state)
  }

  test("streaming replay with the merge-on-read mirror equals the flat result") {
    val g = DmsGenerator.generate(91L)
    val src = tmpDir("stream-src-mor")
    val ckpt = tmpDir("ckpt-mor")
    val wh = Warehouse(tmpDir("stream-wh-mor"))
    val spec = PipelineSpec(src, "mor_changelog", "mor", CdcConfig("id", "ts"))

    // one file per micro-batch: batch 1 initializes the MOR layout, every
    // later batch must land as an O(delta) delta file
    g.batches.zipWithIndex.foreach { case (b, i) =>
      writeParquet(b, s"$src/dms_logs_${i + 1}.parquet")
    }
    CdcStream.start(spark, wh, spec, ckpt, mirrorBuckets = Some(8),
      mirrorMor = true, maxFilesPerTrigger = Some(1)).awaitTermination()

    assert(graft.plans.MorMirror.storedConfig(wh, "mor")
      .contains((CdcConfig("id", "ts"), 8)))
    val mirror = graft.plans.MorMirror.read(spark, wh, "mor")
      .select("id", "name", "modification_date")
      .as[(Long, String, String)].collect().toSet
    assert(mirror === g.expectedFinal.map(r => (r.id, r.name, r.modificationDate)).toSet)
    // deltas really accumulated (no bucket rewrites happened per batch)
    assert(graft.plans.MorMirror.pendingDeltas(wh, "mor") == g.batches.size - 1,
      "every post-init batch must be a delta commit, not a base rewrite")
    // a restart with no new files is a checkpointed no-op
    CdcStream.start(spark, wh, spec, ckpt, mirrorBuckets = Some(8),
      mirrorMor = true, maxFilesPerTrigger = Some(1)).awaitTermination()
    assert(graft.plans.MorMirror.pendingDeltas(wh, "mor") == g.batches.size - 1)
  }

  test("MOR compaction triggers mid-stream at the delta threshold and preserves state") {
    val g = DmsGenerator.generate(92L)
    val src = tmpDir("stream-src-morc")
    val wh = Warehouse(tmpDir("stream-wh-morc"))
    val spec = PipelineSpec(src, "morc_changelog", "morc", CdcConfig("id", "ts"))
    g.batches.zipWithIndex.foreach { case (b, i) =>
      writeParquet(b, s"$src/dms_logs_${i + 1}.parquet")
    }
    CdcStream.start(spark, wh, spec, tmpDir("ckpt-morc"), mirrorBuckets = Some(8),
      mirrorMor = true, maxFilesPerTrigger = Some(1),
      morCompactEvery = 2).awaitTermination()
    assert(graft.plans.MorMirror.pendingDeltas(wh, "morc") < 2,
      "the delta-count policy must have folded the debt")
    val mirror = graft.plans.MorMirror.read(spark, wh, "morc")
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(mirror === g.expectedFinal.map(r => (r.id, r.name)).toSet)
  }

  test("seeded (versioned flat) mirror migrates into the MOR layout; stored COW layout wins over the flag") {
    import scala.jdk.CollectionConverters._
    val src = tmpDir("stream-src-mormig")
    val wh = Warehouse(tmpDir("stream-wh-mormig"))
    val spec = PipelineSpec(src, "morm_changelog", "morm", CdcConfig("id", "ts"))
    wh.overwrite(Cdc.withIngestSeq(
      Seq((1L, "load1", "m0"), (2L, "load2", "m0"))
        .toDF("id", "name", "modification_date")), "morm")
    writeParquet(Seq(DmsGenerator.Log(1L, "changed", "m1", "t", "U", "2024-01-02T00:00:00")),
      s"$src/dms_logs_1.parquet")
    CdcStream.start(spark, wh, spec, tmpDir("ckpt-mormig"),
      mirrorBuckets = Some(4), mirrorMor = true).awaitTermination()
    assert(!Files.isSymbolicLink(Paths.get(wh.tablePath("morm"))),
      "the flat pointer layout must be dissolved by the MOR migration")
    assert(!Files.list(Paths.get(wh.root)).iterator().asScala
      .exists(_.getFileName.toString.matches("morm\\.v\\d+")),
      "stale version dirs must not survive the migration")
    assert(graft.plans.MorMirror.storedConfig(wh, "morm").isDefined)
    val state = graft.plans.MorMirror.read(spark, wh, "morm")
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(state == Map(1L -> "changed", 2L -> "load2"),
      "LOAD-seeded keys must survive; changed keys must supersede")

    // stored-layout-wins: a COW bucketed table streamed with mirrorMor=true
    // stays COW — no deltas directory ever appears
    val src2 = tmpDir("stream-src-coww")
    val spec2 = PipelineSpec(src2, "coww_changelog", "coww", CdcConfig("id", "ts"))
    writeParquet(Seq(DmsGenerator.Log(5L, "a", "m1", "t", "U", "2024-01-01T00:00:00")),
      s"$src2/dms_logs_1.parquet")
    CdcStream.start(spark, wh, spec2, tmpDir("ckpt-coww1"),
      mirrorBuckets = Some(4)).awaitTermination()
    assert(graft.plans.PartitionedMirror.storedBuckets(wh, "coww").contains(4))
    writeParquet(Seq(DmsGenerator.Log(6L, "b", "m2", "t", "U", "2024-01-02T00:00:00")),
      s"$src2/dms_logs_2.parquet")
    CdcStream.start(spark, wh, spec2, tmpDir("ckpt-coww1"),
      mirrorBuckets = Some(4), mirrorMor = true).awaitTermination()
    assert(!Files.isDirectory(Paths.get(wh.tablePath("coww"), "deltas")),
      "an existing COW layout must win over the mirrorMor flag")
    assert(graft.plans.PartitionedMirror.read(spark, wh, "coww")
      .select("id", "name").as[(Long, String)].collect().toSet ==
      Set((5L, "a"), (6L, "b")))
  }

  test("maintained aggregate + MOR mirror: IVM from the bucket-pruned merge-on-read before-state") {
    import org.apache.spark.sql.functions.{col, length, pmod, lit}
    val g = DmsGenerator.generate(29L)
    val src = tmpDir("stream-src-ivmmor")
    val ckpt = tmpDir("ckpt-ivmmor")
    val wh = Warehouse(tmpDir("stream-wh-ivmmor"))
    val spec = PipelineSpec(src, "mvr_changelog", "mvr", CdcConfig("id", "ts"))
    val aspec = graft.plans.IncrementalAgg.Spec(pmod(col("id"), lit(4)), length(col("name")))
    val agg = Seq("mvr_agg" -> aspec)

    writeParquet(g.batches.head, s"$src/dms_logs_1.parquet")
    CdcStream.start(spark, wh, spec, ckpt, mirrorBuckets = Some(8),
      mirrorMor = true, maintainedAggs = agg).awaitTermination()
    g.batches.tail.zipWithIndex.foreach { case (b, i) =>
      writeParquet(b, s"$src/dms_logs_${i + 2}.parquet")
    }
    CdcStream.start(spark, wh, spec, ckpt, mirrorBuckets = Some(8),
      mirrorMor = true, maintainedAggs = agg).awaitTermination()

    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(col("g").cast("long"), col("n"), col("s").cast("decimal(28,2)"))
        .collect().map(_.toString).toSet
    val visible = graft.plans.MorMirror.read(spark, wh, "mvr")
    assert(canon(wh.read(spark, "mvr_agg")) ==
      canon(graft.plans.IncrementalAgg.full(visible, aspec)),
      "maintained aggregate must equal a recompute of the MOR mirror")
    assert(visible.select("id", "name").as[(Long, String)].collect().toSet ==
      g.expectedFinal.map(r => (r.id, r.name)).toSet)
  }

  test("initial-load seeding: LOAD-only keys survive, changed keys are superseded") {
    val src = tmpDir("stream-src-seed")
    val wh = Warehouse(tmpDir("stream-wh-seed"))
    val spec = PipelineSpec(src, "sd_changelog", "sd", CdcConfig("id", "ts"))
    // DMS initial load: bare data schema, NO CDC envelope — written as a
    // single dash-free FILE (the DMS layout; Spark's part-*-uuid names
    // would themselves match the mirror's `**/*-*` exclusion glob)
    val tmp = tmpDir("load-stage")
    Seq((1L, "load1", "m0"), (2L, "load2", "m0"))
      .toDF("id", "name", "modification_date")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator()
    val partFile = {
      import scala.jdk.CollectionConverters._
      try part.asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      finally () // stream closed with the JVM; single test-scoped use
    }
    Files.createDirectories(Paths.get(src))
    Files.move(partFile, Paths.get(s"$src/LOAD00000001.parquet"))
    // change stream: update key 1 only
    writeParquet(Seq(DmsGenerator.Log(1L, "changed", "m1", "t", "U", "2024-01-02T00:00:00")),
      s"$src/dms_logs_1.parquet")

    assert(graft.plans.Bootstrapper.bootstrapMirrorInitialLoad(spark, wh, spec))
    CdcStream.start(spark, wh, spec, tmpDir("ckpt-seed")).awaitTermination()

    val state = Cdc.currentState(wh.read(spark, "sd"))
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(state == Map(1L -> "changed", 2L -> "load2"),
      s"LOAD row without changes must survive; changed key must supersede: $state")
    // idempotent: a second seeding attempt is a no-op
    assert(!graft.plans.Bootstrapper.bootstrapMirrorInitialLoad(spark, wh, spec))
  }

  test("csv pipeline seeds the mirror from csv LOAD* files (format-aware bootstrap)") {
    val src = tmpDir("stream-src-csvload")
    val wh = Warehouse(tmpDir("stream-wh-csvload"))
    val spec = PipelineSpec(src, "cl_changelog", "cl", CdcConfig("id", "ts"),
      format = "csv")
    // DMS csv initial load: bare schema, dash-free single file
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$src/LOAD00000001.csv"),
      "id,name,modification_date\n1,load1,m0\n2,load2,m0\n".getBytes)
    spark.createDataFrame(Seq((1L, "changed", "m1", "t", "U", "2024-01-02T00:00:00")))
      .toDF("id", "name", "modification_date", "table", "op", "ts")
      .coalesce(1).write.option("header", "true").csv(s"$src/dms_logs_1.csv")

    assert(graft.plans.Bootstrapper.bootstrapMirrorInitialLoad(spark, wh, spec))
    CdcStream.start(spark, wh, spec, tmpDir("ckpt-csvload")).awaitTermination()
    val state = Cdc.currentState(wh.read(spark, "cl"))
      .selectExpr("CAST(id AS LONG)", "name").as[(Long, String)].collect().toMap
    assert(state == Map(1L -> "changed", 2L -> "load2"),
      s"csv LOAD seeding must work like parquet seeding: $state")
  }

  test("json-format changelog source replays to the same final state") {
    val g = DmsGenerator.generate(55L)
    val src = tmpDir("stream-src-json")
    g.batches.zipWithIndex.foreach { case (b, i) =>
      b.toDF().withColumnRenamed("modificationDate", "modification_date")
        .coalesce(1).write.mode("overwrite").json(s"$src/dms_logs_${i + 1}.json")
    }
    val wh = Warehouse(tmpDir("stream-wh-json"))
    val spec = PipelineSpec(src, "js_changelog", "js", CdcConfig("id", "ts"),
      format = "json")
    CdcStream.start(spark, wh, spec, tmpDir("ckpt-json")).awaitTermination()
    val mirror = Cdc.currentState(wh.read(spark, "js")).drop("ts")
      .select("id", "name", "modification_date")
      .as[(Long, String, String)].collect().toSet
    assert(mirror === g.expectedFinal.map(r => (r.id, r.name, r.modificationDate)).toSet)
  }

  test("csv-format changelog source replays to the same final state; stray files ignored") {
    val g = DmsGenerator.generate(66L)
    val src = tmpDir("stream-src-csv")
    g.batches.zipWithIndex.foreach { case (b, i) =>
      b.toDF().withColumnRenamed("modificationDate", "modification_date")
        .coalesce(1).write.option("header", "true")
        .mode("overwrite").csv(s"$src/dms_logs_${i + 1}.csv")
    }
    // a stray parquet file must not confuse csv schema pinning
    Seq((1L, "stray")).toDF("a", "b").coalesce(1)
      .write.mode("overwrite").parquet(s"$src/stray.parquet")
    val wh = Warehouse(tmpDir("stream-wh-csv"))
    val spec = PipelineSpec(src, "cv_changelog", "cv", CdcConfig("id", "ts"),
      format = "csv")
    CdcStream.start(spark, wh, spec, tmpDir("ckpt-csv")).awaitTermination()
    // csv inference types the ISO strings as timestamps (same ordering,
    // different rendering) — normalize back to ISO for the compare
    val mirror = Cdc.currentState(wh.read(spark, "cv")).drop("ts")
      .selectExpr("CAST(id AS LONG)", "name",
        "date_format(modification_date, \"yyyy-MM-dd'T'HH:mm:ss.SSSSSS\")")
      .as[(Long, String, String)].collect().toSet
    assert(mirror === g.expectedFinal.map(r => (r.id, r.name, r.modificationDate)).toSet)
  }

  test("continuous tailing (ProcessingTime trigger) picks up files as they land") {
    val src = tmpDir("stream-src-cont")
    val wh = Warehouse(tmpDir("stream-wh-cont"))
    val spec = PipelineSpec(src, "ct_changelog", "ct", CdcConfig("id", "ts"))
    writeParquet(Seq(DmsGenerator.Log(1L, "first", "m1", "t", "I", "2024-01-01T00:00:00")),
      s"$src/dms_logs_1.parquet")
    val q = CdcStream.start(spark, wh, spec, tmpDir("ckpt-cont"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
    try {
      def mirrorIds(): Set[Long] =
        // overwrites are atomic versioned commits (Warehouse.commit): a
        // concurrent read must NEVER fail or see a half-written table, so
        // no exception tolerance here — a throw is a real atomicity bug
        if (!wh.exists("ct")) Set.empty
        else Cdc.currentState(wh.read(spark, "ct")).select("id")
          .as[Long].collect().toSet
      def await(expect: Set[Long]): Unit = {
        val deadline = System.nanoTime() + 30L * 1000000000L
        while (mirrorIds() != expect && System.nanoTime() < deadline) Thread.sleep(250)
        assert(mirrorIds() == expect, s"timed out waiting for $expect, got ${mirrorIds()}")
      }
      await(Set(1L))
      // a new file lands while the query keeps running
      writeParquet(Seq(DmsGenerator.Log(2L, "second", "m2", "t", "I", "2024-01-01T00:00:01")),
        s"$src/dms_logs_2.parquet")
      await(Set(1L, 2L))
    } finally q.stop()
  }

  test("exclusion glob predicate: segment spans, directory tails, unsupported shapes") {
    def excluded(glob: String, src: String, paths: String*): Seq[Boolean] = {
      val df = paths.toSeq.toDF("_src_file")
      val p = CdcStream.excludePredicate(glob, src)
      df.select(p).collect().map(_.getBoolean(0)).toSeq
    }
    assert(excluded("**/LOAD*", "/data/t",
      "/data/t/LOAD00000001.parquet",              // plain DMS file
      "/data/t/LOAD0001.parquet/part-0-x.parquet", // writer-wrapped dir
      "/data/t/dms_logs_1.parquet",                // change file: kept
      "/data/t/RELOADED/f.parquet"                 // LOAD not a full segment prefix... RELOADED != LOAD*
    ) == Seq(true, true, false, false))
    assert(excluded("**/*-*", "/data/t",
      "/data/t/2024-01-01.parquet",                // dash: excluded
      "/data/t/LOAD0001.parquet") == Seq(true, false))
    assert(excluded("**/init/LOAD*", "/data/t",
      "/data/t/init/LOAD1.parquet",                // directory-component tail
      "/data/t/other/LOAD1.parquet") == Seq(true, false))
    // prefix-relative: a parent directory of the monitored prefix matching
    // the tail must not exclude anything (glob semantics are relative to
    // the prefix, like the listing side)
    assert(excluded("**/LOAD*", "/mnt/LOADER/t",
      "file:///mnt/LOADER/t/dms_logs_1.parquet",   // kept: LOADER is above the prefix
      "file:///mnt/LOADER/t/LOAD001.parquet",      // excluded: below the prefix
      "/mnt/LOADER/t/sub/LOAD001.parquet"          // excluded: nested below the prefix
    ) == Seq(false, true, true))
    // scheme-qualified and trailing-slash source configs normalize the same
    assert(excluded("**/LOAD*", "file:///mnt/LOADER/t/",
      "file:///mnt/LOADER/t/dms_logs_1.parquet",
      "file:///mnt/LOADER/t/LOAD001.parquet") == Seq(false, true))
    intercept[IllegalArgumentException](CdcStream.excludePredicate("LOAD*", "/data/t"))
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

  test("NON-additive evolution mid-stream: declared rename + numeric widening land after restart") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def batch1 = Seq((1L, "a", 10, "I", "t1"), (2L, "b", 20, "I", "t1"))
      .toDF("id", "name", "v", "op", "ts")
    def batch2 = Seq((1L, "a2", 100L, "U", "t2"), (3L, "c", 30L, "I", "t2"))
      .toDF("id", "full_name", "v", "op", "ts")
    val expected = Set((1L, "a2", 100L), (2L, "b", 20L), (3L, "c", 30L))

    for ((tag, mor) <- Seq(("flat", false), ("mor", true))) {
      val src = tmpDir(s"stream-src-nonadd-$tag")
      val ckpt = tmpDir(s"ckpt-nonadd-$tag")
      val wh = Warehouse(tmpDir(s"stream-wh-nonadd-$tag"))
      val spec = PipelineSpec(src, s"t9_changelog", "t9", CdcConfig("id", "ts"))
      batch1.coalesce(1).write.parquet(s"$src/dms_logs_1.parquet")
      CdcStream.start(spark, wh, spec, ckpt,
        mirrorBuckets = if (mor) Some(8) else None, mirrorMor = mor)
        .awaitTermination()
      // upstream renames name->full_name (DECLARED — the operator's
      // ALTER, never guessed) and widens v int->bigint (structural);
      // restart inference must fall back past CANNOT_MERGE_SCHEMAS
      graft.sources.SchemaEvolution.declareRename(wh, "t9", "name", "full_name")
      batch2.coalesce(1).write.parquet(s"$src/dms_logs_2.parquet")
      CdcStream.start(spark, wh, spec, ckpt,
        mirrorBuckets = if (mor) Some(8) else None, mirrorMor = mor)
        .awaitTermination()

      val mirror =
        if (mor) graft.plans.MorMirror.read(spark, wh, "t9")
        else Cdc.currentState(graft.sources.SchemaEvolution.normalize(
          wh.read(spark, "t9", mergeSchema = true), wh, "t9"))
      assert(!mirror.columns.contains("name"),
        s"[$tag] the renamed column must rejoin its history, not fork")
      val got = mirror.select(col("id"), col("full_name"), col("v").cast("long"))
        .as[(Long, String, Long)].collect().toSet
      assert(got === expected, s"[$tag] got $got")
      // the changelog keeps the RAW history (both epochs' shapes)
      val ch = graft.sources.SchemaEvolution.readWidened(spark,
        Seq(s"${wh.tablePath("t9_changelog")}/batch_0",
          s"${wh.tablePath("t9_changelog")}/batch_1"))
      assert(ch.columns.contains("name") && ch.columns.contains("full_name"),
        s"[$tag] the changelog is the raw historical record")
    }
  }

  test("schema evolution mid-stream: a column added in a later batch lands after restart") {
    import org.apache.spark.sql.functions._
    val g = DmsGenerator.generate(31L)
    val src = tmpDir("stream-src-evolve")
    val ckpt = tmpDir("ckpt-evolve")
    val wh = Warehouse(tmpDir("stream-wh-evolve"))
    val spec = PipelineSpec(src, "tt3_changelog", "tt3", CdcConfig("id", "ts"))

    writeParquet(g.batches.head, s"$src/dms_logs_1.parquet")
    CdcStream.start(spark, wh, spec, ckpt).awaitTermination()

    // the upstream source evolves: batch 2 carries a new `email` column
    g.batches(1).toDF().withColumnRenamed("modificationDate", "modification_date")
      .withColumn("email", concat(lit("u"), col("id"), lit("@example.com")))
      .coalesce(1).write.mode("overwrite").parquet(s"$src/dms_logs_2.parquet")
    CdcStream.start(spark, wh, spec, ckpt).awaitTermination()

    // changelog: evolved column present, old batch null-backfilled
    val ch = wh.read(spark, "tt3_changelog", mergeSchema = true)
    assert(ch.columns.contains("email"),
      s"restart must pick up the widened schema, got ${ch.columns.toSeq}")
    assert(ch.filter(col("email").isNotNull).count() === g.batches(1).size.toLong)
    assert(ch.filter(col("email").isNull).count() === g.batches.head.size.toLong)

    // mirror: latest-wins fold of batches 1-2 with email on batch-2 winners
    val batch2Ts = g.batches(1).map(_.ts).toSet
    val expected = g.batches.take(2).flatten.groupBy(_.id).flatMap { case (id, logs) =>
      val last = logs.maxBy(_.ts)
      if (last.op == "D") None
      else Some((id, last.name,
        if (batch2Ts.contains(last.ts)) s"u$id@example.com" else null))
    }.toSet
    val mirror = Cdc.currentState(wh.read(spark, "tt3", mergeSchema = true))
      .select("id", "name", "email")
      .as[(Long, String, String)].collect().toSet
    assert(mirror === expected,
      s"first diffs: ${(mirror -- expected).take(3)} / ${(expected -- mirror).take(3)}")
  }

  test("COMPOSITE-key streaming ingest (cdc.key-column = sid,oid): incremental == batch fold, MOR mirror buckets the tuple") {
    import org.apache.spark.sql.functions.col
    // a compound-PK junction-table changelog: neither column alone
    // identifies a row
    def batch(rows: Seq[(Long, Long, String, String, String)], path: String) =
      rows.toDF("sid", "oid", "name", "op", "ts")
        .coalesce(1).write.mode("overwrite").parquet(path)
    val src = tmpDir("stream-comp-src")
    batch(Seq(
      (1L, 1L, "a", "I", "2024-01-01T00:00:01"),
      (1L, 2L, "b", "I", "2024-01-01T00:00:01"),
      (2L, 1L, "c", "I", "2024-01-01T00:00:01"),
      (2L, 2L, "d", "I", "2024-01-01T00:00:01")),
      s"$src/dms_logs_1.parquet")
    batch(Seq(
      (1L, 1L, "a2", "U", "2024-01-01T00:00:02"), // update ONE tuple
      (1L, 2L, "x", "D", "2024-01-01T00:00:02"),  // delete a sibling
      (3L, 1L, "e", "I", "2024-01-01T00:00:02")),
      s"$src/dms_logs_2.parquet")
    val cfg = CdcConfig("sid,oid", "ts")
    val wh = Warehouse(tmpDir("stream-comp-wh"))
    val spec = PipelineSpec(src, "ct_changelog", "ct", cfg)
    // MOR mirror: delta batches bucket on the TUPLE hash
    val q = CdcStream.start(spark, wh, spec, tmpDir("ckpt-comp"),
      mirrorBuckets = Some(4), mirrorMor = true)
    q.awaitTermination()
    val expect = Set((1L, 1L, "a2"), (2L, 1L, "c"), (2L, 2L, "d"),
      (3L, 1L, "e"))
    val mirror = Cdc.currentState(
      graft.plans.MorMirror.read(spark, wh, "ct"))
      .select("sid", "oid", "name")
      .as[(Long, Long, String)].collect().toSet
    assert(mirror === expect, s"got $mirror")
    // a third batch streams incrementally; a late tuple-update older
    // than the stored row loses, a newer sibling-delete wins
    batch(Seq(
      (1L, 1L, "stale", "U", "2024-01-01T00:00:00"),
      (2L, 2L, "x", "D", "2024-01-01T00:00:03")),
      s"$src/dms_logs_3.parquet")
    val q2 = CdcStream.start(spark, wh, spec, tmpDir("ckpt-comp2"))
    q2.awaitTermination()
    // fresh checkpoint replays everything — the fold is idempotent and
    // order-insensitive per tuple
    val after = Cdc.currentState(
      graft.plans.MorMirror.read(spark, wh, "ct"))
      .select("sid", "oid", "name")
      .as[(Long, Long, String)].collect().toSet
    assert(after === Set((1L, 1L, "a2"), (2L, 1L, "c"), (3L, 1L, "e")),
      s"got $after")
    // and the batch fold of the whole changelog agrees (incremental ==
    // batch, the §7.3 parity contract, on the composite key)
    val all = spark.read.option("recursiveFileLookup", "true").parquet(src)
    val batchFold = Cdc.applyAll(all, cfg)
      .select("sid", "oid", "name")
      .as[(Long, Long, String)].collect().toSet
    assert(batchFold === after)
  }
}
