package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.plans.{IncrementalAgg, Maintenance, MirrorChangelog}
import graft.sources.Tables
import graft.sources.Tables.{TableProps, Warehouse}

/** Round-12 storage-contract specs: the five advice findings, each pinned
  * by the scenario the advisor described — pre-marker history surviving
  * an upgrade, a compacted feed failing loudly instead of going stale,
  * scheduled projection refreshes honoring the declared columns,
  * path-scoped snapshot-race classification, and legacy-migration marker
  * carry.
  */
class Round12OpsSpec extends SparkTestBase {

  test("pre-marker retained history is grandfathered: visible, time-travelable, never orphaned, stamped on next commit") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("gf-legacy"), retain = 6)
    (1 to 3).foreach(v =>
      wh.overwrite(Seq((v.toLong, s"v$v")).toDF("id", "name"), "t"))
    // simulate a warehouse written by PRE-MARKER code: no `_published`
    // stamps anywhere (the sibling `.stage` markers are already gone —
    // publication removes them, and pre-marker code never wrote any)
    (1L to 3L).foreach { v =>
      Files.deleteIfExists(Paths.get(s"${wh.tablePath("t")}.v$v", "_published"))
      Files.deleteIfExists(Tables.stageMarkerPath(
        Paths.get(s"${wh.tablePath("t")}.v$v")))
    }
    // grandfathered: all three versions stay listed and readable
    assert(wh.listVersions("t") == Seq(1L, 2L, 3L),
      "pre-marker snapshots must remain visible after upgrade")
    assert(wh.readVersion(spark, "t", 1L).select("name")
      .as[String].collect().toSeq == Seq("v1"))
    // and NEVER classified as orphan stages — a zero-age sweep must not
    // touch them (before the fix this deleted the whole retained history)
    val swept = Maintenance.removeOrphans(wh, "t", olderThanMs = 0L)
    assert(!swept.exists(_.contains("t.v")),
      s"grandfathered history must not be swept: $swept")
    assert(wh.listVersions("t") == Seq(1L, 2L, 3L))
    // the first post-upgrade commit stamps the whole history durably
    wh.overwrite(Seq((4L, "v4")).toDF("id", "name"), "t")
    (1L to 4L).foreach { v =>
      assert(Files.exists(Paths.get(s"${wh.tablePath("t")}.v$v", "_published")),
        s"v$v must carry a durable publication stamp after the next commit")
    }
  }

  test("a live rival's overtaken stage keeps its .stage sibling: not grandfathered, not stamped, sibling swept with the stage") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("gf-rival"))
    wh.overwrite(Seq((1L, "v1")).toDF("id", "name"), "t")
    // rival allocates v2 exactly as commit() does: dir + sibling marker
    val stage = Paths.get(s"${wh.tablePath("t")}.v2")
    Files.createDirectories(stage)
    Files.writeString(Tables.stageMarkerPath(stage), "")
    Files.writeString(stage.resolve("part-mid.parquet"), "mid-write")
    wh.overwrite(Seq((3L, "v3")).toDF("id", "name"), "t") // overtakes at v3
    assert(wh.listVersions("t") == Seq(1L, 3L),
      "a sibling-marked stage below current is NOT pre-marker history")
    assert(!Files.exists(stage.resolve("_published")),
      "the grandfather stamp must skip sibling-marked stages")
    // once the rival is provably dead (aged), the sweep takes the stage
    // AND its sibling marker
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 120000)
    Files.setLastModifiedTime(stage, old)
    Files.setLastModifiedTime(stage.resolve("part-mid.parquet"), old)
    Files.setLastModifiedTime(Tables.stageMarkerPath(stage), old)
    Maintenance.removeOrphans(wh, "t", olderThanMs = 60000L)
    assert(!Files.exists(stage), "aged crashed stage is swept")
    assert(!Files.exists(Tables.stageMarkerPath(stage)),
      "the orphaned sibling marker is swept with it")
  }

  test("maintainAggregate fails loudly when pending hop subdirs vanished (compacted feed), not silently stale") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("feed-compacted"), retain = 6)
    val spec = IncrementalAgg.Spec(col("cat"), col("v"))
    wh.overwrite(Seq((1L, "a", 1.0)).toDF("id", "cat", "v"), "m")
    MirrorChangelog.maintainAggregate(spark, wh, "m", "feed", "agg", "id", spec)
    wh.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "cat", "v"), "m")
    MirrorChangelog.maintainAggregate(spark, wh, "m", "feed", "agg", "id", spec)
    // feed table gets (illegally) compacted: the per-hop batch subdirs
    // that future consumers depend on are flattened away
    wh.overwrite(Seq((2L, "b", 9.0), (3L, "c", 1.0)).toDF("id", "cat", "v"), "m")
    MirrorChangelog.emitPending(spark, wh, "m", "feed", "id")
    val feedDir = Paths.get(wh.tablePath("feed"))
    val s = Files.list(feedDir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.getFileName.toString.startsWith("batch_"))
        .toSeq.foreach(Tables.deleteRecursively)
    } finally s.close()
    val e = intercept[IllegalStateException] {
      MirrorChangelog.maintainAggregate(spark, wh, "m", "feed", "agg", "id", spec)
    }
    assert(e.getMessage.contains("compacted"),
      s"the error must name the operator remedy: ${e.getMessage}")
  }

  test("scheduled projection refresh honors the declared column projection (projection.cols persisted)") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("proj-cols"))
    wh.overwrite(Seq((1L, "a", 1.0, "x"), (2L, "b", 2.0, "y"))
      .toDF("id", "cat", "v", "op"), "src")
    assert(Maintenance.materializeProjection(spark, wh, "src", "proj",
      dims = Seq("id"), cols = Seq("id", "cat", "v")))
    assert(wh.read(spark, "proj").columns.toSet == Set("id", "cat", "v"))
    assert(TableProps.read(wh, "proj")
      .get(Maintenance.ProjectionColsProp).contains("id,cat,v"),
      "the declared projection must be persisted in the table props")
    // source changes; the SCHEDULED maintenance tick (no explicit cols
    // from any caller) refreshes — before the fix this silently widened
    // the schema back to all four source columns
    wh.overwrite(Seq((1L, "a", 5.0, "x"), (3L, "c", 3.0, "z"))
      .toDF("id", "cat", "v", "op"), "src")
    val failed = MaintenanceMain.run(spark, wh, Seq("proj"),
      targetFiles = 4, tombstoneHorizon = None,
      orphanAgeMs = 24L * 3600 * 1000)
    assert(failed.isEmpty, s"maintenance must succeed: $failed")
    val refreshed = wh.read(spark, "proj")
    assert(refreshed.columns.toSet == Set("id", "cat", "v"),
      "the scheduled refresh must keep the declared schema")
    assert(refreshed.filter(col("id") === 3L).count() == 1,
      "the refresh must have picked up the new source state")
  }

  test("isSnapshotRace is path-scoped: a missing path OUTSIDE the warehouse root fails fast") {
    val root = tmpDir("race-scope")
    val under = new java.io.FileNotFoundException(
      s"File file:$root/t.v3/part-0.parquet does not exist")
    val outside = new java.io.FileNotFoundException(
      "File file:/data/elsewhere/input.parquet does not exist")
    assert(Tables.isSnapshotRace(under, Some(root)),
      "a vanished file under the root is the retryable race")
    assert(!Tables.isSnapshotRace(outside, Some(root)),
      "a missing UNRELATED path is a misconfiguration, never retried")
    // without a root hint the classification stays class-based
    assert(Tables.isSnapshotRace(outside, None))
    // arbitrary errors that merely SAY 'does not exist' no longer match
    val generic = new IllegalArgumentException("table foo does not exist")
    assert(!Tables.isSnapshotRace(generic, None),
      "free-text 'does not exist' must not classify as a race")
    // wrapped executor-side FNF (message-embedded, no typed cause)
    val wrapped = new RuntimeException(
      s"Job aborted: java.io.FileNotFoundException: $root/t.v2/part-1.parquet")
    assert(Tables.isSnapshotRace(wrapped, Some(root)))
    assert(!Tables.isSnapshotRace(new RuntimeException(
      "java.io.FileNotFoundException: /data/elsewhere/x"), Some(root)))
  }

  test("feed retention: consumed-and-aged hops swept, lagging consumer's unconsumed hops survive") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("feed-retention"), retain = 8)
    val spec = IncrementalAgg.Spec(col("cat"), col("v"))
    def commit(rows: (Long, String, Double)*): Unit =
      wh.overwrite(rows.toDF("id", "cat", "v").localCheckpoint(true), "m")
    commit((1L, "a", 1.0))
    // two independent consumers bootstrap at v1
    MirrorChangelog.maintainAggregate(spark, wh, "m", "feed", "agg1", "id", spec)
    MirrorChangelog.maintainAggregate(spark, wh, "m", "feed", "agg2", "id", spec)
    commit((1L, "a", 2.0), (2L, "b", 1.0)) // v2
    commit((2L, "b", 3.0))                 // v3
    // agg1 absorbs through v3; agg2 lags at v1
    MirrorChangelog.maintainAggregate(spark, wh, "m", "feed", "agg1", "id", spec)
    def hopDirs: Set[String] = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(Paths.get(wh.tablePath("feed")))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("batch_")).toSet
      finally s.close()
    }
    assert(hopDirs == Set("batch_2", "batch_3"))
    // age everything; min registered cursor is agg2's v1 → nothing ≤1
    // exists, so the aged sweep must still keep agg2's pending hops
    def ageAll(): Unit = {
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000)
      Files.walk(Paths.get(wh.tablePath("feed"))).forEach(p =>
        Files.setLastModifiedTime(p, old))
    }
    ageAll()
    assert(MirrorChangelog.expireConsumedHops(wh, "feed", 60000L).isEmpty,
      "a lagging consumer's unconsumed hops must survive retention")
    // the SQL face (round 19): the lag is observable — agg2 is the
    // retention laggard with 2 retained hops above its cursor, agg1 is
    // current; CALL consumers() and the metadata table agree
    val cat = "r12c1"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      Paths.get(wh.tablePath("feed")).getParent.toString)
    def lagRows(src: String): Seq[(String, Long, Boolean)] =
      spark.sql(src).collect()
        .map(r => (r.getString(0), r.getLong(2), r.getBoolean(3))).toSeq
        .sortBy(_._1)
    val viaCall = lagRows(s"CALL $cat.system.consumers('feed')")
    assert(viaCall == Seq(("agg1", 0L, false), ("agg2", 2L, true)),
      s"the laggard must be visible from SQL: $viaCall")
    assert(lagRows(s"SELECT consumer, cursor, hops_behind, " +
      s"blocking_retention FROM $cat.feed.consumers") == viaCall,
      "the metadata table and the procedure must agree")
    // agg2 catches up; a NEW hop lands, consumed by both but FRESH
    MirrorChangelog.maintainAggregate(spark, wh, "m", "feed", "agg2", "id", spec)
    commit((3L, "c", 5.0), (2L, "b", 3.0)) // v4
    assert(MirrorChangelog.maintainAggregate(spark, wh, "m", "feed", "agg1",
      "id", spec).nonEmpty)
    assert(MirrorChangelog.maintainAggregate(spark, wh, "m", "feed", "agg2",
      "id", spec).nonEmpty)
    // old+consumed hops sweep; the fresh one is inside the age guard
    val swept = MirrorChangelog.expireConsumedHops(wh, "feed", 60000L)
    assert(swept.map(_.split("/").last).toSet == Set("batch_2", "batch_3"),
      s"only consumed-AND-aged hops sweep: $swept")
    assert(hopDirs == Set("batch_4"),
      "a consumed-but-fresh hop stays inside the age guard")
    ageAll()
    assert(MirrorChangelog.expireConsumedHops(wh, "feed", 60000L)
      .map(_.split("/").last) == Seq("batch_4") && hopDirs.isEmpty)
    val a1 = wh.read(spark, "agg1").collect().map(_.toSeq).toSet
    val a2 = wh.read(spark, "agg2").collect().map(_.toSeq).toSet
    assert(a1 == a2, "both consumers converge to the same state")
    // post-convergence: nobody lags, nobody blocks
    assert(lagRows(s"CALL $cat.system.consumers('feed')")
      .forall { case (_, behind, blocking) => behind == 0L && !blocking },
      "converged consumers must report zero lag")
  }

  test("first compaction of a LEGACY directory table carries its marker files (capture-before-migrate)") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("legacy-markers"))
    // legacy layout: plain directory, no pointer — with an IVM cursor
    // marker inside, exactly the state a pre-versioning deployment left
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "cat", "v")
      .write.parquet(wh.tablePath("t"))
    Files.writeString(Paths.get(wh.tablePath("t"), "_ivm_batch_id"), "7")
    Maintenance.compact(spark, wh, "t", targetFiles = 1)
    val carried = Paths.get(wh.snapshotPath("t"), "_ivm_batch_id")
    assert(Files.exists(carried) && Files.readString(carried) == "7",
      "the marker must survive the legacy migration + rewrite commit")
    assert(wh.read(spark, "t").count() == 2)
  }
}
