package graft

import java.nio.file.{Files, Paths}

import graft.plans.Maintenance
import graft.sources.Tables
import graft.sources.Tables.Warehouse

/** Round-13 storage-contract specs: the round-12 advice findings, each
  * pinned by the scenario the advisor described — TIMESTAMP AS OF under
  * out-of-order publishes, the grandfather pass refusing half-written
  * pre-upgrade stages, schema-inference races classified without a path,
  * and day derivation pinned to the layout's zone.
  */
class Round13OpsSpec extends SparkTestBase {
  import spark.implicits._

  private val catalogSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private def register(root: String): String = {
    val name = s"r13c${catalogSeq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", root)
    name
  }

  test("TIMESTAMP AS OF picks the latest PUBLISH STAMP, not the highest version number") {
    val root = tmpDir("asof-stamp")
    val wh = Warehouse(root, retain = 8)
    (1 to 3).foreach { v =>
      wh.overwrite(Seq((v.toLong, s"state$v")).toDF("id", "s")
        .localCheckpoint(true), "t")
    }
    // simulate publishStage's documented out-of-order no-CAS window: v3's
    // stamp lands BEFORE v2's (a slow rival publishing late)
    val t0 = System.currentTimeMillis() - 60000L
    def stamp(v: Long, millis: Long): Unit =
      Files.setLastModifiedTime(Paths.get(s"${wh.tablePath("t")}.v$v", "_published"),
        java.nio.file.attribute.FileTime.fromMillis(millis))
    stamp(1L, t0)
    stamp(3L, t0 + 1000L)
    stamp(2L, t0 + 2000L) // v2 published LAST despite the lower number
    val cat = register(root)
    def asOf(millis: Long): String = {
      val ts = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(millis))
      spark.sql(s"SELECT s FROM $cat.t TIMESTAMP AS OF '$ts'")
        .head.getString(0)
    }
    // after every stamp: the LATEST-stamped version (v2), not max number (v3)
    assert(asOf(t0 + 3000L) == "state2",
      "TIMESTAMP AS OF must follow publish stamps, not version numbers")
    // between v3's and v2's stamps: v3 was the newest published state then
    assert(asOf(t0 + 1500L) == "state3")
    assert(asOf(t0 + 500L) == "state1")
  }

  test("grandfather pass stamps only COMPLETED pre-marker writes (_SUCCESS); a crashed pre-upgrade stage stays orphan work") {
    val wh = Warehouse(tmpDir("gf-succ"), retain = 6)
    // a COMPLETED legacy write: plain Spark write into a version dir
    // (pre-marker code's shape — _SUCCESS present, no _published)
    Seq((1L, "a")).toDF("id", "s").write
      .parquet(s"${wh.tablePath("leg")}.v1")
    // a CRASHED pre-upgrade stage: half-written, no _SUCCESS, no .stage
    // sibling (pre-marker code never wrote siblings)
    val crashed = Paths.get(s"${wh.tablePath("leg")}.v2")
    Files.createDirectories(crashed)
    Files.writeString(crashed.resolve("part-00000-garbage.parquet"), "torn")
    // first post-upgrade commit triggers the durable grandfather pass
    wh.overwrite(Seq((2L, "b")).toDF("id", "s").localCheckpoint(true), "leg")
    assert(wh.listVersions("leg") == Seq(1L, 3L),
      "the completed legacy write is history; the crashed stage is not")
    assert(Files.exists(Paths.get(s"${wh.tablePath("leg")}.v1", "_published")),
      "completed pre-marker history must be durably stamped")
    assert(!Files.exists(crashed.resolve("_published")),
      "a half-written pre-upgrade stage must never be published as history")
    // VERSION AS OF serves the grandfathered write, never the torn one
    assert(wh.readVersion(spark, "leg", 1L).select("s")
      .as[String].collect().toSeq == Seq("a"))
    intercept[Exception] { wh.readVersion(spark, "leg", 2L) }
    // and the crashed stage is exactly what the age-guarded sweep owns
    val swept = Maintenance.removeOrphans(wh, "leg", olderThanMs = 0L)
    assert(swept.exists(_.contains("leg.v2")), s"swept: $swept")
  }

  test("UNABLE_TO_INFER_SCHEMA classifies as a snapshot race without path scoping (its message names no path)") {
    val empty = tmpDir("infer-empty")
    val e = intercept[Exception] { spark.read.parquet(empty) }
    // the message names only the format — path scoping must not apply
    assert(Tables.isSnapshotRace(e, Some("/graft/warehouse/unrelated")),
      s"schema-inference race not classified: ${e.getMessage}")
    // while a scoped FileNotFound on an unrelated path still fails fast
    val fnf = new java.io.FileNotFoundException("/somewhere/else/file")
    assert(!Tables.isSnapshotRace(fnf, Some("/graft/warehouse/unrelated")))
  }

  test("manifest bitsets size to each file's own key NDV; a dense file no longer saturates, a sparse file no longer over-pays") {
    import spark.implicits._
    import graft.plans.ZoneMap
    import org.apache.spark.sql.functions.{col, length}
    val dir = tmpDir("ndv-bloom")
    // two files with wildly different key densities in one table
    (0L until 200L).toDF("k").coalesce(1)
      .write.mode("append").parquet(dir)
    (1000000L until 1300000L).toDF("k").coalesce(1)
      .write.mode("append").parquet(dir)
    ZoneMap.buildAndSave(spark, dir, cols = Seq("k"), bloomKeys = Seq("k"))
    val m = ZoneMap.manifest(spark, dir)
    val sizes = m.select(col("rows"),
        (length(col("bloom_k")) * 8).cast("long").as("bits"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sizes(200L) == (1 << 14).toLong,
      s"the sparse file clamps to the floor: $sizes")
    assert(sizes(300000L) == (1 << 22).toLong,
      s"the dense file sizes to ~10x its NDV (3M -> 2^22): $sizes")
    // and the probe narrows correctly across MIXED sizes: a sparse-file
    // key opens one file, a dense-file key opens one file, a missing key
    // opens none (modulo the ~1% FPP, impossible at these densities)
    def survivors(key: Long) =
      ZoneMap.keyedSurvivors(spark, dir, "k", Seq(key),
        keyTypeHint = Some(org.apache.spark.sql.types.LongType),
        bloomOnly = true).get
    assert(survivors(42L).size == 1)
    assert(survivors(1000042L).size == 1)
    assert(survivors(5555555L).isEmpty)
    // exactness end-to-end
    assert(ZoneMap.lookupRead(spark, dir, "k", Seq(42L, 1000042L))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(42L, 1000042L))
  }

  test("a crashed streaming query's epoch staging is age-guarded orphan work; fresh in-flight epochs survive") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("orph-epoch"))
    wh.overwrite(Seq((1L, "a")).toDF("id", "s").localCheckpoint(true), "t")
    // a killed JVM's leftover per-epoch staging dir
    val crashed = Paths.get(s"${wh.tablePath("t")}.streamepoch_deadbeef_7")
    Files.createDirectories(crashed)
    Files.writeString(crashed.resolve("part-00000-x.parquet"), "torn")
    // fresh: the age guard protects a LIVE stream's in-flight epoch
    assert(!Maintenance.removeOrphans(wh, "t", olderThanMs = 60000L)
      .exists(_.contains("streamepoch")))
    assert(Files.isDirectory(crashed))
    // aged out: swept
    val swept = Maintenance.removeOrphans(wh, "t", olderThanMs = 0L)
    assert(swept.exists(_.contains("streamepoch_deadbeef_7")), s"swept: $swept")
    assert(!Files.exists(crashed))
  }

  test("day derivation is pinned to UTC: writer and reader sessions in other timezones agree with the layout") {
    val wh = Warehouse(tmpDir("tz-utc"))
    wh.declareTimePartition("ev", "ts")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try {
      // 2024-01-01T20:00Z is already Jan 2 in Tokyo: a session-zone
      // derivation would land the row in p_day=2024-01-02 and a UTC
      // reader's pruning would silently drop it
      val rows = Seq(
        (1L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T20:00:00Z"))),
        (2L, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-02T01:00:00Z"))))
        .toDF("id", "ts")
      wh.appendBatch(rows, "ev", 0L)
      assert(Files.isDirectory(Paths.get(wh.tablePath("ev"), "p_day=2024-01-01")),
        "the layout must be the UTC day, whatever the writer session zone")
      assert(Files.isDirectory(Paths.get(wh.tablePath("ev"), "p_day=2024-01-02")))
      // a pruned read under the SAME non-UTC session stays exact
      val got = wh.readTimePruned(spark, "ev",
          fromTs = Some(java.sql.Timestamp.from(
            java.time.Instant.parse("2024-01-01T19:00:00Z"))),
          toTs = Some(java.sql.Timestamp.from(
            java.time.Instant.parse("2024-01-01T21:00:00Z"))))
        .select("id").as[Long].collect().toSeq
      assert(got == Seq(1L),
        "UTC-pinned pruning must keep the row a session-zone bound would drop")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }
}
