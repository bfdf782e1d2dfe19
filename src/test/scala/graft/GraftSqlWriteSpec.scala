package graft

import graft.plans.{Maintenance, MirrorChangelog, ZoneMap}
import graft.sources.{GraftCatalog, Tables}
import graft.sources.Tables.{TableProps, Warehouse}

/** The SQL write surface: DDL/DML through [[GraftCatalog]] rides the
  * engine's committed paths — CTAS/CREATE are atomic versioned creates,
  * INSERT INTO is the hard-link fast append ([[Warehouse.appendVersioned]]:
  * O(new data), prior snapshot retained for time travel), INSERT
  * OVERWRITE and DELETE FROM are pointer-CAS rewrites, ALTER TABLE edits
  * the TableProps sidecar, DROP TABLE removes the whole version history.
  * Tables whose layout is a contract (feeds, projections, partitioned
  * changelogs, pinned snapshots) refuse writes loudly.
  */
class GraftSqlWriteSpec extends SparkTestBase {
  import spark.implicits._

  private def register(name: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", root)
  }

  test("CTAS + INSERT INTO: fast append retains the prior snapshot; files hard-link, not copy") {
    val root = tmpDir("sqlw-ins")
    val wh = Warehouse(root, retain = 8)
    register("w1", root)
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").createOrReplaceTempView("src2")
    spark.sql("CREATE TABLE w1.t AS SELECT * FROM src2")
    assert(spark.sql("SELECT * FROM w1.t").count() == 2)
    val vAfterCtas = wh.currentVersion("t").get

    spark.sql("INSERT INTO w1.t VALUES (3, 'c'), (4, 'd')")
    assert(spark.sql("SELECT count(*) FROM w1.t").head.getLong(0) == 4)
    // the pre-insert snapshot is still served via time travel
    assert(spark.sql(s"SELECT count(*) FROM w1.t VERSION AS OF $vAfterCtas")
      .head.getLong(0) == 2)
    // the append CARRIED the old files as hard links (nlink > 1), so the
    // new version cost O(new data), not a rewrite
    val prevDir = java.nio.file.Paths.get(s"$root/t.v$vAfterCtas")
    val carried = java.nio.file.Files.list(prevDir).iterator()
    var linked = 0
    while (carried.hasNext) {
      val f = carried.next()
      if (f.getFileName.toString.endsWith(".parquet")) {
        val n = java.nio.file.Files.getAttribute(f, "unix:nlink")
          .asInstanceOf[Integer].intValue()
        if (n > 1) linked += 1
      }
    }
    assert(linked > 0, "expected the appended version to hard-link prior files")

    // INSERT INTO ... SELECT from the table itself: the read pins the
    // pre-append snapshot (no self-read corruption)
    spark.sql("INSERT INTO w1.t SELECT id + 100, s FROM w1.t WHERE id <= 2")
    assert(spark.sql("SELECT count(*) FROM w1.t").head.getLong(0) == 6)
    assert(spark.sql("SELECT count(*) FROM w1.t WHERE id > 100").head.getLong(0) == 2)
  }

  test("INSERT OVERWRITE replaces atomically; DELETE FROM is a COW rewrite with SQL null semantics") {
    val root = tmpDir("sqlw-ow")
    val wh = Warehouse(root, retain = 8)
    register("w2", root)
    spark.sql("CREATE TABLE w2.t (id BIGINT, grp STRING, v DOUBLE)")
    assert(spark.sql("SELECT * FROM w2.t").count() == 0) // empty create serves
    spark.sql("INSERT INTO w2.t VALUES (1, 'a', 1.0), (2, 'b', 2.0), " +
      "(3, NULL, 3.0), (4, 'a', 4.0)")
    spark.sql("INSERT OVERWRITE w2.t VALUES (10, 'x', 1.0), (11, NULL, 2.0), " +
      "(12, 'y', 3.0)")
    assert(spark.sql("SELECT sum(id) FROM w2.t").head.getLong(0) == 33)

    val before = wh.currentVersion("t").get
    // DELETE WHERE grp = 'x': the NULL-grp row must SURVIVE (predicate
    // NULL is not TRUE) — the SQL delete contract
    spark.sql("DELETE FROM w2.t WHERE grp = 'x'")
    assert(spark.sql("SELECT sum(id) FROM w2.t").head.getLong(0) == 23)
    assert(spark.sql("SELECT count(*) FROM w2.t WHERE grp IS NULL")
      .head.getLong(0) == 1)
    // the delete committed a NEW version (COW), old one retained
    assert(wh.currentVersion("t").get > before)
    assert(spark.sql(s"SELECT count(*) FROM w2.t VERSION AS OF $before")
      .head.getLong(0) == 3)
    // TRUNCATE TABLE rides the same path (delete-where-always-true);
    // schema survives the empty rewrite
    spark.sql("TRUNCATE TABLE w2.t")
    assert(spark.sql("SELECT * FROM w2.t").count() == 0)
    assert(spark.sql("SELECT * FROM w2.t").schema.fieldNames.toSeq ==
      Seq("id", "grp", "v"))
  }

  test("DROP TABLE removes pointer, versions, and props; ALTER TABLE edits the sidecar") {
    val root = tmpDir("sqlw-ddl")
    val wh = Warehouse(root, retain = 8)
    register("w3", root)
    spark.sql("CREATE TABLE w3.t (id BIGINT) TBLPROPERTIES ('team'='data')")
    spark.sql("INSERT INTO w3.t VALUES (1)")
    assert(TableProps.read(wh, "t")("team") == "data")

    spark.sql("ALTER TABLE w3.t SET TBLPROPERTIES ('cdc.key-column'='id')")
    assert(TableProps.read(wh, "t")("cdc.key-column") == "id")
    spark.sql("ALTER TABLE w3.t UNSET TBLPROPERTIES ('team')")
    assert(!TableProps.read(wh, "t").contains("team"))
    // the layout prop is immutable through DDL
    intercept[Exception] {
      spark.sql("ALTER TABLE w3.t SET TBLPROPERTIES " +
        "('partition.time-column'='ts')")
    }

    spark.sql("DROP TABLE w3.t")
    assert(!wh.exists("t"))
    assert(wh.listVersions("t").isEmpty)
    assert(TableProps.read(wh, "t").isEmpty)
    intercept[Exception] { spark.sql("SELECT * FROM w3.t").collect() }
    // recreating after drop starts a fresh history
    spark.sql("CREATE TABLE w3.t AS SELECT 7 AS id")
    assert(spark.sql("SELECT id FROM w3.t").head.getInt(0) == 7)
  }

  test("CREATE TABLE PARTITIONED BY (days(ts)) declares the hidden time partition; inserts refuse toward appendBatch") {
    val root = tmpDir("sqlw-part")
    val wh = Warehouse(root, retain = 8)
    register("w4", root)
    spark.sql("CREATE TABLE w4.ev (id BIGINT, ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    assert(wh.timePartitionCol("ev").contains("ts"))
    // empty partitioned table serves its declared schema
    assert(spark.sql("SELECT * FROM w4.ev").schema.fieldNames.toSeq ==
      Seq("id", "ts", "v"))
    // row-level SQL inserts refuse (appends are batch-granular)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO w4.ev VALUES (1, TIMESTAMP '2026-01-02 03:04:05', 1.0)")
    }
    assert(e.getMessage.contains("appendBatch"))
    // the pipeline path lands day dirs and SQL reads them with pruning
    val df = Seq((1L, java.sql.Timestamp.valueOf("2026-01-02 03:04:05"), 1.0),
      (2L, java.sql.Timestamp.valueOf("2026-01-03 03:04:05"), 2.0))
      .toDF("id", "ts", "v")
    wh.appendBatch(df, "ev", 0L)
    assert(spark.sql("SELECT count(*) FROM w4.ev WHERE p_day = DATE'2026-01-02'")
      .head.getLong(0) == 1)
    // plain TIME-column filters stay correct under the derived-day-filter
    // rule (DeriveHiddenDayFilters; the PRUNING proof lives in the
    // fresh-JVM ExtensionsCheck where the rule precedes pushdown)
    assert(spark.sql("SELECT id FROM w4.ev " +
      "WHERE ts >= TIMESTAMP '2026-01-03 00:00:00'").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    // only a days() transform is accepted
    intercept[Exception] {
      spark.sql("CREATE TABLE w4.bad (id BIGINT) PARTITIONED BY (bucket(4, id))")
    }
  }

  test("metadata tables: t.snapshots matches the snapshot log, t.files the footer census") {
    val root = tmpDir("sqlw-meta")
    val wh = Warehouse(root, retain = 8)
    register("w5", root)
    wh.overwrite(Seq((1L, "a")).toDF("id", "s").localCheckpoint(true), "t")
    wh.retryingConflicts() {
      wh.appendVersioned(Seq((2L, "b"), (3L, "c")).toDF("id", "s")
        .localCheckpoint(true), "t")
    }
    val snaps = spark.sql("SELECT version, published_at FROM w5.t.snapshots " +
      "ORDER BY version").collect()
    assert(snaps.map(_.getLong(0)).toSeq == wh.publishedVersions("t").map(_._1))
    assert(snaps.forall(_.getTimestamp(1) != null))
    // the files census row count sums to the table count, byte sizes real
    val files = spark.sql("SELECT file_path, size_bytes, record_count " +
      "FROM w5.t.files").collect()
    assert(files.map(_.getLong(2)).sum == 3)
    assert(files.forall(_.getLong(1) > 0))
    assert(files.forall(_.getString(0).endsWith(".parquet")))
  }

  test("write refusals name the owning mechanism: feed views, projections, MOR mirrors, pinned snapshots") {
    val root = tmpDir("sqlw-refuse")
    val wh = Warehouse(root, retain = 8)
    register("w6", root)
    // feed view: the first emit bootstraps the cursor, the second emits
    // a real hop (and with it the view table's data dir)
    wh.overwrite(Seq((1L, "a")).toDF("id", "s").localCheckpoint(true), "m")
    MirrorChangelog.emitPending(spark, wh, "m", "m_feed", "id")
    wh.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .localCheckpoint(true), "m")
    MirrorChangelog.emitPending(spark, wh, "m", "m_feed", "id")
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO w6.m_feed SELECT * FROM w6.m_feed")
    }
    assert(e1.getMessage.contains("consumer contract"))
    // pinned snapshot writes don't even parse as a target — assert the
    // policy directly
    val pinned = intercept[Exception] {
      spark.sql("DELETE FROM w6.m_feed WHERE id = 1")
    }
    assert(pinned.getMessage.contains("consumer contract"))
    // a materialized projection refuses toward its source
    wh.overwrite(Seq((1L, "a", 1.0)).toDF("id", "s", "v")
      .localCheckpoint(true), "wide")
    Maintenance.materializeProjection(spark, wh, "wide", "wide_ro",
      dims = Seq("id"), bloomKeys = Nil, targetFiles = 1,
      cols = Seq("id", "v"))
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO w6.wide_ro VALUES (9, 9.0)")
    }
    assert(e2.getMessage.toLowerCase.contains("projection"))
    // a CDC changelog (the reference's dependent-tables marker): its
    // in-place batch layout must never migrate to a version pointer
    // under the ingest stream's feet
    wh.overwrite(Seq((1L, "a")).toDF("id", "s").localCheckpoint(true), "chg")
    TableProps.write(wh, "chg",
      TableProps.read(wh, "chg") + ("dependent-tables" -> "m"))
    val e3 = intercept[Exception] {
      spark.sql("INSERT INTO w6.chg VALUES (2, 'b')")
    }
    assert(e3.getMessage.contains("appendBatch"))
  }

  test("ALTER TABLE RENAME/DROP COLUMN drives the declared-evolution registry + one COW rewrite") {
    val root = tmpDir("sqlw-evol")
    val wh = Warehouse(root, retain = 8)
    register("w8", root)
    spark.sql("CREATE TABLE w8.t AS SELECT * FROM VALUES " +
      "(1, 'a', 1.5), (2, 'b', 2.5) AS v(id, s, x)")
    val before = wh.currentVersion("t").get

    spark.sql("ALTER TABLE w8.t RENAME COLUMN s TO label")
    // plain SQL sees the new shape immediately (the COW rewrite)...
    assert(spark.sql("SELECT * FROM w8.t").schema.fieldNames.toSeq ==
      Seq("id", "label", "x"))
    assert(spark.sql("SELECT label FROM w8.t WHERE id = 1").head.getString(0) == "a")
    // ...the registry carries the declaration (fold/changelog paths
    // rejoin old-name history through it)...
    assert(graft.sources.SchemaEvolution.renames(wh, "t") == Map("s" -> "label"))
    // ...and the pre-rename snapshot is retained under its own bytes
    assert(spark.sql(s"SELECT * FROM w8.t VERSION AS OF $before")
      .schema.fieldNames.toSeq == Seq("id", "s", "x"))

    spark.sql("ALTER TABLE w8.t DROP COLUMN x")
    assert(spark.sql("SELECT * FROM w8.t").schema.fieldNames.toSeq ==
      Seq("id", "label"))
    assert(graft.sources.SchemaEvolution.drops(wh, "t") == Set("x"))

    // protected key columns refuse through the same registry guard
    spark.sql("ALTER TABLE w8.t SET TBLPROPERTIES ('cdc.key-column'='id')")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE w8.t RENAME COLUMN id TO pk")
    }
    assert(e.getMessage.contains("keyed on it"))
    // ADD COLUMN: one COW rewrite appends a nullable column (round 13);
    // existing rows read NULL, history keeps its narrower schema, and a
    // backfill UPDATE composes
    val beforeAdd = wh.currentVersion("t").get
    spark.sql("ALTER TABLE w8.t ADD COLUMN extra INT")
    assert(spark.sql("SELECT * FROM w8.t").schema.fieldNames.toSeq ==
      Seq("id", "label", "extra"))
    assert(spark.sql("SELECT extra FROM w8.t WHERE id = 1").head.isNullAt(0))
    assert(spark.sql(s"SELECT * FROM w8.t VERSION AS OF $beforeAdd")
      .schema.fieldNames.toSeq == Seq("id", "label"))
    spark.sql("UPDATE w8.t SET extra = 7 WHERE id = 1")
    assert(spark.sql("SELECT extra FROM w8.t WHERE id = 1").head.getInt(0) == 7)
    // non-nullable adds refuse (existing rows have no value); duplicates refuse
    intercept[Exception] {
      spark.sql("ALTER TABLE w8.t ADD COLUMN bad INT NOT NULL")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE w8.t ADD COLUMN extra STRING")
    }
  }

  test("SQL inserts racing maintenance re-clustering: no lost rows, layout repairs") {
    import org.apache.spark.sql.functions.col
    val root = tmpDir("sqlw-race")
    val wh = Warehouse(root, retain = 8)
    register("w9", root)
    wh.overwrite(spark.range(200).select(col("id"),
      (col("id") % 7).as("grp")).localCheckpoint(true), "t")
    graft.plans.Maintenance.declareClustering(wh, "t", Seq("id"),
      targetFiles = Some(4))
    graft.plans.Maintenance.cluster(spark, wh, "t", Seq("id"), 4)
    // writer thread: five CAS-retried SQL appends; maintenance thread:
    // three full/incremental re-cluster ticks — every row must survive
    // every interleaving (the insert's CAS loses to a cluster commit and
    // retries; the cluster's CAS loses to an insert and retries)
    @volatile var failure: Option[Throwable] = None
    val writer = new Thread(() => {
      try (0 until 5).foreach { i =>
        spark.sql(s"INSERT INTO w9.t VALUES (${1000 + i}, -1)")
      } catch { case t: Throwable => failure = Some(t) }
    })
    val maint = new Thread(() => {
      try (0 until 3).foreach { _ =>
        wh.retryingConflicts(maxAttempts = 10) {
          if (!graft.plans.Maintenance.clusterIncremental(
              spark, wh, "t", Seq("id"), Nil))
            graft.plans.Maintenance.cluster(spark, wh, "t", Seq("id"), 4)
        }
        Thread.sleep(30)
      } catch { case t: Throwable => failure = Some(t) }
    })
    writer.start(); maint.start()
    writer.join(120000); maint.join(120000)
    failure.foreach(throw _)
    assert(spark.sql("SELECT count(*) FROM w9.t").head.getLong(0) == 205)
    assert(spark.sql("SELECT count(*) FROM w9.t WHERE id >= 1000")
      .head.getLong(0) == 5, "an appended row was lost to a cluster rewrite")
    // one more tick proves the layout converges back to fresh
    wh.retryingConflicts(maxAttempts = 10) {
      if (!graft.plans.Maintenance.clusterIncremental(
          spark, wh, "t", Seq("id"), Nil))
        graft.plans.Maintenance.cluster(spark, wh, "t", Seq("id"), 4)
    }
    assert(graft.plans.ZoneMap.isFresh(spark, wh.snapshotPath("t")))
  }

  test("concurrent SQL inserts: every row survives the append CAS (no lost updates)") {
    val root = tmpDir("sqlw-conc")
    register("w7", root)
    spark.sql("CREATE TABLE w7.t (id BIGINT)")
    val threads = (0 until 4).map { i =>
      new Thread(() => {
        spark.sql(s"INSERT INTO w7.t VALUES (${i * 2}), (${i * 2 + 1})")
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val got = spark.sql("SELECT id FROM w7.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq
    assert(got == (0L until 8L), s"lost update: $got")
  }

  test("ALTER COLUMN TYPE promotes int->bigint metadata-only: history keeps narrow bytes; non-promotions refuse") {
    import org.apache.spark.sql.types._
    val root = tmpDir("sqlw-widen")
    val wh = Warehouse(root, retain = 8)
    register("wty", root)
    spark.sql("CREATE TABLE wty.t AS SELECT CAST(id AS INT) AS id, " +
      "CAST(id * 10 AS INT) AS n FROM range(5)")
    spark.sql("ALTER TABLE wty.t ALTER COLUMN n TYPE BIGINT")
    // resolved schema serves wide IMMEDIATELY (before any wide file)
    assert(spark.table("wty.t").schema("n").dataType == LongType)
    // the promotion wrote NO data: v1's files keep their narrow bytes
    val v1 = wh.currentVersion("t").get
    assert(spark.read.parquet(s"$root/t.v$v1").schema("n").dataType
      == IntegerType, "promotion must not rewrite history files")
    // a wide insert lands next to the narrow files; reads promote
    spark.sql("INSERT INTO wty.t VALUES (100, 3000000000)")
    assert(spark.sql("SELECT CAST(sum(n) AS BIGINT) FROM wty.t")
      .head.getLong(0) == 100L + 3000000000L)
    // mixed-width rewrites still work (deleteWhere's widened read)
    spark.sql("DELETE FROM wty.t WHERE id = 0")
    assert(spark.sql("SELECT count(*) FROM wty.t").head.getLong(0) == 5)
    // lossy retypes keep refusing with the promotion rule named
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE wty.t ALTER COLUMN id TYPE STRING")
    }
    assert(e.getMessage.contains("int->bigint"), e.getMessage)
    // layout-keyed columns refuse (bucket routing hashes the key bytes)
    spark.sql("ALTER TABLE wty.t SET TBLPROPERTIES ('cdc.key-column'='id')")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE wty.t ALTER COLUMN id TYPE BIGINT")
    }
    assert(e2.getMessage.contains("cdc.key-column"), e2.getMessage)
    // an EMPTY table promotes its declared schema in place
    spark.sql("CREATE TABLE wty.e (a INT, b FLOAT)")
    spark.sql("ALTER TABLE wty.e ALTER COLUMN b TYPE DOUBLE")
    assert(spark.table("wty.e").schema("b").dataType == DoubleType)
  }

  test("every snapshot rewrite carries root markers (stream replay protection survives UPDATE/MERGE/DELETE/ALTER/OVERWRITE/merge_changes)") {
    import java.nio.file.{Files, Paths}
    val root = tmpDir("sqlw-markers")
    val wh = Warehouse(root, retain = 8)
    register("wmk", root)
    spark.sql("CREATE TABLE wmk.t (id BIGINT, ts STRING, v STRING)")
    spark.sql("INSERT INTO wmk.t VALUES (1, '2024-01-01', 'a'), (2, '2024-01-01', 'b')")
    // a registered stream's replay position, exactly as GraftStreamingWrite
    // stamps it — plus a second cross-commit marker
    val marker = "_stream_epoch_q-test"
    Files.writeString(Paths.get(wh.snapshotPath("t"), marker), "7")
    Files.writeString(Paths.get(wh.snapshotPath("t"), "_custom_cursor"), "c1")
    def markerValue: Option[String] = {
      val p = Paths.get(wh.snapshotPath("t"), marker)
      if (Files.exists(p)) Some(Files.readString(p).trim) else None
    }
    // group-based COW (MERGE/UPDATE ride GraftCowBatchWrite)
    spark.sql("UPDATE wmk.t SET v = 'a2' WHERE id = 1")
    assert(markerValue.contains("7"), "UPDATE dropped the epoch marker")
    Seq((2L, "2024-01-02", "b2")).toDF("id", "ts", "v")
      .createOrReplaceTempView("mchg")
    spark.sql("MERGE INTO wmk.t USING mchg ON wmk.t.id = mchg.id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(markerValue.contains("7"), "MERGE dropped the epoch marker")
    // deleteWhere rewrite
    spark.sql("DELETE FROM wmk.t WHERE id = 2")
    assert(markerValue.contains("7"), "DELETE dropped the epoch marker")
    // ALTER rewrites (ADD COLUMN + RENAME's normalize rewrite)
    spark.sql("ALTER TABLE wmk.t ADD COLUMN extra STRING")
    assert(markerValue.contains("7"), "ADD COLUMN dropped the epoch marker")
    spark.sql("ALTER TABLE wmk.t RENAME COLUMN extra TO extra2")
    assert(markerValue.contains("7"), "RENAME rewrite dropped the epoch marker")
    // INSERT OVERWRITE replaces data, not cross-commit contracts
    spark.sql("INSERT OVERWRITE wmk.t VALUES (9, '2024-01-09', 'z', 'e')")
    assert(markerValue.contains("7"), "OVERWRITE dropped the epoch marker")
    // merge_changes fold
    Seq((9L, "2024-01-10", "z2", "e2", "U")).toDF("id", "ts", "v", "extra2", "op")
      .write.parquet(s"$root/chg_src")
    spark.sql("CALL wmk.system.merge_changes('chg_src', 't', 'id', 'ts')")
    assert(markerValue.contains("7"), "merge_changes dropped the epoch marker")
    assert(Files.exists(Paths.get(wh.snapshotPath("t"), "_custom_cursor")),
      "second marker must ride along")
    assert(spark.sql("SELECT v FROM wmk.t WHERE id = 9").head.getString(0) == "z2")
  }

  test("FILE-GRANULAR COW DELETE: only files whose stats admit a match rewrite, the rest carry as links; a provably-no-match delete commits nothing") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions.col
    val root = tmpDir("sql-fgdel")
    val wh = Warehouse(root, retain = 8)
    register("fgd", root)
    wh.overwrite(spark.range(1000).select(col("id"),
      (col("id") * 1.0).as("x")).localCheckpoint(true), "t")
    // range-clustered by id into 10 files: the delete predicate's
    // min/max bounds select ~1 file
    graft.plans.Maintenance.cluster(spark, wh, "t", Seq("id"), 10)
    val before = wh.currentVersion("t").get
    val baseNames = {
      val s = Files.list(Paths.get(s"$root/t.v$before"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
      } finally s.close()
    }
    assert(baseNames.size >= 8)
    // stats prove absence -> the delete is a NO-OP, no version bump
    // (checked FIRST: a granular rewrite below stales the manifest, and
    // a stale census correctly falls back to the full-rewrite path)
    spark.sql("DELETE FROM fgd.t WHERE id >= 5000")
    assert(wh.currentVersion("t").contains(before),
      "a provably-no-match delete must not commit")
    spark.sql("DELETE FROM fgd.t WHERE id >= 100 AND id <= 120")
    assert(spark.sql("SELECT count(*) FROM fgd.t").head.getLong(0) == 979)
    assert(spark.sql(
      "SELECT count(*) FROM fgd.t WHERE id BETWEEN 100 AND 120")
      .head.getLong(0) == 0)
    // the unmatched id-range files carried as hard links under their names
    val cur = wh.currentVersion("t").get
    var carried = 0; var fresh = 0
    val s2 = Files.list(Paths.get(s"$root/t.v$cur"))
    try s2.iterator().forEachRemaining { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".parquet")) {
        val links = Files.getAttribute(p, "unix:nlink")
          .asInstanceOf[Integer].intValue()
        if (baseNames.contains(n) && links > 1) carried += 1 else fresh += 1
      }
    } finally s2.close()
    assert(carried >= baseNames.size - 2,
      s"file-granular delete must carry unmatched files: " +
        s"carried=$carried fresh=$fresh of ${baseNames.size}")
    // and null semantics survive the granular path: NULL predicate rows
    // are survivors (x IS NULL never true here, so nothing deletes)
    spark.sql("DELETE FROM fgd.t WHERE x > CAST(NULL AS DOUBLE)")
    assert(spark.sql("SELECT count(*) FROM fgd.t").head.getLong(0) == 979)
  }
}
