package graft

import org.apache.spark.sql.functions._

import graft.plans.{Maintenance, ZoneMap}
import graft.sources.{GraftCatalog, Tables}
import graft.sources.Tables.Warehouse

/** The SQL lifecycle surface (round-11 verdict item 5): a session-
  * registered [[GraftCatalog]] serves warehouse tables to plain SQL,
  * `VERSION AS OF`/`TIMESTAMP AS OF` time-travel through the stock
  * analyzer, and `CALL graft.system.*` runs the storage lifecycle —
  * including the MERGE INTO-shaped CDC fold with exactly the q18
  * semantics the DataFrame API has.
  */
class GraftCatalogSpec extends SparkTestBase {
  import spark.implicits._

  /** Register a fresh catalog name over `root` (names are cached by the
    * session's CatalogManager after first resolution, so each test gets
    * its own).
    */
  private def register(name: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", root)
  }

  test("plain reads, VERSION AS OF, TIMESTAMP AS OF, and snapshots() agree with the warehouse API") {
    val root = tmpDir("cat-tt")
    val wh = Warehouse(root, retain = 8)
    register("g1", root)
    (1 to 3).foreach { v =>
      wh.overwrite(Seq((v.toLong, s"state$v")).toDF("id", "s")
        .localCheckpoint(true), "t")
      Thread.sleep(15) // distinct publish stamps for the as-of scan
    }
    // current read == warehouse read
    assert(spark.sql("SELECT * FROM g1.t").collect().map(_.toString).toSeq ==
      wh.read(spark, "t").collect().map(_.toString).toSeq)
    // the default namespace spelling resolves too
    assert(spark.sql("SELECT * FROM g1.default.t").count() == 1)
    // snapshots() lists the retained published versions ascending
    val snaps = spark.sql("CALL g1.system.snapshots('t')").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    assert(snaps.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // VERSION AS OF == readVersion
    (1 to 3).foreach { v =>
      assert(spark.sql(s"SELECT s FROM g1.t VERSION AS OF $v").head.getString(0)
        == s"state$v")
    }
    // TIMESTAMP AS OF the middle publish stamp serves the middle version
    val asOf = snaps(1)._2.toString
    assert(spark.sql(s"SELECT s FROM g1.t TIMESTAMP AS OF '$asOf'")
      .head.getString(0) == "state2")
    // a GC'd / never-published version fails loudly
    intercept[Exception] {
      spark.sql("SELECT * FROM g1.t VERSION AS OF 99").collect()
    }
  }

  test("CALL merge_changes == the q18 fold; reruns are idempotent; MOR targets refused") {
    val root = tmpDir("cat-merge")
    val wh = Warehouse(root)
    register("g2", root)
    val changes = Seq(
      (1L, "a1", "I", "2024-01-01T00:00:01"),
      (2L, "b1", "I", "2024-01-01T00:00:02"),
      (1L, "a2", "U", "2024-01-01T00:00:03"),
      (3L, "c1", "I", "2024-01-01T00:00:04"),
      (2L, "b1", "D", "2024-01-01T00:00:05"))
      .toDF("id", "name", "op", "ts")
    wh.overwrite(changes.localCheckpoint(true), "chg")
    val res = spark.sql(
      "CALL g2.system.merge_changes('chg', 'mirror', 'id', 'ts')").collect()
    assert(res.head.getString(0) == "mirror")
    // visible state == the DataFrame-API one-shot fold (q18 semantics)
    val visible = spark.sql(
      "SELECT id, name FROM g2.mirror WHERE op IS NULL OR op <> 'D' ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val oracle = graft.operators.Cdc
      .applyAll(changes, CdcConfig("id", "ts"))
      .select("id", "name").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(visible == oracle && visible == Seq((1L, "a2"), (3L, "c1")))
    // re-applying the same batch is a no-op (latest-wins tie rules)
    spark.sql("CALL g2.system.merge_changes('chg', 'mirror', 'id', 'ts')")
    assert(spark.sql(
      "SELECT id, name FROM g2.mirror WHERE op IS NULL OR op <> 'D' ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq == visible)
    // late change folds incrementally
    wh.overwrite(Seq((3L, "c2", "U", "2024-01-01T00:00:06"))
      .toDF("id", "name", "op", "ts").localCheckpoint(true), "chg")
    spark.sql("CALL g2.system.merge_changes('chg', 'mirror', 'id', 'ts')")
    assert(spark.sql("SELECT name FROM g2.mirror WHERE id = 3").head.getString(0)
      == "c2")
    // MOR/bucketed layouts are refused as tables AND as merge targets
    graft.plans.MorMirror.initialize(wh, "mor_m",
      Seq((1L, "x", "U", "2024-01-01T00:00:00")).toDF("id", "s", "op", "ts")
        .localCheckpoint(true),
      CdcConfig("id", "ts"), 4)
    intercept[Exception] { spark.sql("SELECT * FROM g2.mor_m").collect() }
    intercept[Exception] {
      spark.sql("CALL g2.system.merge_changes('chg', 'mor_m', 'id', 'ts')")
    }
  }

  test("CALL compact/cluster/remove_orphans run the lifecycle; time-partitioned changelog serves day pruning in SQL") {
    val root = tmpDir("cat-life")
    val wh = Warehouse(root)
    register("g3", root)
    // many-file table -> compact
    wh.overwrite(spark.range(1000).toDF("id").repartition(16)
      .localCheckpoint(true), "t")
    val c = spark.sql("CALL g3.system.compact('t', 2)").collect().head
    assert(c.getLong(1) >= 16 && c.getLong(2) <= 2,
      s"compact census: ${c.getLong(1)} -> ${c.getLong(2)}")
    // declared clustering -> CALL cluster (full, then incremental no-op)
    Maintenance.declareClustering(wh, "t", Seq("id"), targetFiles = Some(4))
    assert(spark.sql("CALL g3.system.cluster('t')").head.getString(1) == "full")
    assert(ZoneMap.isFresh(spark, wh.snapshotPath("t")))
    assert(spark.sql("CALL g3.system.cluster('t')").head.getString(1)
      == "incremental")
    // orphan sweep on a clean table deletes nothing
    assert(spark.sql("CALL g3.system.remove_orphans('t', 0)").count() == 0)
    // time-partitioned changelog: day filters prune as PartitionFilters
    wh.declareTimePartition("ev", "ts")
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 2.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00"), 3.0))
      .toDF("id", "ts", "v")
    wh.appendBatch(ev, "ev", 0L)
    val q = spark.sql(
      "SELECT id FROM g3.ev WHERE p_day = DATE'2024-01-02'")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p_day"),
      s"SQL day filter must prune as a partition filter:\n$plan")
    // the manifest-credited exact interval count, from SQL
    assert(spark.sql("CALL g3.system.count_fast('t', 'id', '100', '199')")
      .head.getLong(1) == 100L)
  }

  test("hidden-day pruning is UNCONDITIONAL: a runtime-registered catalog prunes ts-only SQL filters as PartitionFilters") {
    val root = tmpDir("cat-sbprune")
    val wh = Warehouse(root)
    register("g6", root)
    // the session carries GraftExtensions (the standard wiring), so the
    // injected pre-pushdown rule is EXCLUDED for this test — the pruning
    // below must come from the scan builder's pushFilters derivation
    // alone, which is what makes it unconditional on session wiring
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.sources.DeriveHiddenDayFilters")
    wh.declareTimePartition("ev", "ts")
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 2.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00"), 3.0),
      (4L, java.sql.Timestamp.valueOf("2024-01-04 10:00:00"), 4.0))
      .toDF("id", "ts", "v")
    wh.appendBatch(ev, "ev", 0L)
    // the user names ONLY the time column — never p_day
    val q = spark.sql(
      """SELECT id FROM g6.ev
        |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-04 00:00:00'
        |ORDER BY id""".stripMargin)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    val plan = q.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("p_day"),
      s"ts-only filter must derive p_day PartitionFilters in a plain session:\n$plan")
    // and the pruning is REAL: only the in-range day dirs are read
    assert(q.queryExecution.executedPlan.toString.contains("PartitionFilters: ["),
      s"plan shape:\n$plan")
    // an empty just-created time-partitioned table still plans (the
    // derivation is guarded on the discovered partition column)
    spark.sql(s"CREATE TABLE g6.empty_tp (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    assert(spark.sql(
      "SELECT id FROM g6.empty_tp WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .collect().isEmpty)
    // maintenance on the empty layout is a no-op, never an inference error
    spark.sql("CALL g6.system.compact('empty_tp', 2)").collect()
    spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("CALL rollback_to_version restores an old snapshot as current (roll-forward); expire_snapshots trims history") {
    val root = tmpDir("cat-rb")
    val wh = Warehouse(root, retain = 8)
    register("g5", root)
    // the catalog's commits must retain as deeply as the test's handle —
    // its default retain=2 would GC v1 during the rollback commit itself
    spark.conf.set("spark.sql.catalog.g5.retain", "8")
    wh.overwrite(Seq((1L, "good")).toDF("id", "s").localCheckpoint(true), "t")
    Thread.sleep(15)
    wh.overwrite(Seq((1L, "bad"), (2L, "junk")).toDF("id", "s")
      .localCheckpoint(true), "t") // the bad write
    assert(spark.sql("SELECT s FROM g5.t WHERE id = 1").head.getString(0) == "bad")
    Thread.sleep(15)
    val r = spark.sql("CALL g5.system.rollback_to_version('t', 1)").head
    assert(r.getLong(1) == 1L && r.getLong(2) == 3L,
      s"roll-forward must commit a NEW version: $r")
    // plain reads serve the restored state; the bad write stays for forensics
    assert(spark.sql("SELECT id, s FROM g5.t").collect().map(_.toString).toSeq
      == Seq("[1,good]"))
    assert(spark.sql("SELECT count(*) AS n FROM g5.t VERSION AS OF 2")
      .head.getLong(0) == 2L)
    // TIMESTAMP AS OF now = the restored state (the log is append-only;
    // a pointer-swap rollback would keep resolving the bad write here)
    val now = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now().plusMillis(5))
    assert(spark.sql(s"SELECT s FROM g5.t TIMESTAMP AS OF '$now'")
      .head.getString(0) == "good")
    // the restored state is GC-protected exactly like any current version:
    // later commits retain it as ordinary history
    wh.overwrite(Seq((9L, "later")).toDF("id", "s").localCheckpoint(true), "t")
    assert(spark.sql("SELECT s FROM g5.t VERSION AS OF 3").head.getString(0)
      == "good")
    // explicit expiry: keep_last=1 keeps only the current snapshot
    val expired = spark.sql("CALL g5.system.expire_snapshots('t', 1)")
      .collect().map(_.getLong(0)).toSeq
    assert(expired == Seq(1L, 2L, 3L), s"expired: $expired")
    assert(spark.sql("SELECT s FROM g5.t WHERE id = 9").head.getString(0)
      == "later")
    intercept[Exception] {
      spark.sql("SELECT * FROM g5.t VERSION AS OF 1").collect()
    }
    // rolling back to an expired version fails loudly
    intercept[Exception] {
      spark.sql("CALL g5.system.rollback_to_version('t', 1)").collect()
    }
  }

  test("age-based expire_snapshots: only versions published before OLDER_THAN_MS drop; keep_last stays the floor; tags and current always survive") {
    import java.nio.file.{Files, Paths}
    val root = tmpDir("cat-age-expiry")
    val wh = Warehouse(root, retain = 8)
    register("gae", root)
    spark.conf.set("spark.sql.catalog.gae.retain", "8")
    (1 to 4).foreach { i =>
      wh.overwrite(Seq((i.toLong, s"v$i")).toDF("id", "s")
        .localCheckpoint(true), "t")
      Thread.sleep(10)
    }
    // v1..v4 retained, v4 current. Backdate v1/v2's publish stamps one
    // hour (the stamp t.history surfaces is the marker mtime); v3 stays
    // recent; tag v1 so the pin overrides the age axis
    def backdate(v: Long): Unit = {
      val dir = wh.publishedVersions("t").collectFirst {
        case (`v`, p) => p }.get
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3600 * 1000L)
      Files.setLastModifiedTime(dir.resolve(Tables.PublishedMarker), old)
    }
    backdate(1L); backdate(2L)
    spark.sql("CALL gae.system.create_tag('t', 'keepme', 1)").collect()
    // cutoff 30 min ago, floor keep_last=1: v2 is the only drop — v1 is
    // tagged, v3 is too recent, v4 is current
    val cutoff = System.currentTimeMillis() - 1800 * 1000L
    val expired = spark.sql(
      s"CALL gae.system.expire_snapshots('t', 1, ${cutoff}L)")
      .collect().map(_.getLong(0)).toSeq
    assert(expired == Seq(2L), s"expired: $expired")
    assert(wh.listVersions("t") == Seq(1L, 3L, 4L), wh.listVersions("t"))
    // keep_last floor beats the age axis: backdate EVERYTHING, ask for
    // floor 3 — nothing can drop (current + tag + the floor cover all)
    Seq(3L, 4L).foreach(backdate)
    val none = spark.sql(
      s"CALL gae.system.expire_snapshots('t', 3, ${cutoff}L)")
      .collect()
    assert(none.isEmpty, none.toSeq)
    // floor 1 with a future-proof cutoff: v3 drops, tag + current hold
    val all = spark.sql(
      s"CALL gae.system.expire_snapshots('t', 1, " +
        s"${System.currentTimeMillis() + 1000}L)")
      .collect().map(_.getLong(0)).toSeq
    assert(all == Seq(3L), s"expired: $all")
    assert(wh.listVersions("t") == Seq(1L, 4L))
    // the omitted default (0) keeps the pure count semantics: no age
    // filter, keep_last=1 leaves only pins + current
    assert(spark.sql("CALL gae.system.expire_snapshots('t', 1)")
      .collect().isEmpty) // v1 tagged, v4 current — nothing expirable
    assert(spark.sql("SELECT s FROM gae.t").head.getString(0) == "v4")
    assert(spark.sql("SELECT s FROM gae.t VERSION AS OF 'keepme'")
      .head.getString(0) == "v1")
  }

  test("loadTable caches per version pointer: one census walk per VERSION, evicted by commits and DDL") {
    val root = tmpDir("cat-cache")
    val wh = Warehouse(root)
    register("g7", root)
    wh.overwrite(Seq((1L, "a")).toDF("id", "s").localCheckpoint(true), "t")
    def builds = graft.sources.GraftCatalog.tableBuilds.get()
    spark.sql("SELECT * FROM g7.t").collect() // first resolution builds
    val afterFirst = builds
    (1 to 3).foreach(_ => spark.sql("SELECT count(*) FROM g7.t").collect())
    assert(builds == afterFirst,
      "repeat queries on one version must reuse the cached resolution")
    // a commit moves the pointer -> exactly one fresh build
    wh.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .localCheckpoint(true), "t")
    assert(spark.sql("SELECT count(*) AS n FROM g7.t").head.getLong(0) == 2L,
      "the cache must never serve a superseded version")
    val afterCommit = builds
    assert(afterCommit == afterFirst + 1)
    spark.sql("SELECT * FROM g7.t").collect()
    assert(builds == afterCommit)
    // DDL evicts: ALTER props re-resolves even on the same version
    spark.sql("ALTER TABLE g7.t SET TBLPROPERTIES ('note' = 'x')")
    spark.sql("SELECT * FROM g7.t").collect()
    assert(builds == afterCommit + 1)
    // an IN-PLACE layout (time-partitioned changelog) never caches —
    // its listing must stay live for freshly appended batches
    wh.declareTimePartition("ev", "ts")
    wh.appendBatch(Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("id", "ts"), "ev", 0L)
    assert(spark.sql("SELECT count(*) FROM g7.ev").head.getLong(0) == 1L)
    wh.appendBatch(Seq((2L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00")))
      .toDF("id", "ts"), "ev", 1L)
    assert(spark.sql("SELECT count(*) FROM g7.ev").head.getLong(0) == 2L,
      "a live changelog read must see the new batch immediately")
  }

  test("tags pin snapshots by name: VERSION AS OF '<tag>' resolves, GC and expiry skip tagged versions, drop releases") {
    val root = tmpDir("cat-tags")
    val wh = Warehouse(root) // retain=2: tags must outlive the window
    register("g8", root)
    spark.conf.set("spark.sql.catalog.g8.retain", "2")
    wh.overwrite(Seq((1L, "baseline")).toDF("id", "s").localCheckpoint(true), "t")
    spark.sql("CALL g8.system.create_tag('t', 'audited', 1)")
    // churn far past the retention window: the tagged version survives
    (2 to 5).foreach { v =>
      spark.sql(s"INSERT OVERWRITE g8.t VALUES (${v}L, 'state$v')")
    }
    assert(wh.listVersions("t").contains(1L),
      "a tagged version must survive retention GC")
    assert(spark.sql("SELECT s FROM g8.t VERSION AS OF 'audited'")
      .head.getString(0) == "baseline")
    // explicit expiry skips it too
    val expired = spark.sql("CALL g8.system.expire_snapshots('t', 1)")
      .collect().map(_.getLong(0)).toSet
    assert(!expired.contains(1L) && wh.listVersions("t").contains(1L),
      s"expiry must skip tagged versions (expired: $expired)")
    assert(spark.sql("CALL g8.system.tags('t')").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("audited", 1L)))
    // free-form tag props refuse toward the validating procedure
    intercept[Exception] {
      spark.sql("ALTER TABLE g8.t SET TBLPROPERTIES ('tag.x' = '99')")
    }
    // tagging a GC'd version refuses; duplicate tag names refuse
    intercept[Exception] {
      spark.sql("CALL g8.system.create_tag('t', 'gone', 2)").collect()
    }
    intercept[Exception] {
      spark.sql("CALL g8.system.create_tag('t', 'audited', 5)").collect()
    }
    // drop releases the pin: the next commit's GC ages the version out
    assert(spark.sql("CALL g8.system.drop_tag('t', 'audited')")
      .head.getBoolean(1))
    spark.sql("INSERT OVERWRITE g8.t VALUES (9L, 'final')")
    assert(!wh.listVersions("t").contains(1L),
      "an untagged version re-enters the retention window")
    intercept[Exception] {
      spark.sql("SELECT * FROM g8.t VERSION AS OF 'audited'").collect()
    }
  }

  test("CALL emit_changelog + the feed view table + expire_consumed_hops close the feed loop in SQL") {
    val root = tmpDir("cat-feed")
    val wh = Warehouse(root, retain = 8)
    register("g4", root)
    wh.overwrite(Seq((1L, "a")).toDF("id", "s").localCheckpoint(true), "m")
    // first call registers the cursor (no hops yet)
    assert(spark.sql("CALL g4.system.emit_changelog('m', 'feed', 'id')")
      .count() == 0)
    wh.overwrite(Seq((1L, "a2"), (2L, "b")).toDF("id", "s")
      .localCheckpoint(true), "m")
    val hops = spark.sql("CALL g4.system.emit_changelog('m', 'feed', 'id')")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hops.toSeq == Seq((1L, 2L)))
    // the feed view table itself is queryable SQL
    val ops = spark.sql(
      "SELECT _change_type, id FROM g4.feed ORDER BY id, _change_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ops.contains(("insert", 2L)))
    // nothing consumed -> nothing sweepable, even aged
    assert(spark.sql("CALL g4.system.expire_consumed_hops('feed', 0)")
      .count() == 0)
    // no registrations yet: the lag view is empty, not a guess
    assert(spark.sql("CALL g4.system.consumers('feed')").count() == 0)
    // SQL registration (round 19): the consumer gates retention and its
    // lag is visible; a non-feed table refuses the registration loudly
    spark.sql("CALL g4.system.register_consumer('feed', 'etl', 1)")
    val lag = spark.sql("SELECT consumer, cursor, hops_behind, " +
      "blocking_retention FROM g4.feed.consumers").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(lag == Seq(("etl", 1L, 1L, true)),
      s"one un-absorbed hop above cursor 1 must show as the laggard: $lag")
    // absorbed through v2: the hop sweeps once aged, lag drops to zero
    spark.sql("CALL g4.system.register_consumer('feed', 'etl', 2)")
    assert(spark.sql("SELECT blocking_retention FROM g4.feed.consumers")
      .head.getBoolean(0) == false)
    val e = intercept[Exception] {
      spark.sql("CALL g4.system.register_consumer('m', 'etl', 1)").collect()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(
        _.contains("not a changelog feed view"))), e.getMessage)
    // stale-HIGH guard (round 20, advice): a cursor above the feed's
    // emission cursor would silently mark unemitted hops as absorbed
    // and let retention drop hops no consumer saw — refused loudly
    val eHigh = intercept[Exception] {
      spark.sql("CALL g4.system.register_consumer('feed', 'etl', 99)")
        .collect()
    }
    assert(Iterator.iterate(eHigh: Throwable)(_.getCause)
      .takeWhile(_ != null).exists(x => Option(x.getMessage).exists(
        _.contains("above feed 'feed''s emission cursor"))),
      eHigh.getMessage)
    assert(spark.sql("SELECT cursor FROM g4.feed.consumers")
      .head.getLong(0) == 2L,
      "a refused stale-HIGH registration must not move the cursor")
    val swept = spark.sql("CALL g4.system.expire_consumed_hops('feed', 0)")
      .collect().map(_.getString(0))
    assert(swept.length == 1 && swept.head.endsWith("batch_2"),
      s"the absorbed hop must sweep: ${swept.toSeq}")
  }

  test("SQL views: create/select/replace/alter/rename/drop lifecycle; one-name-one-thing guards; time travel refused by mechanism") {
    val root = tmpDir("cat-views")
    val wh = Warehouse(root, retain = 4)
    register("gv1", root)
    wh.overwrite(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("id", "s", "v").localCheckpoint(true), "t")
    spark.sql(
      "CREATE VIEW gv1.daily AS SELECT s, sum(v) AS sv FROM gv1.t GROUP BY s")
    def rows: Seq[(String, Double)] =
      spark.sql("SELECT s, sv FROM gv1.daily ORDER BY s").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(rows == Seq(("a", 3.0), ("b", 3.0)))
    // stored SQL text, not a materialization: the view serves the
    // CURRENT snapshot after the table moves
    wh.overwrite(Seq((1L, "a", 10.0), (2L, "b", 2.0))
      .toDF("id", "s", "v").localCheckpoint(true), "t")
    assert(rows == Seq(("a", 10.0), ("b", 2.0)))
    // one name means one thing — in both directions
    val eTv = intercept[Exception] {
      spark.sql("CREATE VIEW gv1.t AS SELECT 1 AS one").collect()
    }
    assert(Iterator.iterate(eTv: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(m =>
        m.contains("already exists"))), eTv.getMessage)
    val eVt = intercept[Exception] {
      spark.sql("CREATE TABLE gv1.daily (x BIGINT)").collect()
    }
    assert(Iterator.iterate(eVt: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(m =>
        m.contains("already exists"))), eVt.getMessage)
    // time travel through a view: refused naming the mechanism
    val eTt = intercept[Exception] {
      spark.sql("SELECT * FROM gv1.daily VERSION AS OF 1").collect()
    }
    assert(Iterator.iterate(eTt: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(
        _.contains("no snapshot lineage"))), eTt.getMessage)
    // replace swaps the stored query atomically-enough for DDL
    spark.sql(
      "CREATE OR REPLACE VIEW gv1.daily AS SELECT count(*) AS n FROM gv1.t")
    assert(spark.sql("SELECT n FROM gv1.daily").head.getLong(0) == 2L)
    // property surface via ALTER VIEW
    spark.sql("ALTER VIEW gv1.daily SET TBLPROPERTIES ('team' = 'ingest')")
    assert(spark.sql("SHOW TBLPROPERTIES gv1.daily").collect()
      .exists(r => r.getString(0) == "team" && r.getString(1) == "ingest"))
    spark.sql("ALTER VIEW gv1.daily UNSET TBLPROPERTIES ('team')")
    assert(!spark.sql("SHOW TBLPROPERTIES gv1.daily").collect()
      .exists(r => r.getString(0) == "team"))
    // rename, then the old name is free and the new one serves
    spark.sql("ALTER VIEW gv1.daily RENAME TO gv1.daily2")
    assert(spark.sql("SELECT n FROM gv1.daily2").head.getLong(0) == 2L)
    intercept[Exception] {
      spark.sql("SELECT * FROM gv1.daily").collect()
    }
    // SHOW VIEWS lists it; DROP removes it
    assert(spark.sql("SHOW VIEWS IN gv1").collect()
      .map(_.getString(1)).contains("daily2"))
    spark.sql("DROP VIEW gv1.daily2")
    intercept[Exception] {
      spark.sql("SELECT * FROM gv1.daily2").collect()
    }
    // the data table never flinched
    assert(spark.sql("SELECT count(*) FROM gv1.t").head.getLong(0) == 2L)
  }

  test("two concurrent FIRST merge_changes on one absent target both land (expect-absent CAS, not last-wins)") {
    import spark.implicits._
    val root = tmpDir("cat-firstmerge")
    register("g9", root)
    Seq((1L, "2024-01-01", "a", "I"), (2L, "2024-01-01", "b", "I"))
      .toDF("id", "ts", "v", "op").write.parquet(s"$root/src_a")
    Seq((11L, "2024-01-01", "x", "I"), (12L, "2024-01-01", "y", "I"))
      .toDF("id", "ts", "v", "op").write.parquet(s"$root/src_b")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("src_a", "src_b").map { s =>
      new Thread(() => {
        try spark.sql(s"CALL g9.system.merge_changes('$s', 'm', 'id', 'ts')")
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"merge must retry conflicts internally: ${errs}")
    val ids = spark.sql("SELECT id FROM g9.m").collect()
      .map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 11L, 12L),
      s"a first merge was lost (last-wins): $ids")
  }

  test("t.history surfaces the lineage: stamp-ordered parents, rollback(vX) provenance, fast_forward promotions, is_current") {
    val root = tmpDir("cat-hist")
    val wh = Warehouse(root, retain = 8)
    register("gh1", root)
    // the catalog's own warehouse must retain the whole lineage too
    spark.conf.set("spark.sql.catalog.gh1.retain", "8")
    (1 to 3).foreach { v =>
      wh.overwrite(Seq((v.toLong, s"state$v")).toDF("id", "s")
        .localCheckpoint(true), "t")
      Thread.sleep(15) // distinct publish stamps
    }
    spark.sql("CALL gh1.system.rollback_to_version('t', 1)").collect()
    Thread.sleep(15)
    spark.sql("CALL gh1.system.create_branch('t', 'fix')").collect()
    Seq((9L, "br")).toDF("id", "s").createOrReplaceTempView("hist_src")
    spark.conf.set("spark.graft.wap.branch", "fix")
    try spark.sql("INSERT INTO gh1.t SELECT * FROM hist_src")
    finally spark.conf.unset("spark.graft.wap.branch")
    spark.sql("CALL gh1.system.fast_forward('t', 'fix')").collect()
    val h = spark.sql(
      "SELECT version, parent, operation, is_current FROM gh1.t.history " +
        "ORDER BY made_current_at, version").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getString(2), r.getBoolean(3)))
    assert(h.toSeq == Seq(
      (1L, -1L, "commit", false),
      (2L, 1L, "commit", false),
      (3L, 2L, "commit", false),
      (4L, 3L, "rollback(v1)", false),
      (5L, 4L, "fast_forward(fix)", true)), h.toSeq.toString)
    // the rollback provenance is version-LOCAL: the post-rollback commit
    // (v5) reports its own operation, not an inherited rollback marker
    assert(h.count(_._3.startsWith("rollback")) == 1)
    // expiry gaps never mis-attribute: v4's true parent (v3) ages out →
    // parent reports NULL (the stored lineage refuses to claim a
    // surviving earlier version), while v5's retained parent stands
    spark.sql("CALL gh1.system.expire_snapshots('t', 2)").collect()
    val h2 = spark.sql(
      "SELECT version, parent FROM gh1.t.history ORDER BY version")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(h2.toSeq == Seq((4L, -1L), (5L, 4L)), h2.toSeq.toString)
  }

  test("t.partitions reports the per-partition footer census: flat snapshots, day grain, and hour-grain straddlers — no data read") {
    val root = tmpDir("cat-parts")
    val wh = Warehouse(root, retain = 8)
    register("gp1", root)
    // flat versioned table: one unpartitioned row
    wh.overwrite((1L to 20L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(3).localCheckpoint(true), "flat")
    val flat = spark.sql(
      "SELECT partition, file_count, record_count FROM gp1.flat.partitions")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(flat.toSeq == Seq(("<unpartitioned>", 3L, 20L)), flat.toSeq)
    // hidden-day table: one row per day with exact footer counts
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    wh.declareTimePartition("log", "ts")
    wh.appendBatch(Seq((1L, ts("2024-01-01 05:00:00")),
      (2L, ts("2024-01-01 06:00:00"))).toDF("id", "ts"), "log", 0L)
    wh.appendBatch(Seq((3L, ts("2024-01-02 07:00:00"))).toDF("id", "ts"),
      "log", 1L)
    val days = spark.sql(
      "SELECT partition, record_count FROM gp1.log.partitions " +
        "ORDER BY partition").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(days.toSeq == Seq(("p_day=2024-01-01", 2L),
      ("p_day=2024-01-02", 1L)), days.toSeq)
    // hour-grain evolution: new batches report day/hour rows, the
    // pre-evolution day-era batch stays a day-grain row beside them
    wh.evolveTimeGranularity("log")
    wh.appendBatch(Seq((4L, ts("2024-01-03 09:10:00")),
      (5L, ts("2024-01-03 11:00:00"))).toDF("id", "ts"), "log", 2L)
    val hours = spark.sql(
      "SELECT partition, record_count FROM gp1.log.partitions " +
        "ORDER BY partition").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val (h9, h11) = (Tables.hourIndexOf(ts("2024-01-03 09:10:00")),
      Tables.hourIndexOf(ts("2024-01-03 11:00:00")))
    assert(hours.toSeq == Seq(
      ("p_day=2024-01-01", 2L), ("p_day=2024-01-02", 1L),
      (s"p_day=2024-01-03/p_hour=$h9", 1L),
      (s"p_day=2024-01-03/p_hour=$h11", 1L)), hours.toSeq)
    // MONTH grain: one census row per p_month dir (pre-r19 the month
    // layout fell through the day listing and reported an EMPTY census)
    wh.declareTimePartition("mlog", "ts", granularity = "month")
    wh.appendBatch(Seq((1L, ts("2024-01-05 01:00:00")),
      (2L, ts("2024-01-20 01:00:00")),
      (3L, ts("2024-02-02 01:00:00"))).toDF("id", "ts"), "mlog", 0L)
    val months = spark.sql(
      "SELECT partition, record_count FROM gp1.mlog.partitions " +
        "ORDER BY partition").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val (m1, m2) = (Tables.monthIndexOf(ts("2024-01-05 00:00:00")),
      Tables.monthIndexOf(ts("2024-02-02 00:00:00")))
    assert(months.toSeq == Seq(
      (s"p_month=$m1", 2L), (s"p_month=$m2", 1L)), months.toSeq)
  }

  test("t.partitions serves a FRESH clustered census from the zone-map manifest (zero footer opens); stale manifests fall back to footers exactly") {
    val root = tmpDir("cat-parts-manifest")
    val wh = Warehouse(root, retain = 8)
    register("gpm", root)
    wh.overwrite((1L to 60L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(3).localCheckpoint(true), "t")
    Maintenance.declareClustering(wh, "t", Seq("id"), targetFiles = Some(4))
    assert(spark.sql("CALL gpm.system.cluster('t')").head.getString(1)
      == "full")
    def parts() = spark.sql(
      "SELECT partition, file_count, record_count FROM gpm.t.partitions")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val fresh = parts()
    assert(fresh.size == 1 && fresh.head._3 == 60L, fresh)
    val nFiles = fresh.head._2
    // PROVE the fresh path reads the manifest, not footers: doctor the
    // manifest's per-file `rows` (+5 each, census untouched) — a
    // manifest-served census reflects the doctored sum, a footer walk
    // could not
    val snap = wh.snapshotPath("t")
    val doctored = ZoneMap.manifest(spark, snap)
      .withColumn("rows", col("rows") + lit(5L)).localCheckpoint(true)
    doctored.coalesce(1).write.mode("overwrite")
      .parquet(s"$snap/${ZoneMap.ManifestDir}")
    val lied = parts()
    assert(lied.head._3 == 60L + 5L * nFiles,
      s"fresh t.partitions must serve from the manifest: $lied")
    // t.files rides the same manifest-served discipline (zero footers
    // on a fresh manifest): the doctored rows surface per file too
    val liedFiles = spark.sql(
      "SELECT record_count FROM gpm.t.files").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(liedFiles.sum == 60L + 5L * nFiles && liedFiles.size == nFiles,
      s"fresh t.files must serve from the manifest: $liedFiles")
    // STALE manifest (an append lands files outside its census): the
    // census must fall back to the exact footer walk — the doctored
    // numbers vanish, the appended rows count
    spark.sql("INSERT INTO gpm.t VALUES (100, 'x'), (101, 'y')")
    val stale = parts()
    assert(stale.head._3 == 62L,
      s"stale manifest must footer-walk to the exact census: $stale")
    assert(spark.sql("SELECT sum(record_count) FROM gpm.t.files")
      .head.getLong(0) == 62L,
      "stale t.files must footer-walk to the exact census too")
    // a FULL re-cluster rebuilds the manifest from the data (an
    // INCREMENTAL one would carry the doctored rows — carried manifest
    // entries are trusted by design): fresh again and TRUE
    Maintenance.cluster(wh = wh, spark = spark, table = "t",
      dims = Seq("id"), targetFiles = 4)
    val reclustered = parts()
    assert(reclustered.head._3 == 62L, reclustered)
    assert(ZoneMap.isFresh(spark, wh.snapshotPath("t")))
  }

  test("t.refs metadata table surfaces main, live branches (head+base) and tag pins; agrees with CALL branches") {
    val root = tmpDir("cat-refs")
    val wh = Warehouse(root, retain = 8)
    register("g10", root)
    wh.overwrite(Seq((1L, "a")).toDF("id", "s").localCheckpoint(true), "t")
    val vMain = wh.currentVersion("t").get
    spark.sql(s"CALL g10.system.create_tag('t', 'golden', $vMain)").collect()
    spark.sql("CALL g10.system.create_branch('t', 'wip')").collect()
    spark.conf.set("spark.graft.wap.branch", "wip")
    try {
      Seq((2L, "b")).toDF("id", "s").createOrReplaceTempView("refs_src")
      spark.sql("INSERT INTO g10.t SELECT * FROM refs_src")
    } finally spark.conf.unset("spark.graft.wap.branch")
    val refs = spark.sql("SELECT name, type, version, base FROM g10.t.refs")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val (head, base) = wh.branches("t")("wip")
    assert(refs == Set(
      ("main", "BRANCH", vMain, -1L),
      ("wip", "BRANCH", head, base),
      ("golden", "TAG", vMain, -1L)), refs.toString)
    assert(head == vMain + 1 && base == vMain)
    // agreement with the procedure face
    val viaCall = spark.sql("CALL g10.system.branches('t')").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaCall == Set(("wip", head, base)))
  }
}
