package graft

import graft.operators.Cdc
import graft.sources.GraftCatalog
import graft.sources.Tables.Warehouse

/** `MERGE INTO` / `UPDATE` / rewrite-flavor `DELETE` — Spark's group-based
  * copy-on-write row-level operations over [[GraftCatalog]] tables: the
  * post-operation rows stream through [[graft.sources.GraftCowBatchWrite]]
  * into an exclusively-allocated stage and publish by pointer CAS, so the
  * row-level SQL face carries exactly the same snapshot atomicity and
  * time-travel retention as every other committed write. The headline
  * case is the reference's own workload: a CDC batch applied by literal
  * `MERGE INTO` must equal the engine's fold ([[Cdc.applyBatch]], the q18
  * semantics).
  */
class MergeIntoSqlSpec extends SparkTestBase {
  import spark.implicits._

  private def register(name: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", root)
  }

  test("MERGE INTO applies a CDC batch == the engine's fold (q18 semantics)") {
    val root = tmpDir("merge-cdc")
    val wh = Warehouse(root, retain = 8)
    register("m1", root)
    val cfg = CdcConfig("id", "ts")
    // seed: the fold of an initial insert batch; the SQL mirror holds the
    // VISIBLE projection (MERGE maintains plain rows - tombstone
    // retention for late arrivals is the engine fold's own concern)
    val seed = Cdc.fold(Seq(
      (1L, "alice", "I", "t01"), (2L, "bob", "I", "t02"),
      (3L, "carol", "I", "t03")).toDF("id", "name", "op", "ts"), cfg)
    wh.overwrite(Cdc.currentState(seed).select("id", "name")
      .localCheckpoint(true), "mirror")
    // one CDC batch: update 1, delete 2, insert 4 — pre-folded to
    // latest-per-key (the changelog feed's hop shape)
    val batch = Seq(
      (1L, "alice2", "U", "t10"), (2L, "bob", "D", "t11"),
      (4L, "dave", "I", "t12")).toDF("id", "name", "op", "ts")
    batch.createOrReplaceTempView("cdc_batch")

    spark.sql(
      """MERGE INTO m1.mirror t USING cdc_batch s ON t.id = s.id
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *""".stripMargin)

    val viaMerge = spark.sql("SELECT id, name FROM m1.mirror ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // the engine's own fold of the same batch over the same seed
    val viaFold = Cdc.currentState(Cdc.applyBatch(seed, batch, cfg))
      .select("id", "name").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaMerge == viaFold)
    assert(viaMerge == Seq((1L, "alice2"), (3L, "carol"), (4L, "dave")))
  }

  test("MERGE commits a retained snapshot: time travel sees the pre-merge state") {
    val root = tmpDir("merge-tt")
    val wh = Warehouse(root, retain = 8)
    register("m2", root)
    spark.sql("CREATE TABLE m2.t AS SELECT id, CAST(x AS DOUBLE) AS x " +
      "FROM VALUES (1, 10.0), (2, 20.0) AS v(id, x)")
    val before = wh.currentVersion("t").get
    Seq((2, 99.0), (3, 30.0)).toDF("id", "x").createOrReplaceTempView("m2src")
    spark.sql(
      """MERGE INTO m2.t t USING m2src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET x = s.x
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT sum(x) FROM m2.t").head.getDouble(0) == 139.0)
    assert(wh.currentVersion("t").get > before)
    assert(spark.sql(s"SELECT sum(x) FROM m2.t VERSION AS OF $before")
      .head.getDouble(0) == 30.0)
  }

  test("UPDATE and non-pushable DELETE ride the same COW rewrite") {
    val root = tmpDir("merge-upd")
    register("m3", root)
    spark.sql("CREATE TABLE m3.t AS SELECT id, grp, CAST(x AS DOUBLE) AS x " +
      "FROM VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'a', 3.0), (4, 'b', 4.0) " +
      "AS v(id, grp, x)")
    spark.sql("UPDATE m3.t SET x = x * 10 WHERE grp = 'a'")
    assert(spark.sql("SELECT sum(x) FROM m3.t").head.getDouble(0) == 46.0)
    // a modulo predicate is NOT expressible as a pushed source filter —
    // before SupportsRowLevelOperations this delete could only error;
    // now it rewrites
    spark.sql("DELETE FROM m3.t WHERE id % 2 = 0")
    assert(spark.sql("SELECT id FROM m3.t ORDER BY id").collect()
      .map(_.getInt(0)).toSeq == Seq(1, 3))
    // rewrite-flavor delete-ALL: the published snapshot must stay
    // readable (schema-bearing) even with zero surviving rows
    spark.sql("DELETE FROM m3.t WHERE id % 1 = 0")
    assert(spark.sql("SELECT * FROM m3.t").count() == 0)
    assert(spark.sql("SELECT * FROM m3.t").schema.fieldNames.toSeq ==
      Seq("id", "grp", "x"))
  }

  test("file-granular COW groups: UPDATE on a clustered table rewrites only the matched files") {
    import org.apache.spark.sql.functions.col
    val root = tmpDir("merge-groups")
    val wh = Warehouse(root, retain = 8)
    register("m5", root)
    wh.overwrite(spark.range(1000).select(col("id"),
      (col("id") % 10).as("grp"), (col("id") * 1.0).as("x"))
      .localCheckpoint(true), "t")
    graft.plans.Maintenance.cluster(spark, wh, "t", Seq("grp"), 10)
    val before = wh.currentVersion("t").get
    val baseFiles = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$root/t.v$before")).iterator()
    var baseNames = Set.empty[String]
    while (baseFiles.hasNext) {
      val n = baseFiles.next().getFileName.toString
      if (n.endsWith(".parquet")) baseNames += n
    }
    assert(baseNames.size >= 8, s"clustered layout expected, got $baseNames")

    spark.sql("UPDATE m5.t SET x = -1.0 WHERE grp = 3")

    // correctness first: exactly the grp-3 rows changed
    assert(spark.sql("SELECT count(*) FROM m5.t").head.getLong(0) == 1000)
    assert(spark.sql("SELECT count(*) FROM m5.t WHERE x = -1.0")
      .head.getLong(0) == 100)
    assert(spark.sql("SELECT CAST(sum(x) AS LONG) FROM m5.t WHERE grp <> 3")
      .head.getLong(0) == (0 until 1000).filter(_ % 10 != 3).sum)
    // the new version CARRIES the unmatched files verbatim (same names,
    // hard-linked) and rewrote only the matched region
    val cur = wh.currentVersion("t").get
    val s = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$root/t.v$cur"))
    var carried = 0; var fresh = 0
    try s.iterator().forEachRemaining { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".parquet")) {
        val links = java.nio.file.Files.getAttribute(p, "unix:nlink")
          .asInstanceOf[Integer].intValue()
        if (baseNames.contains(n) && links > 1) carried += 1 else fresh += 1
      }
    } finally s.close()
    assert(carried >= baseNames.size - 2,
      s"expected ~${baseNames.size - 1} carried files, got carried=$carried fresh=$fresh")
    assert(fresh >= 1)
    // time travel still serves the pre-update snapshot
    assert(spark.sql(s"SELECT count(*) FROM m5.t VERSION AS OF $before " +
      "WHERE x = -1.0").head.getLong(0) == 0)

    // a zero-match UPDATE carries everything and rewrites nothing
    spark.sql("UPDATE m5.t SET x = -2.0 WHERE grp = 99")
    assert(spark.sql("SELECT count(*) FROM m5.t WHERE x = -2.0")
      .head.getLong(0) == 0)
    assert(spark.sql("SELECT count(*) FROM m5.t").head.getLong(0) == 1000)
  }

  test("runtime group filtering: MERGE probes matched keys against per-file blooms and carries the rest") {
    import org.apache.spark.sql.functions.col
    val root = tmpDir("merge-runtime")
    val wh = Warehouse(root, retain = 8)
    register("m6", root)
    wh.overwrite(spark.range(1000).select(col("id"),
      (col("id") % 10).as("grp"), (col("id") * 1.0).as("x"))
      .localCheckpoint(true), "t")
    // range-clustered by id into 10 files, with per-file id blooms
    graft.plans.Maintenance.cluster(spark, wh, "t", Seq("id"), 10,
      bloomKeys = Seq("id"))
    val before = wh.currentVersion("t").get
    val baseNames = {
      val s = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$root/t.v$before"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
      } finally s.close()
    }
    assert(baseNames.size >= 8)
    // three keys from ONE id-range file: the runtime IN(matched keys)
    // filter must narrow the replaced groups to that neighborhood
    Seq((101L, -1.0), (102L, -2.0), (107L, -3.0)).toDF("id", "x")
      .createOrReplaceTempView("m6src")
    spark.sql(
      """MERGE INTO m6.t t USING m6src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET x = s.x""".stripMargin)
    // correctness: exactly those three rows changed
    assert(spark.sql("SELECT count(*) FROM m6.t").head.getLong(0) == 1000)
    assert(spark.sql("SELECT CAST(sum(x) AS LONG) FROM m6.t WHERE id IN (101,102,107)")
      .head.getLong(0) == -6)
    assert(spark.sql("SELECT count(*) FROM m6.t WHERE x < 0").head.getLong(0) == 3)
    // the unmatched id-range files carried as hard links under their names
    val cur = wh.currentVersion("t").get
    var carried = 0; var fresh = 0
    val s2 = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$root/t.v$cur"))
    try s2.iterator().forEachRemaining { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".parquet")) {
        val links = java.nio.file.Files.getAttribute(p, "unix:nlink")
          .asInstanceOf[Integer].intValue()
        if (baseNames.contains(n) && links > 1) carried += 1 else fresh += 1
      }
    } finally s2.close()
    assert(carried >= baseNames.size - 3,
      s"runtime group filter expected to carry most files: carried=$carried fresh=$fresh of ${baseNames.size}")
  }

  test("NOT MATCHED BY SOURCE clauses see the whole table (group filtering must not hide unmatched rows)") {
    import org.apache.spark.sql.functions.col
    val root = tmpDir("merge-nmbs")
    val wh = Warehouse(root, retain = 8)
    register("m7", root)
    wh.overwrite(spark.range(1000).select(col("id"),
      (col("id") * 1.0).as("x")).localCheckpoint(true), "t")
    graft.plans.Maintenance.cluster(spark, wh, "t", Seq("id"), 10,
      bloomKeys = Seq("id"))
    Seq((5L, 0.0), (900L, 0.0)).toDF("id", "x")
      .createOrReplaceTempView("m7src")
    // every target row NOT matched by the 2-key source must be deleted —
    // those rows live in files a matched-keys group filter would exclude,
    // so a filter applied here would silently keep 998 rows
    spark.sql(
      """MERGE INTO m7.t t USING m7src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET x = -1.0
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val rows = spark.sql("SELECT id, x FROM m7.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((5L, -1.0), (900L, -1.0)), s"got $rows")
  }

  test("row-level operations refuse on layout-contract tables with the owning mechanism named") {
    val root = tmpDir("merge-refuse")
    val wh = Warehouse(root, retain = 8)
    register("m4", root)
    wh.overwrite(Seq((1L, "a")).toDF("id", "s").localCheckpoint(true), "m")
    graft.plans.MirrorChangelog.emitPending(spark, wh, "m", "m_feed", "id")
    wh.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .localCheckpoint(true), "m")
    graft.plans.MirrorChangelog.emitPending(spark, wh, "m", "m_feed", "id")
    val e = intercept[Exception] {
      spark.sql("UPDATE m4.m_feed SET s = 'x' WHERE id = 1")
    }
    assert(e.getMessage.contains("consumer contract"))
  }
}
