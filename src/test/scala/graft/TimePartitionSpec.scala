package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.plans.Maintenance
import graft.sources.Tables
import graft.sources.Tables.Warehouse

/** Hidden time partitioning of append-batch tables (the Iceberg `days(ts)`
  * partition transform on plain parquet — round-11 verdict item 3): the
  * declared layout is invisible to plain readers, replay stays idempotent,
  * time-bounded reads prune whole day partitions (plan-asserted
  * PartitionFilters), and tombstone expiry touches only expired days.
  */
class TimePartitionSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def rows(n: Int, day0: Int = 1): Seq[(Long, Timestamp, String)] =
    (0 until n).map { i =>
      (i.toLong, ts(f"2024-01-${day0 + i % 3}%02d 0${i % 9}:00:00"), s"e$i")
    }

  private def mkTable(wh: Warehouse): Unit = {
    import spark.implicits._
    wh.declareTimePartition("log", "ts")
    // two batches, three days each
    wh.appendBatch(rows(9).toDF("id", "ts", "etype"), "log", 0L)
    wh.appendBatch(rows(9, day0 = 3).map { case (i, t, e) => (i + 100, t, e) }
      .toDF("id", "ts", "etype"), "log", 1L)
  }

  private def dirNames(p: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val s = Files.list(Paths.get(p))
    try s.iterator().asScala.map(_.getFileName.toString)
      .filterNot(_.startsWith("_")).toSet
    finally s.close()
  }

  test("declared layout: day/batch dirs on disk, hidden from plain reads, replay idempotent") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("tp-layout"))
    mkTable(wh)
    val days = dirNames(wh.tablePath("log"))
    assert(days == Set("p_day=2024-01-01", "p_day=2024-01-02",
      "p_day=2024-01-03", "p_day=2024-01-04", "p_day=2024-01-05"), days)
    assert(dirNames(s"${wh.tablePath("log")}/p_day=2024-01-03") ==
      Set("p_batch=0", "p_batch=1"), "day 3 straddles both batches")
    // HIDDEN: the plain recursive read sees the flat-layout schema
    val plain = wh.read(spark, "log")
    assert(plain.columns.toSeq == Seq("id", "ts", "etype"))
    assert(plain.count() == 18)
    // replaying batch 1 (same deterministic rows) rewrites its own
    // partitions — no duplicates (the appendBatch contract)
    wh.appendBatch(rows(9, day0 = 3).map { case (i, t, e) => (i + 100, t, e) }
      .toDF("id", "ts", "etype"), "log", 1L)
    assert(wh.read(spark, "log").count() == 18,
      "an at-least-once replay must not duplicate rows")
  }

  test("readTimePruned: real PartitionFilters prune whole days; bounds exact on the residual") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("tp-pruned"))
    mkTable(wh)
    val pruned = wh.readTimePruned(spark, "log",
      fromTs = Some(ts("2024-01-02 00:00:00")),
      toTs = Some(ts("2024-01-03 05:30:00")))
    // schema identical to the flat layout (hidden partitioning)
    assert(pruned.columns.toSeq == Seq("id", "ts", "etype"))
    val expected = (rows(9) ++ rows(9, day0 = 3).map { case (i, t, e) =>
      (i + 100, t, e) })
      .filter { case (_, t, _) =>
        !t.before(ts("2024-01-02 00:00:00")) &&
          !t.after(ts("2024-01-03 05:30:00")) }
      .map(_._1).toSet
    assert(pruned.select("id").collect().map(_.getLong(0)).toSet == expected)
    // the day predicate must reach the scan as a PARTITION filter —
    // whole out-of-range day dirs never open
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p_day"),
      s"day bounds must prune partitions:\n$plan")
    val filesRead = pruned
      .withColumn("_f", org.apache.spark.sql.functions.input_file_name())
      .select("_f").distinct().collect().map(_.getString(0))
    assert(filesRead.nonEmpty &&
      filesRead.forall(f => f.contains("p_day=2024-01-02") ||
        f.contains("p_day=2024-01-03")),
      s"only in-range day partitions may be read: ${filesRead.toSeq}")
  }

  test("compact merges files WITHIN (day,batch) partitions; pruning and replay unit survive") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("tp-compact"))
    wh.declareTimePartition("log", "ts")
    // appendBatch now co-locates each partition into one file, so build
    // the multi-file-per-partition state compaction exists for the way
    // it arises in the wild: a LEGACY table written before the
    // co-location fix (simulated with a direct partitioned write)
    rows(9).toDF("id", "ts", "etype")
      .withColumn("p_day", to_date(col("ts")))
      .withColumn("p_batch", lit(0L))
      .repartition(8)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("p_day", "p_batch").parquet(wh.tablePath("log"))
    // the simulation detail the real layout never has: drop the local
    // FS checksum crumb so the dir census below sees only the layout
    Files.deleteIfExists(Paths.get(wh.tablePath("log"), "._SUCCESS.crc"))
    def partFiles(rel: String): Int = {
      import scala.jdk.CollectionConverters._
      val d = Paths.get(wh.tablePath("log"), rel)
      val s = Files.list(d)
      try s.iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
    assert(partFiles("p_day=2024-01-01/p_batch=0") > 1,
      "precondition: the wide write left multiple files per partition")
    val before = wh.read(spark, "log").collect().map(_.toSeq).toSet
    Maintenance.compact(spark, wh, "log", targetFiles = 1)
    assert(partFiles("p_day=2024-01-01/p_batch=0") == 1,
      "compaction coalesces within the partition")
    assert(dirNames(wh.tablePath("log")).forall(_.startsWith("p_day=")),
      s"the day layout must survive compaction: ${dirNames(wh.tablePath("log"))}")
    assert(wh.read(spark, "log").collect().map(_.toSeq).toSet == before)
    // time pruning still works post-compact
    assert(wh.readTimePruned(spark, "log",
      fromTs = Some(ts("2024-01-02 00:00:00"))).count() ==
      before.size - 3)
  }

  test("partitioned tombstone expiry reads and rewrites ONLY expired days; in-horizon files untouched") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("tp-expire"))
    wh.declareTimePartition("log", "ts")
    val data = Seq(
      (1L, ts("2024-01-01 10:00:00"), "D"),
      (2L, ts("2024-01-01 11:00:00"), "I"),
      (3L, ts("2024-01-02 10:00:00"), "D"), // whole partition expires
      (4L, ts("2024-01-05 10:00:00"), "D"), // in horizon: kept
      (5L, ts("2024-01-05 11:00:00"), "U"))
    wh.appendBatch(data.toDF("id", "ts", "op"), "log", 0L)
    import scala.jdk.CollectionConverters._
    def filesUnder(rel: String): Map[String, java.nio.file.attribute.FileTime] = {
      val d = Paths.get(wh.tablePath("log"), rel)
      if (!Files.isDirectory(d)) return Map.empty
      val w = Files.walk(d)
      try w.iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => p.toString -> Files.getLastModifiedTime(p)).toMap
      finally w.close()
    }
    val freshBefore = filesUnder("p_day=2024-01-05")
    Maintenance.expireTombstones(spark, wh, "log",
      graft.CdcConfig("id", "ts"), horizon = "2024-01-03 00:00:00")
    // expired-day tombstones gone, same-day non-tombstones kept
    val ids = wh.read(spark, "log").select("id").collect()
      .map(_.getLong(0)).toSet
    assert(ids == Set(2L, 4L, 5L), s"got $ids")
    // the fully-expired day partition is deleted outright
    assert(!Files.isDirectory(
      Paths.get(wh.tablePath("log"), "p_day=2024-01-02")))
    // in-horizon day files are BYTE-UNTOUCHED (pruned from the rewrite)
    assert(filesUnder("p_day=2024-01-05") == freshBefore,
      "in-horizon partitions must not be read or rewritten")
    // idempotent: a second run changes nothing
    Maintenance.expireTombstones(spark, wh, "log",
      graft.CdcConfig("id", "ts"), horizon = "2024-01-03 00:00:00")
    assert(wh.read(spark, "log").count() == 3)
  }

  test("OBJECT-STORE expiry + compaction: the rename-free per-partition replace keeps the same contract (expired days rewritten, in-horizon untouched)") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("tp-expire-os"), retain = 2,
      io = graft.sources.ObjectStoreIO)
    wh.declareTimePartition("log", "ts")
    val data = Seq(
      (1L, ts("2024-01-01 10:00:00"), "D"),
      (2L, ts("2024-01-01 11:00:00"), "I"),
      (3L, ts("2024-01-02 10:00:00"), "D"),
      (4L, ts("2024-01-05 10:00:00"), "D"),
      (5L, ts("2024-01-05 11:00:00"), "U"))
    wh.appendBatch(data.toDF("id", "ts", "op"), "log", 0L)
    import scala.jdk.CollectionConverters._
    def filesUnder(rel: String): Set[String] = {
      val d = Paths.get(wh.tablePath("log"), rel)
      if (!Files.isDirectory(d)) return Set.empty
      val w = Files.walk(d)
      try w.iterator().asScala.filter(Files.isRegularFile(_))
        .map(_.toString).toSet
      finally w.close()
    }
    val freshBefore = filesUnder("p_day=2024-01-05")
    Maintenance.expireTombstones(spark, wh, "log",
      graft.CdcConfig("id", "ts"), horizon = "2024-01-03 00:00:00")
    assert(wh.read(spark, "log").select("id").collect()
      .map(_.getLong(0)).toSet == Set(2L, 4L, 5L))
    assert(!Files.isDirectory(
      Paths.get(wh.tablePath("log"), "p_day=2024-01-02")))
    assert(filesUnder("p_day=2024-01-05") == freshBefore,
      "in-horizon partitions must not be replaced")
    // the rename-free in-place compaction serves the same rows after
    Maintenance.compact(spark, wh, "log", targetFiles = 1)
    assert(wh.read(spark, "log").select("id").collect()
      .map(_.getLong(0)).toSet == Set(2L, 4L, 5L))
    // no staging debris left behind
    val root = Paths.get(wh.tablePath("log")).getParent
    val s = Files.list(root)
    val debris =
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.contains("epochstage")).toSeq
      finally s.close()
    assert(debris.isEmpty, debris.toString)
  }

  test("hours(ts) grain: p_day/p_hour/p_batch layout, hour-index PartitionFilters, exact bounds") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("tp-hour"))
    wh.declareTimePartition("log", "ts", granularity = "hour")
    val data = Seq(
      (1L, ts("2024-01-01 05:10:00")),
      (2L, ts("2024-01-01 06:10:00")),
      (3L, ts("2024-01-01 07:10:00")),
      (4L, ts("2024-01-02 05:10:00")))
    wh.appendBatch(data.toDF("id", "ts"), "log", 0L)
    val h6 = Tables.hourIndexOf(ts("2024-01-01 06:00:00"))
    assert(Files.isDirectory(Paths.get(wh.tablePath("log"),
      "p_day=2024-01-01", s"p_hour=$h6", "p_batch=0")),
      "the hour layout nests hours-since-epoch under the day")
    // plain read: layout hidden
    assert(wh.read(spark, "log").columns.toSeq == Seq("id", "ts"))
    // pruned read: exact, and the HOUR index reaches the scan as a
    // partition filter — out-of-range hours never open
    val pruned = wh.readTimePruned(spark, "log",
      fromTs = Some(ts("2024-01-01 06:00:00")),
      toTs = Some(ts("2024-01-01 07:59:00")))
    assert(pruned.select("id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("p_hour"), s"hour bounds must prune:\n$plan")
    val filesRead = pruned.withColumn("_f", input_file_name())
      .select("_f").distinct().collect().map(_.getString(0))
    assert(filesRead.forall(f => f.contains(s"p_hour=$h6") ||
      f.contains(s"p_hour=${h6 + 1}")), s"read: ${filesRead.toSeq}")
    // replay idempotence survives the hour grain
    wh.appendBatch(data.toDF("id", "ts"), "log", 0L)
    assert(wh.read(spark, "log").count() == 4)
  }

  test("epoch write fan-out: a many-task epoch lands ONE data file per (day,hour,batch) dir") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("tp-fanout"))
    wh.declareTimePartition("log", "ts", granularity = "hour")
    // an epoch spread over 16 input tasks and 6 (day,hour) partitions:
    // without the pre-write co-location each dir would collect up to 16
    // files (input tasks × partitions — the fan-out the changelog's
    // pruned readers pay on every listing)
    val data = (0 until 600).map(i =>
      (i.toLong, ts(f"2024-01-0${1 + i % 2} 0${i % 3}:10:00")))
    wh.appendBatch(data.toDF("id", "ts").repartition(16), "log", 0L)
    import scala.jdk.CollectionConverters._
    val st = Files.walk(Paths.get(wh.tablePath("log")))
    val perDir =
      try st.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") &&
          !p.getFileName.toString.startsWith("_") &&
          !p.getFileName.toString.startsWith("."))
        .toSeq.groupBy(_.getParent.toString)
      finally st.close()
    assert(perDir.size == 6, s"6 (day,hour) partitions: ${perDir.keys}")
    perDir.foreach { case (dir, files) =>
      assert(files.size == 1, s"$dir holds ${files.size} files; the " +
        "epoch write must co-locate each partition into one file")
    }
    assert(wh.read(spark, "log").count() == 600)
    // replay keeps the contract (same files rewritten, not duplicated)
    wh.appendBatch(data.toDF("id", "ts").repartition(16), "log", 0L)
    assert(wh.read(spark, "log").count() == 600)
  }

  test("months(ts) grain: p_month/p_batch layout, month-index pruning exact") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("tp-month"))
    wh.declareTimePartition("log", "ts", granularity = "month")
    val data = Seq(
      (1L, ts("2024-01-15 10:00:00")),
      (2L, ts("2024-02-15 10:00:00")),
      (3L, ts("2024-03-15 10:00:00")))
    wh.appendBatch(data.toDF("id", "ts"), "log", 0L)
    val feb = Tables.monthIndexOf(ts("2024-02-01 00:00:00"))
    assert(Files.isDirectory(Paths.get(wh.tablePath("log"),
      s"p_month=$feb", "p_batch=0")))
    val pruned = wh.readTimePruned(spark, "log",
      fromTs = Some(ts("2024-02-01 00:00:00")),
      toTs = Some(ts("2024-02-29 23:59:59")))
    assert(pruned.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    val filesRead = pruned.withColumn("_f", input_file_name())
      .select("_f").distinct().collect().map(_.getString(0))
    assert(filesRead.forall(_.contains(s"p_month=$feb")),
      s"only the in-range month may open: ${filesRead.toSeq}")
  }

  test("day->hour spec evolution: mixed reads exact across the flip; migration is day-dir atomic; SQL refuses mid-flip with the mechanism named") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("tp-evolve"))
    wh.declareTimePartition("log", "ts") // day grain
    val oldRows = Seq(
      (1L, ts("2024-01-01 05:10:00")),
      (2L, ts("2024-01-01 18:10:00")),
      (3L, ts("2024-01-02 05:10:00")))
    wh.appendBatch(oldRows.toDF("id", "ts"), "log", 0L)
    // the flip is metadata-only; old days keep their recorded spec
    wh.evolveTimeGranularity("log")
    val newRows = Seq(
      (4L, ts("2024-01-02 06:10:00")), // day 2 now straddles both specs
      (5L, ts("2024-01-03 05:10:00")))
    wh.appendBatch(newRows.toDF("id", "ts"), "log", 1L)
    assert(Files.isDirectory(Paths.get(wh.tablePath("log"),
      "p_day=2024-01-01", "p_batch=0")), "old day keeps the day spec")
    assert(Files.isDirectory(Paths.get(wh.tablePath("log"), "p_day=2024-01-03",
      s"p_hour=${Tables.hourIndexOf(ts("2024-01-03 05:00:00"))}", "p_batch=1")),
      "post-flip batches land hour-grain")
    // MIXED reads: exact and schema-stable across the flip
    def prunedIds(from: String, to: String): Set[Long] =
      wh.readTimePruned(spark, "log",
        fromTs = Some(ts(from)), toTs = Some(ts(to)))
        .select("id").collect().map(_.getLong(0)).toSet
    assert(prunedIds("2024-01-01 00:00:00", "2024-01-03 23:59:59")
      == Set(1L, 2L, 3L, 4L, 5L))
    assert(prunedIds("2024-01-02 00:00:00", "2024-01-02 23:59:59")
      == Set(3L, 4L), "a day straddling both specs must read both eras")
    assert(prunedIds("2024-01-01 06:00:00", "2024-01-02 06:59:00")
      == Set(2L, 3L, 4L))
    // SQL mid-flip: one partition schema cannot serve two specs — refuse
    // loudly, naming the migration
    val cat = "tpev1"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      Paths.get(wh.tablePath("log")).getParent.toString)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.log").collect()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(
        _.contains("migrate_time_granularity"))),
      s"mid-flip SQL must name the migration: ${e.getMessage}")
    // the background rewrite migrates exactly the old-spec days — driven
    // through the SQL procedure the refusal names
    val migrated = spark.sql(
      s"CALL $cat.system.migrate_time_granularity('log')").head.getInt(1)
    assert(migrated == 2, s"two day-era dirs expected, migrated $migrated")
    assert(Maintenance.migrateTimeGranularity(spark, wh, "log") == 0,
      "migration is idempotent")
    assert(Files.isDirectory(Paths.get(wh.tablePath("log"), "p_day=2024-01-01",
      s"p_hour=${Tables.hourIndexOf(ts("2024-01-01 05:00:00"))}", "p_batch=0")))
    assert(prunedIds("2024-01-01 00:00:00", "2024-01-03 23:59:59")
      == Set(1L, 2L, 3L, 4L, 5L), "migration must not change results")
    // post-migration the SQL face serves again (pure tree)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.log").head.getLong(0) == 5L)
    // and a REPLAYED pre-flip batch rewrites its own (day,hour,batch)
    // partitions — still idempotent under the new spec
    wh.appendBatch(oldRows.toDF("id", "ts"), "log", 0L)
    assert(wh.read(spark, "log").count() == 5)
  }

  test("hour->day downshift: metadata-only flip, mixed reads exact, migration MERGES hour dirs into p_batch, round-trips back to hour through live appends") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("tp-downshift"))
    wh.declareTimePartition("log", "ts", granularity = "hour")
    val hot = Seq(
      (1L, ts("2024-02-01 05:10:00")),
      (2L, ts("2024-02-01 18:10:00")),
      (3L, ts("2024-02-02 05:10:00")))
    wh.appendBatch(hot.toDF("id", "ts"), "log", 0L)
    assert(Files.isDirectory(Paths.get(wh.tablePath("log"),
      "p_day=2024-02-01",
      s"p_hour=${Tables.hourIndexOf(ts("2024-02-01 05:00:00"))}",
      "p_batch=0")), "hour-grain batches land p_day/p_hour/p_batch")
    // the DOWNSHIFT is metadata-only: hour-era days keep their recorded
    // spec, new batches land day-grain (a day can straddle both)
    wh.evolveTimeGranularity("log", "day")
    wh.appendBatch(Seq(
      (4L, ts("2024-02-02 06:10:00")), // day 2 straddles both specs
      (5L, ts("2024-02-03 05:10:00"))).toDF("id", "ts"), "log", 1L)
    assert(Files.isDirectory(Paths.get(wh.tablePath("log"),
      "p_day=2024-02-03", "p_batch=1")),
      "post-downshift batches land day-grain")
    def prunedIds(from: String, to: String): Set[Long] =
      wh.readTimePruned(spark, "log",
        fromTs = Some(ts(from)), toTs = Some(ts(to)))
        .select("id").collect().map(_.getLong(0)).toSet
    assert(prunedIds("2024-02-01 00:00:00", "2024-02-03 23:59:59")
      == Set(1L, 2L, 3L, 4L, 5L))
    assert(prunedIds("2024-02-02 00:00:00", "2024-02-02 23:59:59")
      == Set(3L, 4L), "a straddling day must read both eras")
    // SQL mid-downshift: refuse loudly, naming the migration
    val cat = "tpds1"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      Paths.get(wh.tablePath("log")).getParent.toString)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.log").collect()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(
        _.contains("migrate_time_granularity"))),
      s"mid-downshift SQL must name the migration: ${e.getMessage}")
    // the background rewrite MERGES the hour-era days back to p_batch
    val migrated = spark.sql(
      s"CALL $cat.system.migrate_time_granularity('log')").head.getInt(1)
    assert(migrated == 2, s"two hour-era dirs expected, migrated $migrated")
    assert(Maintenance.migrateTimeGranularity(spark, wh, "log") == 0,
      "downshift migration is idempotent")
    assert(Files.isDirectory(Paths.get(wh.tablePath("log"),
      "p_day=2024-02-01", "p_batch=0")), "merged day serves p_batch")
    assert(wh.childDirs(Paths.get(wh.tablePath("log"), "p_day=2024-02-01"),
      "p_hour=").isEmpty, "no hour dirs survive the merge")
    assert(prunedIds("2024-02-01 00:00:00", "2024-02-03 23:59:59")
      == Set(1L, 2L, 3L, 4L, 5L), "migration must not change results")
    assert(prunedIds("2024-02-01 06:00:00", "2024-02-02 06:59:00")
      == Set(2L, 3L, 4L), "sub-day bounds stay exact on the residual")
    // post-migration the SQL face serves the pure day tree again
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.log")
      .head.getLong(0) == 5L)
    // a REPLAYED pre-downshift batch overwrites its own (day, batch)
    // partitions under the new spec — still idempotent
    wh.appendBatch(hot.toDF("id", "ts"), "log", 0L)
    assert(wh.read(spark, "log").count() == 5)
    // ROUND-TRIP: back to hour grain through a live append — the same
    // machinery splits the day-era dirs again. The flip rides the SQL
    // face this time (round 19: evolve_time_granularity procedure)
    assert(spark.sql(
      s"CALL $cat.system.evolve_time_granularity('log', 'hour')")
      .head.getString(1) == "hour")
    assert(wh.timeGranularity("log") == "hour")
    wh.appendBatch(Seq((6L, ts("2024-02-04 09:10:00")))
      .toDF("id", "ts"), "log", 2L)
    assert(prunedIds("2024-02-01 00:00:00", "2024-02-04 23:59:59")
      == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(Maintenance.migrateTimeGranularity(spark, wh, "log") == 3,
      "three day-era dirs split back to hour grain")
    assert(prunedIds("2024-02-01 00:00:00", "2024-02-04 23:59:59")
      == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(Files.isDirectory(Paths.get(wh.tablePath("log"),
      "p_day=2024-02-01",
      s"p_hour=${Tables.hourIndexOf(ts("2024-02-01 05:00:00"))}",
      "p_batch=0")))
  }

  test("hour-grain tombstone expiry rewrites only expired days; hour dirs swept per tuple") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("tp-hour-exp"))
    wh.declareTimePartition("log", "ts", granularity = "hour")
    val data = Seq(
      (1L, ts("2024-01-01 05:00:00"), "D"),
      (2L, ts("2024-01-01 06:00:00"), "I"),
      (3L, ts("2024-01-05 05:00:00"), "D")) // in horizon: kept
    wh.appendBatch(data.toDF("id", "ts", "op"), "log", 0L)
    Maintenance.expireTombstones(spark, wh, "log",
      graft.CdcConfig("id", "ts"), horizon = "2024-01-03 00:00:00")
    assert(wh.read(spark, "log").select("id").collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L))
    // the fully-expired hour dir is gone; the surviving hour stays
    assert(!Files.isDirectory(Paths.get(wh.tablePath("log"), "p_day=2024-01-01",
      s"p_hour=${Tables.hourIndexOf(ts("2024-01-01 05:00:00"))}")))
    assert(Files.isDirectory(Paths.get(wh.tablePath("log"), "p_day=2024-01-01",
      s"p_hour=${Tables.hourIndexOf(ts("2024-01-01 06:00:00"))}")))
  }

  test("CdcStream at hour granularity: the changelog lands p_day/p_hour/p_batch; pruned replay sub-day exact") {
    import spark.implicits._
    val src = tmpDir("tp-src-h")
    val wh = Warehouse(tmpDir("tp-wh-h"))
    Seq((1L, "2024-01-01 05:00:00", "I", "a"),
      (2L, "2024-01-01 18:00:00", "I", "b"),
      (3L, "2024-01-02 05:00:00", "I", "c"))
      .toDF("id", "ts", "op", "v")
      .write.parquet(s"$src/dms_logs_1.parquet")
    val spec = PipelineSpec.forPrefix(src, CdcConfig("id", "ts"))
    val q = graft.streaming.CdcStream.start(spark, wh, spec,
      tmpDir("tp-ckpt-h"), changelogTimePartition = true,
      changelogTimeGranularity = "hour")
    drain(q); q.stop()
    assert(wh.timeGranularity(spec.changelogTable) == "hour")
    assert(Files.isDirectory(Paths.get(wh.tablePath(spec.changelogTable),
      "p_day=2024-01-01",
      s"p_hour=${Tables.hourIndexOf(ts("2024-01-01 05:00:00"))}")),
      "the streamed changelog must nest hour partitions")
    // a sub-day pruned replay is exact
    assert(wh.readTimePruned(spark, spec.changelogTable,
        fromTs = Some(ts("2024-01-01 12:00:00")),
        toTs = Some(ts("2024-01-02 00:00:00")))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("CdcStream with changelogTimePartition lands a day-partitioned changelog; mirror unchanged") {
    import spark.implicits._
    val src = tmpDir("tp-src")
    val wh = Warehouse(tmpDir("tp-wh"))
    Seq((1L, "2024-01-01 10:00:00", "I", "a"),
      (2L, "2024-01-02 10:00:00", "I", "b"),
      (1L, "2024-01-03 10:00:00", "U", "a2"))
      .toDF("id", "ts", "op", "v")
      .write.parquet(s"$src/dms_logs_1.parquet")
    val spec = PipelineSpec.forPrefix(src, CdcConfig("id", "ts"))
    val q = graft.streaming.CdcStream.start(spark, wh, spec,
      tmpDir("tp-ckpt"), changelogTimePartition = true)
    drain(q); q.stop()
    assert(wh.timePartitionCol(spec.changelogTable).contains("ts"))
    assert(dirNames(wh.tablePath(spec.changelogTable))
      .forall(_.startsWith("p_day=")),
      "the changelog must land day-partitioned")
    assert(wh.read(spark, spec.changelogTable).count() == 3)
    val mirror = graft.operators.Cdc.currentState(
      wh.read(spark, spec.mirrorTable))
    assert(mirror.select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a2"), (2L, "b")))
    // and the time-pruned replay reads one day
    assert(wh.readTimePruned(spark, spec.changelogTable,
      fromTs = Some(ts("2024-01-03 00:00:00"))).count() == 1)
  }

  test("zone-free derivation: DATE/NTZ/STRING time columns land their LOCAL day under any session zone") {
    import spark.implicits._
    // +14: the zone where the old cast("timestamp") route shifted local
    // midnight to the PREVIOUS UTC day — the read side assumes UTC, so
    // the derived day conjunct pruned a dir holding matching rows
    val prevZone = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
    try {
      // DATE column: p_day IS the date, identity
      val whD = Warehouse(tmpDir("tp-zf-date"))
      whD.declareTimePartition("log", "d")
      whD.appendBatch(Seq((1L, java.sql.Date.valueOf("2024-01-01")))
        .toDF("id", "d"), "log", 0L)
      assert(Files.isDirectory(Paths.get(whD.tablePath("log"),
        "p_day=2024-01-01")), "DATE must derive its own day, not the " +
        "session-shifted instant's")
      // STRING column at hour grain: local datetime, zone suffix ignored
      val whS = Warehouse(tmpDir("tp-zf-str"))
      whS.declareTimePartition("log", "ts", granularity = "hour")
      whS.appendBatch(Seq((1L, "2024-01-01 05:00:00")).toDF("id", "ts"),
        "log", 0L)
      val idx = Tables.hourIndexOf(java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T05:00:00Z")))
      assert(Files.isDirectory(Paths.get(whS.tablePath("log"),
        "p_day=2024-01-01", s"p_hour=$idx")),
        "STRING must derive the LOCAL day/hour (treated as UTC wall clock)")
      // NTZ column: the local date of the local datetime
      val whN = Warehouse(tmpDir("tp-zf-ntz"))
      whN.declareTimePartition("log", "ts")
      whN.appendBatch(
        Seq(1L).toDF("id").withColumn("ts",
          to_timestamp_ntz(lit("2024-01-01 05:00:00"))), "log", 0L)
      assert(Files.isDirectory(Paths.get(whN.tablePath("log"),
        "p_day=2024-01-01")))
      // and the SQL face's derived-day pruning agrees with the layout —
      // an NTZ literal bound resolves to the same local day
      val cat = "tpzf"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        Paths.get(whN.tablePath("log")).getParent.toString)
      assert(spark.sql(s"SELECT id FROM $cat.log WHERE ts >= " +
        "TIMESTAMP_NTZ '2024-01-01 00:00:00'").collect()
        .map(_.getLong(0)).toSeq == Seq(1L))
      // unsupported time-column types refuse loudly
      val whB = Warehouse(tmpDir("tp-zf-bad"))
      whB.declareTimePartition("log", "t")
      val e = intercept[IllegalArgumentException] {
        whB.appendBatch(Seq((1L, 42L)).toDF("id", "t"), "log", 0L)
      }
      assert(e.getMessage.contains("zone-free day derivation"))
    } finally spark.conf.set("spark.sql.session.timeZone", prevZone)
  }

  test("mid-evolution mixed-tree read unions additive evolution across eras as NULLs") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("tp-mix-evo"))
    wh.declareTimePartition("log", "ts")
    wh.appendBatch(Seq((1L, ts("2024-01-01 05:00:00")))
      .toDF("id", "ts"), "log", 0L)
    wh.evolveTimeGranularity("log")
    // the hour-era batch carries an ADDITIVE column the day era lacks
    wh.appendBatch(Seq((2L, ts("2024-01-02 06:00:00"), "x"))
      .toDF("id", "ts", "extra"), "log", 1L)
    val got = wh.readTimePruned(spark, "log",
      fromTs = Some(ts("2024-01-01 00:00:00")),
      toTs = Some(ts("2024-01-02 23:59:59")))
    assert(got.columns.contains("extra"))
    val rows = got.select("id", "extra").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows == Set((1L, None), (2L, Some("x"))),
      s"day-era rows must serve the evolved column as NULL: ${rows}")
  }

  test("migration heal: a crash BETWEEN the swap renames rolls the day back, loses nothing") {
    import java.nio.file.StandardCopyOption
    import spark.implicits._
    val wh = Warehouse(tmpDir("tp-heal"))
    wh.declareTimePartition("log", "ts")
    val rows = Seq(
      (1L, ts("2024-01-01 05:10:00")),
      (2L, ts("2024-01-01 18:10:00")))
    wh.appendBatch(rows.toDF("id", "ts"), "log", 0L)
    wh.evolveTimeGranularity("log")
    // simulate the exact between-renames crash state: the day dir moved
    // to _trash_, a complete _mig_ stage exists, the second rename never
    // ran — the ONLY copies of day 2024-01-01 are the trash and the stage
    val base = Paths.get(wh.tablePath("log"))
    val day = base.resolve("p_day=2024-01-01")
    val mig = base.resolve("_mig_p_day=2024-01-01")
    val trash = base.resolve("_trash_p_day=2024-01-01")
    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      Files.createDirectories(dst)
      val s = Files.list(src)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.foreach { p =>
          if (Files.isDirectory(p)) copyTree(p, dst.resolve(p.getFileName.toString))
          else Files.copy(p, dst.resolve(p.getFileName.toString))
        }
      } finally s.close()
    }
    copyTree(day, mig) // stands in for a (complete) staged new-spec copy
    Files.move(day, trash, StandardCopyOption.ATOMIC_MOVE)
    assert(!Files.exists(day))
    // the next migration run must heal by ROLLING BACK the trash, then
    // re-migrate that day — not delete the only surviving copies
    val migrated = Maintenance.migrateTimeGranularity(spark, wh, "log")
    assert(migrated == 1, s"the rolled-back day must re-migrate, got $migrated")
    assert(!Files.exists(mig) && !Files.exists(trash), "debris cleared")
    assert(Files.isDirectory(day.resolve(
      s"p_hour=${Tables.hourIndexOf(ts("2024-01-01 05:00:00"))}")),
      "the healed day is hour-grain")
    assert(wh.read(spark, "log").select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L), "no row lost across the heal")
    // the other crash states keep their heals: dead _mig_ with an intact
    // day deletes; superseded _trash_ with an intact day deletes
    copyTree(day, mig)
    copyTree(day, trash)
    assert(Maintenance.migrateTimeGranularity(spark, wh, "log") == 0)
    assert(!Files.exists(mig) && !Files.exists(trash))
    assert(wh.read(spark, "log").count() == 2)
  }

  test("OBJECT-STORE grain migration: rename-free manifest flip, crash states heal forward and backward") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val wh = Tables.Warehouse(tmpDir("tp-mig-os"), retain = 2,
      io = graft.sources.ObjectStoreIO)
    wh.declareTimePartition("log", "ts")
    wh.appendBatch(Seq(
      (1L, ts("2024-01-01 05:10:00")),
      (2L, ts("2024-01-01 18:10:00")),
      (3L, ts("2024-01-02 07:00:00"))).toDF("id", "ts"), "log", 0L)
    wh.evolveTimeGranularity("log")
    // hour-era data lands beside the day-era days (a straddling table)
    wh.appendBatch(Seq((4L, ts("2024-01-01 09:30:00"))).toDF("id", "ts"),
      "log", 1L)
    val migrated = Maintenance.migrateTimeGranularity(spark, wh, "log")
    assert(migrated == 2, s"both day-era days must flip, got $migrated")
    val base = Paths.get(wh.tablePath("log"))
    val day1 = base.resolve("p_day=2024-01-01")
    assert(Files.isDirectory(day1.resolve(
      s"p_hour=${Tables.hourIndexOf(ts("2024-01-01 05:00:00"))}")))
    assert(wh.childDirs(day1, "p_batch=").isEmpty,
      "the old spec's direct batch dirs must be gone after the flip")
    assert(wh.read(spark, "log").select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    // no manifest/stage debris
    val s0 = Files.list(base)
    val leftover = try s0.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("_mig_") || n.startsWith("_trash_"))
      .toList finally s0.close()
    assert(leftover.isEmpty, leftover.toString)
    assert(!Files.exists(day1.resolve("_migrating")))

    // CRASH STATE 1 (roll back): a manifest names new files that never
    // all landed — heal must delete the partial copy and keep the old
    // spec serving; here day1 is ALREADY hour-grain, so simulate on a
    // fresh day-era day
    wh.appendBatch(Seq((5L, ts("2023-12-30 11:00:00"))).toDF("id", "ts"),
      "log", 2L) // post-evolution appends are hour-grain; craft day-era
    val oldDay = base.resolve("p_day=2023-12-25")
    Files.createDirectories(oldDay.resolve("p_batch=99"))
    Seq((9L, ts("2023-12-25 03:00:00"))).toDF("id", "ts")
      .write.mode("overwrite").parquet(oldDay.resolve("p_batch=99").toString)
    // a partial new-spec copy: one real file + one listed-but-missing
    val hourDir = oldDay.resolve("p_hour=3").resolve("p_batch=99")
    Files.createDirectories(hourDir)
    Files.writeString(hourDir.resolve("part-partial.parquet"), "not-all")
    Files.writeString(oldDay.resolve("_migrating"),
      "N p_hour=3/p_batch=99/part-partial.parquet\n" +
        "N p_hour=3/p_batch=99/part-missing.parquet\n" +
        "O p_batch=99")
    // a FRESH manifest SKIPS that day (a live rival may be mid-copy;
    // healing would roll back files it just wrote) — while every OTHER
    // quiet day-era day still migrates in the same pass (advice finding:
    // the old throw blocked healing and migration of all days behind
    // one crashed-but-young day)
    val quietDay = base.resolve("p_day=2023-12-24")
    Files.createDirectories(quietDay.resolve("p_batch=88"))
    Seq((8L, ts("2023-12-24 02:00:00"))).toDF("id", "ts")
      .write.mode("overwrite").parquet(quietDay.resolve("p_batch=88").toString)
    val migratedSkip = Maintenance.migrateTimeGranularity(spark, wh, "log")
    assert(migratedSkip == 1,
      s"the quiet day behind the young manifest must still migrate, " +
        s"got $migratedSkip")
    assert(wh.childDirs(quietDay, "p_batch=").isEmpty,
      "the quiet day flipped to hour grain")
    assert(Files.exists(oldDay.resolve("_migrating")),
      "a skipped heal must leave the in-flight state untouched")
    assert(wh.childDirs(oldDay, "p_batch=").nonEmpty,
      "the young-manifest day is entirely untouched")
    // aged out (healOlderThanMs = -1 treats any mtime as quiet) → heal
    val migrated2 = Maintenance.migrateTimeGranularity(spark, wh, "log",
      healOlderThanMs = -1L)
    assert(migrated2 == 1,
      "the rolled-back day must re-migrate in the same pass")
    assert(!Files.exists(oldDay.resolve("_migrating")))
    assert(wh.childDirs(oldDay, "p_batch=").isEmpty,
      "after the re-migration the day is hour-grain")
    assert(wh.read(spark, "log").filter("id = 9").count() == 1,
      "the rolled-back day's rows survive the heal + re-migration")

    // CRASH STATE 2 (roll forward): every new file landed, the old dirs
    // and manifest remained — heal finishes the delete
    val fwdDay = base.resolve("p_day=2023-12-26")
    val fwdOld = fwdDay.resolve("p_batch=77")
    Files.createDirectories(fwdOld)
    Seq((11L, ts("2023-12-26 05:00:00"))).toDF("id", "ts")
      .write.mode("overwrite").parquet(fwdOld.toString)
    val fwdNewDir = fwdDay.resolve("p_hour=5").resolve("p_batch=77")
    Seq((11L, ts("2023-12-26 05:00:00"))).toDF("id", "ts")
      .drop("nothing")
      .write.mode("overwrite").parquet(fwdNewDir.toString)
    val newRel = {
      val w = Files.walk(fwdNewDir)
      try w.iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => fwdDay.relativize(p).toString)
        .filterNot(r => r.split('/').exists(x =>
          x.startsWith("_") || x.startsWith(".")))
        .toList
      finally w.close()
    }
    Files.writeString(fwdDay.resolve("_migrating"),
      (newRel.map("N " + _) :+ "O p_batch=77").mkString("\n"))
    Maintenance.migrateTimeGranularity(spark, wh, "log",
      healOlderThanMs = -1L)
    assert(!Files.exists(fwdDay.resolve("_migrating")))
    assert(!Files.isDirectory(fwdOld), "roll-forward deletes the old spec")
    assert(wh.read(spark, "log").filter("id = 11").count() == 1)
  }

  test("OBJECT-STORE flat->MOR adoption: rename-free copy with the base pointer last; a crashed copy re-runs to completion") {
    import spark.implicits._
    val wh = Tables.Warehouse(tmpDir("tp-morad-os"), retain = 4,
      io = graft.sources.ObjectStoreIO)
    // a flat VERSIONED table (pointer OBJECT on this substrate)
    wh.overwrite(Seq((1L, "a", "I", "t1"), (2L, "b", "I", "t1"))
      .toDF("id", "name", "op", "ts").localCheckpoint(true), "m")
    assert(wh.io.isPointer(Paths.get(wh.tablePath("m"))))
    val cfg = graft.CdcConfig("id", "ts")
    graft.plans.MorMirror.initialize(wh, "m",
      wh.read(spark, "m"), cfg, nBuckets = 4)
    // adopted: the table path is a real MOR tree now, old versions gone
    assert(Files.isDirectory(Paths.get(wh.tablePath("m"))))
    assert(graft.plans.MorMirror.storedConfig(wh, "m").isDefined)
    graft.plans.MorMirror.appendDelta(wh, "m",
      Seq((3L, "c", "I", "t2")).toDF("id", "name", "op", "ts"), batchId = 1)
    assert(graft.plans.MorMirror.read(spark, wh, "m")
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // crashed-copy heal: rebuild the crash shape — a COMPLETE stage, the
    // final tree only partially copied (no nested base pointer yet)
    val tableP = Paths.get(wh.tablePath("m"))
    val stageP = Paths.get(s"${wh.tablePath("m")}.morstage")
    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      Files.createDirectories(dst)
      val s = Files.list(src)
      try s.iterator().asScala.foreach { p =>
        if (Files.isDirectory(p)) copyTree(p, dst.resolve(p.getFileName.toString))
        else Files.copy(p, dst.resolve(p.getFileName.toString))
      } finally s.close()
    }
    copyTree(tableP, stageP)
    Files.writeString(stageP.resolve("_stage_complete"), "")
    // simulate "crash mid-copy": final tree lost its commit point, AND
    // one data file is TRUNCATED (the substrate's simulated CopyObject
    // is not atomic — advice finding: a resume that trusts bare
    // existence would serve the truncated file)
    Files.delete(tableP.resolve("base"))
    val truncated = {
      import scala.jdk.CollectionConverters._
      val w = Files.walk(tableP)
      try w.iterator().asScala.find(p =>
        p.getFileName.toString.endsWith(".parquet") &&
          Files.size(p) > 8).get
      finally w.close()
    }
    Files.write(truncated, Array[Byte](1, 2, 3))
    assert(graft.plans.MorMirror.recoverMigration(wh, "m"),
      "a complete stage with a pointer-less final tree must re-copy")
    assert(!Files.exists(stageP))
    assert(Files.size(truncated) > 3,
      "the truncated destination was re-copied, not trusted")
    assert(graft.plans.MorMirror.read(spark, wh, "m")
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }
}
