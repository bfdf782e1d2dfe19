package graft

import org.apache.spark.sql.functions._

import graft.plans.Maintenance
import graft.sources.Tables.Warehouse

/** Size-targeted bin-packing compaction (round 20, verdict item 2): the
  * file count is DERIVED from data volume (Iceberg's
  * `rewrite_data_files` binpack contract), right-sized files carry by
  * hard link (never rewrite — steady-state cost tracks churn), and an
  * already-packed layout is a version-free no-op.
  */
class SizeCompactSpec extends SparkTestBase {

  private def dataFileNames(path: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(path)
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .map(p => root.relativize(p).toString)
      .filter(n => n.endsWith(".parquet") &&
        !n.split('/').exists(s => s.startsWith("_") || s.startsWith(".")))
      .toSet
  }

  private def sizeOf(path: String, rel: String): Long =
    java.nio.file.Files.size(java.nio.file.Paths.get(path, rel))

  // ~70 incompressible-ish bytes per row (hex digest), so file size is
  // insensitive to row ORDER — the band asserts stay stable across the
  // repack's repartition shuffle
  private def slice(lo: Int, hi: Int) =
    spark.range(lo, hi).select(col("id"),
      sha2(col("id").cast("string"), 256).as("s"))
      .coalesce(1).toDF()

  test("bin-pack derives the count from volume; right-sized files carry by name; an at-grain layout is a version-free no-op") {
    val wh = Warehouse(tmpDir("sizecompact"))
    (0 until 6).foreach(i =>
      wh.appendVersioned(slice(i * 10000, (i + 1) * 10000), "t"))
    val p0 = wh.snapshotPath("t")
    val files0 = dataFileNames(p0)
    assert(files0.size == 6)
    val total = files0.toSeq.map(sizeOf(p0, _)).sum
    val target = (total + 1) / 2 // ceil(total/2): 6 small files pack to 2
    assert(Maintenance.compactToSize(spark, wh, "t", target),
      "six sub-grain files must repack")
    val p1 = wh.snapshotPath("t")
    val files1 = dataFileNames(p1)
    assert(files1.size == 2, s"count must derive from volume: $files1")
    files1.foreach { f =>
      val sz = sizeOf(p1, f)
      assert(sz >= target * 3 / 4 && sz <= target * 5 / 4,
        s"output grain must match target_bytes: $f at $sz vs $target")
    }
    assert(spark.read.parquet(p1).count() == 60000L)
    // already at grain → no rewrite, NO new version (a cron tick on a
    // packed warehouse must not be a full-warehouse rewrite pass)
    val v1 = wh.currentVersion("t")
    assert(!Maintenance.compactToSize(spark, wh, "t", target))
    assert(wh.currentVersion("t") == v1,
      "an at-grain layout must not commit a new version")
    // two fresh misfit appends: the packed pair carries BY NAME, only
    // the misfits rewrite — churn-proportional, into one file
    (0 until 2).foreach(i => wh.appendVersioned(
      slice(60000 + i * 10000, 60000 + (i + 1) * 10000), "t"))
    assert(Maintenance.compactToSize(spark, wh, "t", target))
    val p2 = wh.snapshotPath("t")
    val files2 = dataFileNames(p2)
    assert(files1.subsetOf(files2),
      s"right-sized files must carry by name: $files1 vs $files2")
    assert(files2.size == 3, s"2 carried + 1 packed expected: $files2")
    assert(spark.read.parquet(p2).count() == 80000L)
  }

  test("an oversized file splits to the grain; a lone undersized file cannot improve and no-ops") {
    val wh = Warehouse(tmpDir("sizecompact-split"))
    wh.overwrite(slice(0, 30000), "big")
    val p0 = wh.snapshotPath("big")
    val sz = dataFileNames(p0).toSeq.map(sizeOf(p0, _)).sum
    val target = (sz + 2) / 3
    assert(Maintenance.compactToSize(spark, wh, "big", target),
      "a 3x-grain file must split")
    assert(dataFileNames(wh.snapshotPath("big")).size == 3)
    assert(spark.read.parquet(wh.snapshotPath("big")).count() == 30000L)
    // a lone sub-grain file: every misfit already alone in its bin
    wh.overwrite(slice(0, 100), "small")
    val v = wh.currentVersion("small")
    assert(!Maintenance.compactToSize(spark, wh, "small", 1L << 20))
    assert(wh.currentVersion("small") == v)
  }

  test("CALL compact bytes mode (target_files=0) derives the count; explicit target_files keeps the pinned-count path") {
    val root = tmpDir("sizecompact-sql")
    val wh = Warehouse(root)
    (0 until 4).foreach(i =>
      wh.appendVersioned(slice(i * 10000, (i + 1) * 10000), "t"))
    val p0 = wh.snapshotPath("t")
    val total = dataFileNames(p0).toSeq.map(sizeOf(p0, _)).sum
    val cat = "szc1"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
    val tb = (total + 1) / 2
    val r = spark.sql(s"CALL $cat.system.compact('t', 0, ${tb}L)")
      .collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L,
      s"bytes mode must pack 4 → 2: $r")
    // explicit count still pins (the pre-20 surface, unchanged)
    val r2 = spark.sql(s"CALL $cat.system.compact('t', 3)")
      .collect().head
    assert(r2.getLong(2) == 3L, s"pinned count must hold: $r2")
  }
}
