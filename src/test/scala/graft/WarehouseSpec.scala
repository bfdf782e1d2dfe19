package graft

import java.nio.file.{Files, Paths}

import graft.sources.Tables.Warehouse

/** The versioned-commit contract of the warehouse (the offline analog of an
  * Iceberg metadata-pointer swap): overwrites publish atomically via a
  * symlink pointer, old versions are retained-then-GC'd, and legacy
  * real-directory tables migrate on their first commit.
  */
class WarehouseSpec extends SparkTestBase {

  import scala.jdk.CollectionConverters._

  private def entries(root: String): Set[String] = {
    val s = Files.list(Paths.get(root))
    try s.iterator().asScala.map(_.getFileName.toString).toSet
    finally s.close()
  }

  test("overwrite publishes through a symlink pointer; GC keeps current + previous") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("wh-commit"))
    (1 to 3).foreach { v =>
      wh.overwrite(Seq((v.toLong, s"v$v")).toDF("id", "name"), "t")
      val table = Paths.get(wh.tablePath("t"))
      assert(Files.isSymbolicLink(table), s"after commit $v the table is a pointer")
      assert(wh.read(spark, "t").select("name").as[String].collect().toSeq == Seq(s"v$v"))
    }
    val vs = entries(wh.root).filter(_.startsWith("t.v"))
    assert(vs == Set("t.v2", "t.v3"), s"GC keeps exactly current+previous: $vs")
    // the pointer is relative: the warehouse stays relocatable
    val target = Files.readSymbolicLink(Paths.get(wh.tablePath("t")))
    assert(!target.isAbsolute && target.toString == "t.v3")
  }

  test("a commit killed between write and swap never publishes; the table stays whole") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("wh-crash"))
    wh.overwrite(Seq((1L, "good")).toDF("id", "name"), "t")
    val v1 = wh.currentVersion("t")
    // crash INSIDE the staging write: files are on disk, the pointer swap
    // never runs — the foreachBatch mirror publish has exactly this window
    intercept[RuntimeException](wh.commit("t") { dir =>
      Seq((2L, "half")).toDF("id", "name")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir)
      throw new RuntimeException("killed before swap")
    })
    assert(wh.currentVersion("t") == v1, "pointer must still name the old version")
    assert(wh.read(spark, "t").select("name").as[String].collect().toSeq == Seq("good"),
      "a reader after the crash sees the complete old table, never the staged write")
    // a write that THROWS has its stage swept immediately (no orphan);
    // only a hard JVM kill leaves one, which is removeOrphans work
    assert(entries(wh.root).filter(_.startsWith("t.v")).size == 1,
      "a failed write's staging dir must be swept at once")
    wh.overwrite(Seq((3L, "after")).toDF("id", "name"), "t")
    wh.overwrite(Seq((4L, "after2")).toDF("id", "name"), "t")
    assert(wh.read(spark, "t").select("name").as[String].collect().toSeq == Seq("after2"))
    val vs = entries(wh.root).filter(_.startsWith("t.v"))
    assert(vs.size == 2, s"GC must keep exactly current + previous: $vs")
  }

  test("a reader opened before a commit keeps its snapshot (pinned version dir)") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("wh-snapshot"))
    wh.overwrite(Seq((1L, "v1")).toDF("id", "name"), "t")
    // open the reader BEFORE the next commit; the scan must pin t.v1
    val pinned = wh.read(spark, "t")
    wh.overwrite(Seq((2L, "v2")).toDF("id", "name"), "t")
    // un-pinned symlink reads would now re-resolve v1 part files against
    // v2 (FILE_NOT_EXIST) or silently see v2 rows; the pinned snapshot
    // must still read v1, which GC retains as the previous version
    assert(pinned.select("name").as[String].collect().toSeq == Seq("v1"))
    assert(wh.read(spark, "t").select("name").as[String].collect().toSeq == Seq("v2"))
  }

  test("legacy real-directory table migrates to the pointer layout on first commit") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("wh-legacy"))
    // legacy layout: plain directory write, no pointer
    Seq((1L, "old")).toDF("id", "name")
      .write.parquet(wh.tablePath("t"))
    assert(!Files.isSymbolicLink(Paths.get(wh.tablePath("t"))))
    wh.overwrite(Seq((2L, "new")).toDF("id", "name"), "t")
    assert(Files.isSymbolicLink(Paths.get(wh.tablePath("t"))))
    assert(wh.read(spark, "t").select("name").as[String].collect().toSeq == Seq("new"))
    // the legacy directory was retained as the previous version
    assert(entries(wh.root).filter(_.startsWith("t.v")) == Set("t.v0", "t.v1"))
  }

  test("mergeSchema read unifies changelog batches that straddle a schema evolution") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("wh-evolve"))
    wh.appendBatch(Seq((1L, "a")).toDF("id", "name"), "c", 0L)
    wh.appendBatch(Seq((2L, "b", "b@x.com")).toDF("id", "name", "email"), "c", 1L)
    val merged = wh.read(spark, "c", mergeSchema = true)
    assert(merged.columns.toSet == Set("id", "name", "email"),
      "evolved column must appear in the unified schema")
    val emails = merged.select("id", "email").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(emails(1L).isEmpty && emails(2L).contains("b@x.com"))
  }

  test("expectAbsent commit arm: a rival creating the table mid-commit is a conflict, not last-wins") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("wh-absent"))
    // the committer observed NO table; a rival lands first
    wh.overwrite(Seq((1L, "rival")).toDF("id", "s").localCheckpoint(true), "t")
    val e = intercept[java.util.ConcurrentModificationException] {
      wh.commit("t", expectCurrent = None, expectAbsent = true) { p =>
        Seq((2L, "loser")).toDF("id", "s").write
          .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(p)
      }
    }
    assert(e.getMessage.contains("created"))
    // the rival's rows survive untouched
    assert(wh.read(spark, "t").select("s").head.getString(0) == "rival")
    // and with the table genuinely absent the arm publishes normally
    wh.commit("u", expectCurrent = None, expectAbsent = true) { p =>
      Seq((3L, "first")).toDF("id", "s").write
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(p)
    }
    assert(wh.read(spark, "u").count() == 1)
  }

  test("commit rejects subdirectory paths; appendBatch stays in place") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("wh-batch"))
    intercept[IllegalArgumentException](wh.commit("t/batch_0")(_ => ()))
    wh.appendBatch(Seq((1L, "a")).toDF("id", "name"), "c", 0L)
    wh.appendBatch(Seq((2L, "b")).toDF("id", "name"), "c", 1L)
    // replay of batch 1 must not duplicate
    wh.appendBatch(Seq((2L, "b")).toDF("id", "name"), "c", 1L)
    assert(!Files.isSymbolicLink(Paths.get(wh.tablePath("c"))))
    assert(wh.read(spark, "c").count() == 2)
  }

  test("healReplacing rolls a COMPLETED crashed partition replace forward (new files authoritative, old swept)") {
    val wh = Warehouse(tmpDir("wh-heal-fwd"))
    val part = Paths.get(wh.root, "t", "p_day=2024-01-01")
    Files.createDirectories(part)
    Files.writeString(part.resolve("old-1.parquet"), "OLD1")
    Files.writeString(part.resolve("old-2.parquet"), "OLD2")
    Files.writeString(part.resolve("new-a.parquet"), "NEWA")
    Files.writeString(part.resolve("new-b.parquet"), "NEWB")
    Files.writeString(part.resolve("_SUCCESS"), "")
    // crash happened AFTER the copy, BEFORE the old-file delete
    Files.writeString(part.resolve(graft.sources.Tables.ReplacingManifest),
      "new-a.parquet\nnew-b.parquet")
    wh.healReplacing(part)
    assert(entries(part.toString) == Set("new-a.parquet", "new-b.parquet",
      "_SUCCESS"), "roll-forward keeps exactly the manifest-listed files")
  }

  test("healReplacing rolls an INCOMPLETE crashed partition replace back (old files keep serving)") {
    val wh = Warehouse(tmpDir("wh-heal-back"))
    val part = Paths.get(wh.root, "t", "p_day=2024-01-02")
    Files.createDirectories(part)
    Files.writeString(part.resolve("old-1.parquet"), "OLD1")
    Files.writeString(part.resolve("new-a.parquet"), "NEWA")
    // crash happened MID-copy: new-b never landed
    Files.writeString(part.resolve(graft.sources.Tables.ReplacingManifest),
      "new-a.parquet\nnew-b.parquet")
    wh.healReplacing(part)
    assert(entries(part.toString) == Set("old-1.parquet"),
      "roll-back deletes the partial new files and keeps the old ones")
  }

  test("partitionedOverwriteNoRename replaces touched partitions exactly and settles its manifest protocol on success") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val wh = Warehouse(tmpDir("wh-replace"))
    val tdir = Paths.get(wh.tablePath("t"))
    wh.partitionedOverwriteNoRename(
      Seq((1L, "d1"), (2L, "d1"), (3L, "d2")).toDF("id", "p"), "t", Seq("p"))
    val before = spark.read.parquet(tdir.toString)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(before == Set(1L, 2L, 3L))
    // replace partition d1 only; d2 untouched (dynamic semantics)
    wh.partitionedOverwriteNoRename(
      Seq((10L, "d1")).toDF("id", "p"), "t", Seq("p"))
    val after = spark.read.parquet(tdir.toString)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(after == Set(10L, 3L))
    // protocol debris fully settled
    val walk = Files.walk(tdir)
    val manifests = try walk.iterator().asScala.count(
      _.getFileName.toString == graft.sources.Tables.ReplacingManifest)
      finally walk.close()
    assert(manifests == 0, "a successful replace must delete its manifests")
  }
}
