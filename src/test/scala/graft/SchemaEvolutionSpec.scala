package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Cdc
import graft.plans.{MirrorChangelog, MorMirror, PartitionedMirror}
import graft.sources.{SchemaEvolution => SE}
import graft.sources.Tables.Warehouse

/** Non-additive schema evolution (round-10 verdict item 2): a renamed
  * source column must REJOIN its history (not fork into two columns), a
  * dropped column must disappear from every view, and an int->long /
  * float->double widening must read old narrow files under the wide
  * schema — across the CDC fold, the bucketed COW mirror, the MOR
  * mirror, and the mirror changelog. The registry is declared metadata
  * (the field-id table externalized), never guessed.
  */
class SchemaEvolutionSpec extends SparkTestBase {

  private val cfg = CdcConfig("id", "ts")

  test("mergeWidened + readWidened: mixed widths resolve where mergeSchema refuses") {
    import spark.implicits._
    val d = tmpDir("se-widen")
    Seq((1, 10, 1.5f)).toDF("id", "v", "f").write.parquet(s"$d/a")
    Seq((2L, 20L, 2.5d)).toDF("id", "v", "f").write.parquet(s"$d/b")
    Seq((3, 30)).toDF("id", "v").write.parquet(s"$d/c") // missing f
    // plain mergeSchema refuses this set (measured: CANNOT_MERGE_SCHEMAS)
    intercept[org.apache.spark.SparkException] {
      spark.read.option("mergeSchema", "true")
        .parquet(s"$d/a", s"$d/b", s"$d/c").collect()
    }
    val df = SE.readWidened(spark, Seq(s"$d/a", s"$d/b", s"$d/c"))
    assert(df.schema("v").dataType == LongType)
    assert(df.schema("f").dataType == DoubleType)
    val rows = df.select("id", "v", "f").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(rows == Set((1L, 10L, Some(1.5d)), (2L, 20L, Some(2.5d)), (3L, 30L, None)))
    // structurally incompatible types still fail LOUDLY
    intercept[IllegalArgumentException] {
      SE.mergeWidened(Seq(
        StructType(Seq(StructField("x", StringType))),
        StructType(Seq(StructField("x", LongType)))))
    }
  }

  test("probe: a WIDE file under a NARROW requested schema (mid-stream widening before restart)") {
    import spark.implicits._
    val d = tmpDir("se-narrow")
    Seq((1L, 9000000000L)).toDF("id", "v").write.parquet(s"$d/wide")
    val r = try {
      val rows = spark.read.schema("id BIGINT, v INT").parquet(s"$d/wide").collect()
      s"READ rows=${rows.toList}"
    } catch { case e: Throwable => s"THROW ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(300)}" }
    info(s"narrow-on-wide: $r")
    assert(r.startsWith("THROW"), s"silent demotion would corrupt data: $r")
  }

  test("registry: transitive renames, cycle rejection, key/ts protection") {
    val wh = Warehouse(tmpDir("se-reg"))
    SE.declareRename(wh, "t", "a", "b")
    SE.declareRename(wh, "t", "b", "c")
    assert(SE.renames(wh, "t") == Map("a" -> "c", "b" -> "c"))
    intercept[IllegalArgumentException] { SE.declareRename(wh, "t", "c", "a") }
    graft.sources.Tables.TableProps.write(wh, "t2",
      Map("cdc.key-column" -> "id", "cdc.ts-column" -> "ts"))
    intercept[IllegalArgumentException] { SE.declareRename(wh, "t2", "id", "key") }
    intercept[IllegalArgumentException] { SE.declareDrop(wh, "t2", "ts") }
    SE.declareDrop(wh, "t", "junk")
    assert(SE.drops(wh, "t") == Set("junk"))
  }

  test("rename/drop guard reads the MOR layout's nested key/ts props too") {
    // the guard must not be a no-op for the layout keyed hardest on
    // these columns: MOR stores its key/ts under the NESTED base props,
    // not the outer cdc.* keys (review finding)
    val wh = Warehouse(tmpDir("se-guard-mor"))
    MorMirror.initialize(wh, "m",
      Cdc.fold(b1((1L, "a", 1, "I", "t1")), cfg), cfg, 8)
    intercept[IllegalArgumentException] { SE.declareRename(wh, "m", "id", "uid") }
    intercept[IllegalArgumentException] { SE.declareRename(wh, "m", "x", "ts") }
    intercept[IllegalArgumentException] { SE.declareDrop(wh, "m", "ts") }
    SE.declareRename(wh, "m", "name", "full_name") // payload columns stay legal
  }

  test("normalize: rename rejoins history, both-present coalesces, drop disappears") {
    import spark.implicits._
    val df = Seq(
      ("k1", Some("old"), None: Option[String], Some(1)),
      ("k2", None, Some("new"), Some(2))).toDF("id", "name", "full_name", "junk")
    val out = SE.normalizeWith(df, Map("name" -> "full_name"), Set("junk"))
    assert(out.columns.toSeq == Seq("id", "full_name"))
    assert(out.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("k1", "old"), ("k2", "new")))
  }

  private def b1(rows: (Long, String, Int, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "name", "v", "op", "ts")
  }
  private def b2(rows: (Long, String, Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "full_name", "v", "op", "ts")
  }

  test("MOR mirror: rename + widen mid-history merges instead of forking") {
    val wh = Warehouse(tmpDir("se-mor"))
    MorMirror.initialize(wh, "m",
      Cdc.fold(b1((1L, "a", 10, "I", "t1"), (2L, "b", 20, "I", "t1")), cfg), cfg, 8)
    SE.declareRename(wh, "m", "name", "full_name")
    MorMirror.appendDelta(wh, "m",
      b2((1L, "a2", 100L, "U", "t2"), (3L, "c", 30L, "I", "t2")), batchId = 1)
    val got = MorMirror.read(spark, wh, "m")
    assert(!got.columns.contains("name"), "old name must fold into its history")
    assert(got.schema("v").dataType == LongType, "v must widen")
    assert(got.select("id", "full_name", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ==
      Set((1L, "a2", 100L), (2L, "b", 20L), (3L, "c", 30L)),
      "untouched keys keep their pre-rename values under the NEW column")
    // the incremental feed serves normalized rows too
    val (d, _) = MorMirror.changesSince(spark, wh, "m", sinceBatch = 0L)
    assert(d.get.columns.contains("full_name") && !d.get.columns.contains("name"))
    // compaction survives the mixed-schema fold and converges the layout
    MorMirror.compact(spark, wh, "m")
    assert(MorMirror.read(spark, wh, "m").select("id", "full_name", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ==
      Set((1L, "a2", 100L), (2L, "b", 20L), (3L, "c", 30L)))
  }

  test("bucketed COW mirror: rename + widen across a partial bucket rewrite") {
    val wh = Warehouse(tmpDir("se-cow"))
    PartitionedMirror.initialize(wh, "m",
      Cdc.fold(b1((1L, "a", 10, "I", "t1"), (2L, "b", 20, "I", "t1"),
        (3L, "c", 30, "I", "t1"), (4L, "d", 40, "I", "t1")), cfg), cfg, 8)
    SE.declareRename(wh, "m", "name", "full_name")
    // touches a SUBSET of buckets: untouched bucket dirs keep the old
    // name and the narrow int — the read must still merge one history
    PartitionedMirror.applyBatch(spark, wh, "m",
      b2((1L, "a2", 100L, "U", "t2")), cfg, 8)
    val got = PartitionedMirror.read(spark, wh, "m")
    assert(!got.columns.contains("name"))
    assert(got.schema("v").dataType == LongType)
    assert(got.select("id", "full_name", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ==
      Set((1L, "a2", 100L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)))
  }

  test("mirror changelog across a rename: only real changes appear in the diff") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("se-diff"), retain = 3)
    wh.overwrite(Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "name", "v"), "m")
    SE.declareRename(wh, "m", "name", "full_name")
    wh.overwrite(Seq((1L, "a", 10L), (2L, "b2", 20L))
      .toDF("id", "full_name", "v"), "m")
    val d = MirrorChangelog.between(spark, wh, "m", 1L, 2L, "id")
    val types = d.select("id", MirrorChangelog.ChangeTypeCol).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(types == Set((2L, MirrorChangelog.UpdateBefore),
      (2L, MirrorChangelog.UpdateAfter)),
      s"key 1 is UNCHANGED across the rename and must not appear: $types")
  }
}
