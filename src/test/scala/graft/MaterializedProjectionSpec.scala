package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Cdc
import graft.plans.{Maintenance, MorMirror, ZoneMap}
import graft.sources.Tables.{TableProps, Warehouse}

/** The write/read split at 100 TB: the MOR mirror keeps its key-bucket
  * layout for O(delta) upserts, and analytics reads come from a DERIVED
  * flat table — clustered on the query dims, zone-mapped, refreshed by
  * the maintenance role, and provably skipped when the source hasn't
  * moved (the stamp is the point: a cron tick against an idle mirror
  * must cost metadata reads, not an O(mirror) rewrite).
  */
class MaterializedProjectionSpec extends SparkTestBase {
  import spark.implicits._

  private val cfg = CdcConfig(keyCol = "id", tsCol = "ts")

  private def changes(ids: Range, ts: Int): DataFrame =
    ids.map(i => (i.toLong, ts.toLong, i % 50, (i * 7 % 100).toDouble, "U"))
      .toDF("id", "ts", "grp", "score", "op")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("projection == mirror state; stamped refresh skips idle sources and follows changes") {
    val wh = Warehouse(tmpDir("proj"))
    MorMirror.initialize(wh, "mirror", Cdc.fold(changes(1 to 400, 1), cfg),
      cfg, nBuckets = 8)
    MorMirror.appendDelta(wh, "mirror", changes(100 to 150, 2), batchId = 1L)

    // refresh 1: builds the clustered projection in ONE commit
    assert(Maintenance.materializeProjection(spark, wh, "mirror", "mirror_ro",
      dims = Seq("grp", "score"), bloomKeys = Seq("id"), targetFiles = 6))
    val v1 = wh.currentVersion("mirror_ro")
    assert(ZoneMap.isFresh(spark, wh.snapshotPath("mirror_ro")))
    assert(sortedRows(wh.read(spark, "mirror_ro")) ==
      sortedRows(MorMirror.read(spark, wh, "mirror")),
      "the projection must equal the mirror's visible state")
    // the projection serves zone-map reads and bloom lookups
    val zm = ZoneMap.read(spark, wh.snapshotPath("mirror_ro"),
      Seq(ZoneMap.Bound.between("grp", 10, 19)))
    assert(zm.count() ==
      MorMirror.read(spark, wh, "mirror").filter(col("grp").between(10, 19)).count())
    assert(ZoneMap.lookupRead(spark, wh.snapshotPath("mirror_ro"), "id", Seq(123L))
      .count() == 1)

    // refresh 2 against the UNCHANGED mirror: provably current, no commit
    assert(!Maintenance.materializeProjection(spark, wh, "mirror", "mirror_ro",
      dims = Seq("grp", "score"), bloomKeys = Seq("id"), targetFiles = 6))
    assert(wh.currentVersion("mirror_ro") == v1, "idle source must not rewrite")

    // the mirror advances -> the MAINTENANCE ROLE refreshes the projection;
    // the tick's own default (3) must NOT override the declared budget (6)
    MorMirror.appendDelta(wh, "mirror", changes(390 to 420, 3), batchId = 2L)
    assert(MaintenanceMain.run(spark, wh, Seq("mirror_ro"), targetFiles = 3,
      tombstoneHorizon = None, orphanAgeMs = Long.MaxValue).isEmpty)
    assert(wh.currentVersion("mirror_ro").get > v1.get)
    assert(ZoneMap.manifest(spark, wh.snapshotPath("mirror_ro")).count() >= 5,
      "the refresh must keep the DECLARED file budget, not the tick default")
    assert(sortedRows(wh.read(spark, "mirror_ro")) ==
      sortedRows(MorMirror.read(spark, wh, "mirror")),
      "the refreshed projection must follow the mirror")
    assert(wh.read(spark, "mirror_ro").filter(col("id") > 400).count() == 20)

    // compaction advances the MOR stamp (base version) without changing
    // visible rows: the refresh runs but stays equal — never diverges
    MorMirror.compact(spark, wh, "mirror")
    assert(MaintenanceMain.run(spark, wh, Seq("mirror_ro"), targetFiles = 6,
      tombstoneHorizon = None, orphanAgeMs = Long.MaxValue).isEmpty)
    assert(sortedRows(wh.read(spark, "mirror_ro")) ==
      sortedRows(MorMirror.read(spark, wh, "mirror")))
    // and the tick after THAT is a provable no-op again
    val v3 = wh.currentVersion("mirror_ro")
    assert(MaintenanceMain.run(spark, wh, Seq("mirror_ro"), targetFiles = 6,
      tombstoneHorizon = None, orphanAgeMs = Long.MaxValue).isEmpty)
    assert(wh.currentVersion("mirror_ro") == v3)
  }

  test("projection with a column subset; source-shadowing refused") {
    val wh = Warehouse(tmpDir("proj-cols"))
    MorMirror.initialize(wh, "m", Cdc.fold(changes(1 to 100, 1), cfg),
      cfg, nBuckets = 4)
    assert(Maintenance.materializeProjection(spark, wh, "m", "m_slim",
      dims = Seq("grp"), targetFiles = 2, cols = Seq("id", "grp")))
    assert(wh.read(spark, "m_slim").columns.toSeq == Seq("id", "grp"))
    assert(wh.read(spark, "m_slim").count() == 100)
    intercept[IllegalArgumentException] {
      Maintenance.materializeProjection(spark, wh, "m", "m", Seq("grp"), Nil, 2)
    }
    // the stamp prop records the lineage for operators
    assert(TableProps.read(wh, "m_slim")
      .get(Maintenance.ProjectionSourceProp).contains("m"))
  }
}
