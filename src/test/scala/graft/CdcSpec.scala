package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Cdc

/** Golden-replay correctness of the CDC fold against the reference
  * generator's expected final state (SURVEY §5.2), plus the edge cases the
  * reference leaves implicit.
  */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private val cfg = CdcConfig(keyCol = "id", tsCol = "ts")

  private def toDf(logs: Seq[DmsGenerator.Log]): DataFrame =
    logs.toDF().withColumnRenamed("modificationDate", "modification_date")

  private def stateOf(df: DataFrame): Set[(Long, String, String)] =
    Cdc.currentState(df).drop("ts")
      .select("id", "name", "modification_date")
      .as[(Long, String, String)].collect().toSet

  private def expectedSet(g: DmsGenerator.Generated): Set[(Long, String, String)] =
    g.expectedFinal.map(r => (r.id, r.name, r.modificationDate)).toSet

  test("mixed seed with a null-op column: rows stay visible through merge, state, and tombstone GC") {
    import org.apache.spark.sql.functions.col
    // a seed read from MIXED files (LOAD rows + change rows under one
    // mergeSchema read) carries an op COLUMN whose LOAD rows are null —
    // the shape the independent MOR-layout checker caught: the rows were
    // silently dropped by every op filter downstream
    val seed = Seq(
      (1L, "load1", None: Option[String], None: Option[String]),
      (2L, "load2", None, None),
      (3L, "changed", Some("U"), Some("t1")))
      .toDF("id", "name", "op", "ts")
    val merged = Cdc.applyBatch(seed, Cdc.withIngestSeq(
      Seq((2L, "upd2", "U", "t2")).toDF("id", "name", "op", "ts")), cfg)
    // the merge must coalesce the seed's null ops to U (present rows)
    assert(merged.filter(col("op").isNull).count() == 0,
      "null ops must not survive a merge")
    val visible = Cdc.currentState(merged)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(visible == Set((1L, "load1"), (2L, "upd2"), (3L, "changed")),
      "LOAD-seeded rows must stay visible")
    // currentState directly over a null-op frame (no merge ran) is
    // null-safe too
    val direct = Cdc.currentState(seed)
      .select("id").as[Long].collect().toSet
    assert(direct == Set(1L, 2L, 3L))
    // and tombstone GC must not sweep null-op rows
    val wh = graft.sources.Tables.Warehouse(tmpDir("nullop-gc"))
    wh.overwrite(seed, "t")
    graft.plans.Maintenance.expireTombstones(spark, wh, "t", cfg, horizon = "t9")
    assert(wh.read(spark, "t").count() == 3,
      "tombstone GC must keep null-op rows")
  }

  test("golden replay: applyAll over the full changelog reproduces the generator's final state") {
    for (seed <- Seq(1L, 42L, 2024L)) {
      val g = DmsGenerator.generate(seed)
      val all = toDf(g.batches.flatten)
      assert(stateOf(Cdc.applyAll(all, cfg)) === expectedSet(g), s"seed=$seed")
    }
  }

  test("additive schema evolution: a mirror column missing from a batch survives the merge") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    // mirror evolved to carry an email column
    val mirror = Cdc.fold(
      toDf(Seq(DmsGenerator.Log(1L, "a", "m1", "t", "I", "2024-01-01T00:00:01"),
        DmsGenerator.Log(2L, "b", "m1", "t", "I", "2024-01-01T00:00:02"))), cfg)
      .withColumn("email", concat(col("name"), lit("@x.com")))
    // a batch WITHOUT the email column updates key 1 and inserts key 3
    val batch = toDf(Seq(
      DmsGenerator.Log(1L, "a2", "m2", "t", "U", "2024-01-02T00:00:00"),
      DmsGenerator.Log(3L, "c", "m2", "t", "I", "2024-01-02T00:00:01")))
    val out = Cdc.currentState(Cdc.applyBatch(mirror, batch, cfg))
    assert(out.columns.contains("email"), "evolved column must not be dropped")
    val emails = out.select("id", "email").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(emails(2L).contains("b@x.com"), "untouched row keeps its value")
    assert(emails(1L).isEmpty && emails(3L).isEmpty,
      "rows (re)written by the schema-poorer batch carry typed nulls")
  }

  test("golden replay: incremental applyBatch batch-by-batch equals batch applyAll") {
    val g = DmsGenerator.generate(7L)
    var mirror = Cdc.applyAll(toDf(g.batches.head), cfg)
    g.batches.tail.foreach { b => mirror = Cdc.applyBatch(mirror, toDf(b), cfg) }
    assert(stateOf(mirror) === expectedSet(g))
  }

  test("idempotence: re-applying the last batch is a no-op") {
    val g = DmsGenerator.generate(11L)
    var mirror = Cdc.applyAll(toDf(g.batches.head), cfg)
    g.batches.tail.foreach { b => mirror = Cdc.applyBatch(mirror, toDf(b), cfg) }
    val again = Cdc.applyBatch(mirror, toDf(g.batches.last), cfg)
    assert(stateOf(again) === expectedSet(g))
  }

  test("order-insensitivity: late batch with older ts loses to stored mirror rows") {
    val newer = Seq(DmsGenerator.Log(1L, "new", "m2", "test_table", "U", "2024-01-02T00:00:00"))
    val older = Seq(DmsGenerator.Log(1L, "old", "m1", "test_table", "U", "2024-01-01T00:00:00"))
    val mirror = Cdc.applyAll(toDf(newer), cfg)
    val after = Cdc.applyBatch(mirror, toDf(older), cfg)
    assert(stateOf(after) === Set((1L, "new", "m2")))
  }

  test("late delete with older ts does not remove a newer row; newer delete does") {
    val upsert = Seq(DmsGenerator.Log(1L, "v", "m", "t", "U", "2024-01-02T00:00:00"))
    val mirror = Cdc.applyAll(toDf(upsert), cfg)
    val lateDelete = Seq(DmsGenerator.Log(1L, "v", "m", "t", "D", "2024-01-01T00:00:00"))
    assert(stateOf(Cdc.applyBatch(mirror, toDf(lateDelete), cfg)) === Set((1L, "v", "m")))
    val newDelete = Seq(DmsGenerator.Log(1L, "v", "m", "t", "D", "2024-01-03T00:00:00"))
    assert(stateOf(Cdc.applyBatch(mirror, toDf(newDelete), cfg)).isEmpty)
  }

  test("delete then re-insert within one batch keeps the re-inserted row") {
    val logs = Seq(
      DmsGenerator.Log(1L, "first", "m1", "t", "I", "2024-01-01T00:00:01"),
      DmsGenerator.Log(1L, "gone", "m2", "t", "D", "2024-01-01T00:00:02"),
      DmsGenerator.Log(1L, "back", "m3", "t", "I", "2024-01-01T00:00:03"))
    assert(stateOf(Cdc.applyAll(toDf(logs), cfg)) === Set((1L, "back", "m3")))
  }

  test("delete of a never-seen key is a no-op") {
    val mirror = Cdc.applyAll(
      toDf(Seq(DmsGenerator.Log(1L, "a", "m", "t", "I", "2024-01-01T00:00:01"))), cfg)
    val del = Seq(DmsGenerator.Log(99L, "x", "m", "t", "D", "2024-01-01T00:00:02"))
    assert(stateOf(Cdc.applyBatch(mirror, toDf(del), cfg)) === Set((1L, "a", "m")))
  }

  test("equal-ts tie-break: later ingestion order wins within a batch") {
    val sameTs = "2024-01-01T00:00:00"
    val logs = Seq(
      DmsGenerator.Log(1L, "first", "m1", "t", "I", sameTs),
      DmsGenerator.Log(1L, "second", "m2", "t", "U", sameTs))
    assert(stateOf(Cdc.applyAll(toDf(logs), cfg)) === Set((1L, "second", "m2")))
  }

  test("non-default ts column name (prod shape: transact_seq)") {
    val cfg2 = CdcConfig("id", "transact_seq")
    val df = Seq(
      (1L, "a", 10L, "U"), (1L, "b", 20L, "U"), (2L, "c", 5L, "I"), (2L, "d", 4L, "D")
    ).toDF("id", "name", "transact_seq", "op")
    val out = Cdc.applyAll(df, cfg2).select("id", "name")
      .as[(Long, String)].collect().toSet
    assert(out === Set((1L, "b"), (2L, "c")))
  }

  test("COMPOSITE key (cdc.key-column = sid,oid): the fold keys the full tuple — rows sharing one component are distinct identities") {
    val cfg2 = CdcConfig("sid,oid", "transact_seq")
    val df = Seq(
      // (1,1) inserted then updated; (1,2) and (2,1) share components
      // with it and must stay independent; (1,2) deleted; (2,2) deleted
      // then re-inserted with a newer seq
      (1L, 1L, "a", 10L, "I"), (1L, 2L, "b", 10L, "I"),
      (2L, 1L, "c", 10L, "I"), (2L, 2L, "d", 10L, "I"),
      (1L, 1L, "a2", 20L, "U"), (1L, 2L, "x", 20L, "D"),
      (2L, 2L, "x", 20L, "D"), (2L, 2L, "d2", 30L, "I")
    ).toDF("sid", "oid", "name", "transact_seq", "op")
    val out = Cdc.applyAll(df, cfg2).select("sid", "oid", "name")
      .as[(Long, Long, String)].collect().toSet
    assert(out === Set((1L, 1L, "a2"), (2L, 1L, "c"), (2L, 2L, "d2")))
    // cross-batch order-insensitivity holds per TUPLE: a late batch
    // older than the stored (1,1) row loses; a newer delete of (2,1)
    // wins — neither touches the other tuples
    val mirror = Cdc.fold(df, cfg2)
    val late = Seq((1L, 1L, "stale", 15L, "U"), (2L, 1L, "x", 40L, "D"))
      .toDF("sid", "oid", "name", "transact_seq", "op")
    val merged = Cdc.currentState(Cdc.applyBatch(mirror, late, cfg2))
      .select("sid", "oid", "name")
      .as[(Long, Long, String)].collect().toSet
    assert(merged === Set((1L, 1L, "a2"), (2L, 2L, "d2")))
  }
}
