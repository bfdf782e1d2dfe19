package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Cdc
import graft.plans.IncrementalAgg

/** The maintained aggregate must be BIT-EXACT equal to a full recompute of
  * the mirror's visible state after EVERY batch — across inserts, updates
  * (which move rows between groups and change values), deletes, and stale
  * late changes that must produce no delta at all.
  */
class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  private val cfg = CdcConfig(keyCol = "id", tsCol = "ts")
  // group = id % 4; value = length(name): updates rename rows, so values
  // genuinely change under U; deletes retract
  private val spec = IncrementalAgg.Spec(pmod(col("id"), lit(4)), length(col("name")))

  private def toDf(logs: Seq[DmsGenerator.Log]): DataFrame =
    logs.toDF().withColumnRenamed("modificationDate", "modification_date")

  private def canon(df: DataFrame): Set[(Long, Long, java.math.BigDecimal)] =
    df.select(col("g").cast("long"), col("n"), col("s").cast("decimal(28,2)"))
      .as[(Long, Long, java.math.BigDecimal)].collect().toSet

  test("maintained aggregate == full recompute after every batch (3 seeds)") {
    for (seed <- Seq(5L, 42L, 777L)) {
      val g = DmsGenerator.generate(seed, nBatches = 5)
      var mirror = Cdc.fold(toDf(g.batches.head), cfg)
      var agg = IncrementalAgg.full(Cdc.currentState(mirror), spec)
        .localCheckpoint(true)
      g.batches.tail.foreach { b =>
        agg = IncrementalAgg.applyDelta(agg, mirror, toDf(b), cfg, spec)
          .localCheckpoint(true) // the maintained table is STORED state
        mirror = Cdc.applyBatch(mirror, toDf(b), cfg).localCheckpoint(true)
        val want = canon(IncrementalAgg.full(Cdc.currentState(mirror), spec))
        assert(canon(agg) == want, s"seed=$seed drifted after a batch")
      }
    }
  }

  test("a stale late batch produces zero delta") {
    val fresh = Seq(DmsGenerator.Log(1L, "abcdef", "m1", "t", "I", "2024-01-02T00:00:00"))
    val stale = Seq(DmsGenerator.Log(1L, "zz", "m0", "t", "U", "2024-01-01T00:00:00"))
    val mirror = Cdc.fold(toDf(fresh), cfg)
    val agg = IncrementalAgg.full(Cdc.currentState(mirror), spec)
    val agg2 = IncrementalAgg.applyDelta(agg, mirror, toDf(stale), cfg, spec)
    assert(canon(agg2) == canon(agg), "older-ts change must lose and leave the aggregate untouched")
  }

  test("delete retracts the key's contribution; emptied groups disappear") {
    val ins = Seq(
      DmsGenerator.Log(1L, "aaaa", "m1", "t", "I", "2024-01-01T00:00:01"),
      DmsGenerator.Log(5L, "bb", "m1", "t", "I", "2024-01-01T00:00:02"))   // both in group 1
    val del = Seq(DmsGenerator.Log(5L, "bb", "m1", "t", "D", "2024-01-01T00:00:03"),
      DmsGenerator.Log(1L, "cccccc", "m2", "t", "U", "2024-01-01T00:00:04"))
    val mirror = Cdc.fold(toDf(ins), cfg)
    val agg = IncrementalAgg.full(Cdc.currentState(mirror), spec)
    val agg2 = IncrementalAgg.applyDelta(agg, mirror, toDf(del), cfg, spec)
    val rows = canon(agg2)
    assert(rows == Set((1L, 1L, new java.math.BigDecimal("6.00"))),
      s"group 1 keeps only the updated id=1 (len 6): $rows")
  }

  test("changelog-driven maintenance: the emitPending feed alone keeps a downstream aggregate exact") {
    import graft.plans.MirrorChangelog
    import graft.sources.Tables.Warehouse
    def snap(rows: (Long, String)*): DataFrame = rows.toDF("id", "name")
    val wh = Warehouse(tmpDir("ivm-feed"), retain = 8)

    wh.overwrite(snap((1L, "aaaa"), (2L, "bb"), (5L, "ccc")), "m") // v1
    assert(MirrorChangelog.emitPending(spark, wh, "m", "m_changes", "id").isEmpty)
    // the downstream consumer bootstraps its aggregate from v1 and from
    // then on NEVER touches the mirror — only the feed
    var agg = IncrementalAgg.full(wh.readVersion(spark, "m", 1L), spec)
      .localCheckpoint(true)

    // churn across three commits: update moving a value, delete emptying
    // nothing, insert opening a new group; one multi-hop emit
    wh.overwrite(snap((1L, "aaaaaa"), (2L, "bb"), (5L, "ccc")), "m")            // v2: update
    wh.overwrite(snap((1L, "aaaaaa"), (5L, "ccc"), (7L, "dddd")), "m")          // v3: delete+insert
    val hops = MirrorChangelog.emitPending(spark, wh, "m", "m_changes", "id")
    assert(hops == Seq((1L, 2L), (2L, 3L)))
    val feed = wh.read(spark, "m_changes", mergeSchema = true)
    hops.foreach { case (_, to) =>
      agg = IncrementalAgg.applyChangelog(agg,
        feed.filter(col("_to_version") === to), spec).localCheckpoint(true)
    }
    assert(canon(agg) == canon(
      IncrementalAgg.full(wh.readVersion(spark, "m", 3L), spec)),
      "feed-maintained aggregate must equal a recompute of the final mirror")
  }
}
