package graft

import org.apache.spark.sql.functions._

import graft.plans.Maintenance
import graft.sources.{EqDeletes, GraftCatalog}
import graft.sources.Tables.{TableProps, Warehouse}

/** Round-20 soak finding, pinned deterministically: every rewrite path
  * folds pending sidecars at ENTRY, but a merge-on-read DML that
  * commits a sidecar between that fold and the attempt's snapshot pin
  * would make the rewrite read raw files (resurrecting the retracted
  * rows) and commit WITHOUT the sidecar — a silent lost delete. The
  * objectstore soak interleave lost exactly one delta-MERGE's
  * retractions this way. The in-attempt guard folds the straggler and
  * retries conflict-shaped; this spec drives the exact window through
  * the [[Maintenance.beforeRewritePin]] seam.
  */
class RewriteSidecarRaceSpec extends SparkTestBase {
  import spark.implicits._

  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def fixture(): (String, Warehouse) = {
    val root = tmpDir("rewrite-race")
    val wh = Warehouse(root, retain = 8)
    wh.overwrite((1L to 60L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartition(3).localCheckpoint(true), "t")
    TableProps.write(wh, "t", Map(
      EqDeletes.ModeProp -> "merge-on-read",
      EqDeletes.KeyProp -> "id"))
    val cat = s"rrs${seq.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
    spark.conf.set(s"spark.sql.catalog.$cat.retain", "8")
    (cat, wh)
  }

  private def raceOnce(cat: String)(rewrite: => Unit): Unit = {
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    Maintenance.beforeRewritePin = () =>
      if (fired.compareAndSet(false, true))
        spark.sql(s"DELETE FROM $cat.t WHERE id <= 10")
    try rewrite
    finally Maintenance.beforeRewritePin = () => ()
    assert(fired.get, "the seam must have fired inside the window")
  }

  test("cluster: a sidecar landing between the entry fold and the pin is folded, never dropped") {
    val (cat, wh) = fixture()
    Maintenance.declareClustering(wh, "t", Seq("id"))
    Maintenance.cluster(spark, wh, "t", Seq("id"), targetFiles = 2)
    raceOnce(cat) {
      Maintenance.cluster(spark, wh, "t", Seq("id"), targetFiles = 2)
    }
    val snap = wh.snapshotPath("t")
    assert(EqDeletes.pending(snap).isEmpty,
      "the raced-in sidecar must be folded by the retry, not dropped")
    // the delete HOLDS — in the logical read AND in the raw files (a
    // dropped sidecar resurrects the 10 deleted rows in both)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 50L)
    assert(spark.read.parquet(snap).count() == 50L,
      "raw post-rewrite files must not resurrect retracted rows")
  }

  test("compact (count and bytes modes): same window, same fold-and-retry") {
    val (cat, wh) = fixture()
    raceOnce(cat) { Maintenance.compact(spark, wh, "t", targetFiles = 2) }
    assert(EqDeletes.pending(wh.snapshotPath("t")).isEmpty)
    assert(spark.read.parquet(wh.snapshotPath("t")).count() == 50L)
    // bytes mode rides the same attempt skeleton; a second raced DELETE
    // must fold the same way
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    Maintenance.beforeRewritePin = () =>
      if (fired.compareAndSet(false, true))
        spark.sql(s"DELETE FROM $cat.t WHERE id > 55")
    try Maintenance.compactToSize(spark, wh, "t", targetBytes = 1L << 10)
    finally Maintenance.beforeRewritePin = () => ()
    assert(EqDeletes.pending(wh.snapshotPath("t")).isEmpty)
    assert(spark.read.parquet(wh.snapshotPath("t")).count() == 45L)
  }
}
