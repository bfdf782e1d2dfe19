package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.sources.GraftCatalog

/** Roles of the sustained mixed-workload soak drill
  * (`tools/verify_soak.py`, round-19 verdict item 4): one table takes
  * streaming ingest, concurrent branch DML + cherrypick publishes, and
  * maintenance ticks (cluster/compact + snapshot expiry) from
  * INDEPENDENT JVMs at once — the closest local[32] gets to the 100 TB
  * operational reality. Coordination is ONLY the on-disk commit
  * protocol; the python driver audits the final state with DuckDB.
  *
  * Roles (args: `<role> <whDir> ...`):
  *  - `ingest <wh> <epochs> <rows>`: seed the table (declared key +
  *    1-dim clustering so maintenance ticks exercise the incremental
  *    re-cluster), then stream `epochs` micro-batches of `rows` ids
  *    each through `writeStream.toTable` — ids `0 until epochs*rows`,
  *    `v = (id % 97) / 4.0`.
  *  - `branch <wh> <rounds>`: per round r, stage WAP DML on branch
  *    `fix` — INSERT the reserved range `10_000_000 + r*1000 + (0..999)`
  *    at v=2.0, then UPDATE its lower half to v=3.0 — and publish with
  *    `CALL cherrypick` (disjoint keys: never a genuine conflict; the
  *    CAS retries ride over concurrent stream epochs).
  *  - `expire <wh>`: one age-less `expire_snapshots(keep_last=4)` tick.
  *
  * Expected final state (the python auditor's model): stream ids exact,
  * plus per published round its 1000 reserved ids with v=3.0 below the
  * half boundary and v=2.0 at-or-above it.
  */
object SoakMain {
  private val Reserved = 10000000L
  private val Reserved2 = 20000000L

  def main(args: Array[String]): Unit = args(0) match {
    case "ingest" => ingest(args(1), args(2).toInt, args(3).toLong,
      args.lift(4).map(_.toLong).getOrElse(0L),
      mor = args.lift(5).contains("mor"))
    case "branch" => branch(args(1), args(2).toInt)
    case "mordml" => mordml(args(1), args(2).toInt)
    case "expire" => expire(args(1))
    case other => sys.error(s"unknown soak role '$other'")
  }

  private def ingest(whDir: String, epochs: Int, rowsPerEpoch: Long,
      pauseMs: Long, mor: Boolean = false): Unit = {
    val spark = Harness.session("graft-soak-ingest")
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.gsk", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsk.warehouse", whDir)
    spark.conf.set("spark.sql.catalog.gsk.retain", "8")
    val wh = graft.sources.Tables.Warehouse(whDir, retain = 8)
    spark.sql("CREATE TABLE gsk.soak (id BIGINT, v DOUBLE)")
    spark.sql("ALTER TABLE gsk.soak SET TBLPROPERTIES(" +
      "'cdc.key-column'='id')")
    // merge-on-read soak mode (round 20): DELETE writes equality
    // sidecars and UPDATE/MERGE write delta files — the rival
    // maintenance JVM's ticks then FOLD them mid-stream
    if (mor) spark.sql("ALTER TABLE gsk.soak SET TBLPROPERTIES(" +
      "'write.delete.mode'='merge-on-read')")
    graft.plans.Maintenance.declareClustering(wh, "soak", Seq("id"),
      targetFiles = Some(8))
    println("[soak] SEEDED")
    Console.flush()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Long]
    val q = source.toDS()
      .select($"value".as("id"), ($"value" % 97 / 4.0).as("v"))
      .repartition(4)
      .writeStream
      .option("checkpointLocation", s"$whDir/_ckpt_gsk")
      .trigger(Trigger.ProcessingTime(0))
      .toTable("gsk.soak")
    var next = 0L
    (1 to epochs).foreach { i =>
      source.addData(next until (next + rowsPerEpoch))
      next += rowsPerEpoch
      q.processAllAvailable()
      println(s"[soak] epoch $i committed ($next stream rows total)")
      Console.flush()
      // pacing: keep the stream ALIVE across the branch JVM's warm-up
      // and several maintenance/expiry ticks — the interleave is the
      // drill (an unpaced local stream finishes before its rivals boot)
      if (pauseMs > 0) Thread.sleep(pauseMs)
    }
    q.stop()
    spark.stop()
  }

  private def branch(whDir: String, rounds: Int): Unit = {
    val spark = Harness.session("graft-soak-branch")
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.gsk", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsk.warehouse", whDir)
    spark.conf.set("spark.sql.catalog.gsk.retain", "8")
    spark.sql("CALL gsk.system.create_branch('soak', 'fix')").collect()
    (0 until rounds).foreach { r =>
      val lo = Reserved + r.toLong * 1000L
      val mid = lo + 500L
      val hi = lo + 1000L
      spark.conf.set("spark.graft.wap.branch", "fix")
      try {
        (lo until hi).map(i => (i, 2.0)).toDF("id", "v")
          .createOrReplaceTempView(s"soak_stage_$r")
        spark.sql(s"INSERT INTO gsk.soak SELECT * FROM soak_stage_$r")
        spark.sql(
          s"UPDATE gsk.soak SET v = 3.0 WHERE id >= $lo AND id < $mid")
      } finally spark.conf.unset("spark.graft.wap.branch")
      // publish: the branch keys are disjoint from everything else, so
      // a refusal can only be the CAS racing the stream/maintenance —
      // retry like an operator would (cherrypick itself retries 3x)
      var attempts = 0
      var published = false
      while (!published) {
        try {
          spark.sql("CALL gsk.system.cherrypick('soak', 'fix', '')")
            .collect()
          published = true
        } catch {
          case e: Exception if attempts < 10 =>
            attempts += 1
            Thread.sleep(300)
            System.err.println(
              s"[soak] cherrypick round $r retry $attempts: " +
                s"${e.getMessage.take(120)}")
        }
      }
      println(s"[soak] round $r published (ids $lo..${hi - 1})")
      Console.flush()
    }
    spark.stop()
  }

  /** Merge-on-read DML role (round-20 verdict item 4): per round r over
    * the reserved range `Reserved2 + r*1000`, against the LIVE main —
    * INSERT 1000 rows at v=1.0, delta-MERGE the lower 500 to v=4.0
    * (new data file + equality sidecar retracting the old images), and
    * sidecar-DELETE the top 200 — while the stream appends epochs and
    * the maintenance JVM's ticks fold the sidecars. Every op pins the
    * current snapshot and CAS-commits, so a loss to a rival commit
    * surfaces as a conflict and retries like an operator would (the
    * ops are idempotent under re-run: same keys, same images).
    * Expected model per round: 500 rows v=4.0, 300 rows v=1.0, 200
    * absent.
    */
  private def mordml(whDir: String, rounds: Int): Unit = {
    val spark = Harness.session("graft-soak-mordml")
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.gsk", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsk.warehouse", whDir)
    spark.conf.set("spark.sql.catalog.gsk.retain", "8")
    def retrying(label: String, round: Int)(op: => Unit): Unit = {
      var attempts = 0
      var done = false
      while (!done) {
        try { op; done = true }
        catch {
          case e: Exception if attempts < 12 =>
            attempts += 1
            Thread.sleep(250)
            System.err.println(s"[soak] mor $label round $round retry " +
              s"$attempts: ${String.valueOf(e.getMessage).take(140)}")
        }
      }
    }
    (0 until rounds).foreach { r =>
      val lo = Reserved2 + r.toLong * 1000L
      val mid = lo + 500L
      val delLo = lo + 800L
      val hi = lo + 1000L
      retrying("insert", r) {
        (lo until hi).map(i => (i, 1.0)).toDF("id", "v")
          .createOrReplaceTempView(s"mor_stage_$r")
        spark.sql(s"INSERT INTO gsk.soak SELECT * FROM mor_stage_$r")
      }
      retrying("merge", r) {
        (lo until mid).map(i => (i, 4.0)).toDF("id", "v")
          .createOrReplaceTempView(s"mor_upd_$r")
        spark.sql(s"MERGE INTO gsk.soak t USING mor_upd_$r s " +
          "ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.v")
      }
      retrying("delete", r) {
        spark.sql(s"DELETE FROM gsk.soak WHERE id >= $delLo AND id < $hi")
      }
      println(s"[soak] mor round $r landed (ids $lo..${hi - 1}: " +
        "500 updated, 200 deleted)")
      Console.flush()
    }
    spark.stop()
  }

  private def expire(whDir: String): Unit = {
    val wh = graft.sources.Tables.Warehouse(whDir, retain = 8)
    val dropped = wh.expireSnapshots("soak", keepLast = 4)
    println(s"[soak] expired ${dropped.size} snapshots")
  }
}
