package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

import graft.operators.Cdc
import graft.plans.{Maintenance, MorMirror}
import graft.sources.Tables.Warehouse

/** Forked-JVM role player for `tools/verify_concurrent.py` — the
  * cross-PROCESS twin of ConcurrentCommitSpec: one JVM plays the ingest
  * stream (sequential appendDelta commits), a second independent JVM
  * plays the scheduled maintenance job (compaction loop), both on the
  * same warehouse path with no coordination beyond the commit protocol
  * itself. The python driver then reconstructs the final state OUTSIDE
  * the JVM (DuckDB over the raw layout) and compares against the known
  * change history — zero lost updates is the pass condition.
  *
  * Batch i inserts key i (`v<i>`) and updates key i-1 (`u<i>`), both at
  * ts `t<i%02d>` — so the expected final state is pure arithmetic for
  * the independent checker, no shared code.
  *
  * Roles:
  *   init      <wh> <table> <buckets>          seed key 0
  *   writer    <wh> <table> <fromBatch> <toBatch> [sleepMs]
  *   compactor <wh> <table> <stopFile> [sleepMs]  loop until stopFile
  *     exists, then one final drain compact
  */
object ConcurrentStress {

  private val cfg = CdcConfig("id", "ts")

  def main(args: Array[String]): Unit = {
    val spark = Harness.session("graft-concurrent-stress", defaultCpus = "4")
    import spark.implicits._

    def changes(rows: (Long, String, String, String)*): DataFrame =
      rows.toDF("id", "name", "op", "ts")

    args.toList match {
      case "init" :: wh :: table :: buckets :: Nil =>
        MorMirror.initialize(Warehouse(wh), table,
          Cdc.fold(changes((0L, "seed", "I", "t00")), cfg), cfg, buckets.toInt)
        println(s"[concurrent] init $table buckets=$buckets")

      case "writer" :: wh :: table :: from :: to :: rest =>
        val sleepMs = rest.headOption.map(_.toLong).getOrElse(30L)
        val w = Warehouse(wh)
        (from.toInt to to.toInt).foreach { i =>
          MorMirror.appendDelta(w, table,
            changes((i.toLong, s"v$i", "I", f"t$i%02d"),
              ((i - 1).toLong, s"u$i", "U", f"t$i%02d")), batchId = i.toLong)
          Thread.sleep(sleepMs)
        }
        println(s"[concurrent] writer done $from..$to")

      case "compactor" :: wh :: table :: stopFile :: rest =>
        val sleepMs = rest.headOption.map(_.toLong).getOrElse(40L)
        val w = Warehouse(wh)
        var runs = 0
        var conflicts = 0
        while (!Files.exists(Paths.get(stopFile))) {
          try { Maintenance.compact(spark, w, table, targetFiles = 1); runs += 1 }
          catch {
            // a run that loses every retry is lossless — the next run
            // picks the deltas up; count it so the driver can assert the
            // contended path actually ran
            case _: java.util.ConcurrentModificationException => conflicts += 1
            case scala.util.control.NonFatal(e)
                if graft.sources.Tables.isSnapshotRace(e) => conflicts += 1
          }
          Thread.sleep(sleepMs)
        }
        Maintenance.compact(spark, w, table, targetFiles = 1) // drain the tail
        println(s"[concurrent] compactor done runs=${runs + 1} abandoned=$conflicts")

      case "consumer" :: wh :: table :: stopFile :: outFile :: rest =>
        // Live incremental consumer: polls changesSince against its
        // cursor while the writer and compactor run in OTHER JVMs,
        // maintaining a latest-wins replica in memory (an independent
        // reimplementation of the fold — tombstones delete, (ts, seq)
        // orders). When a compaction outruns the cursor (loud
        // NoSuchElementException by contract) it re-bootstraps from
        // read() + foldHorizon — the documented recovery. At stop it
        // drains once more and dumps the replica for the python driver
        // to compare against the arithmetic expectation.
        val sleepMs = rest.headOption.map(_.toLong).getOrElse(50L)
        val w = Warehouse(wh)
        val replica = scala.collection.mutable.HashMap[Long, (String, String, Long, String)]()
        var cursor = -1L
        var rebootstraps = 0
        // the bootstrap read is itself exposed to the same snapshot race
        // it recovers FROM (read() resolves base + delta list lazily; two
        // compactions landing before the collect GC the pinned files) —
        // and it runs OUTSIDE poll()'s recovery: at startup and inside
        // the catch. Un-retried, a race there killed the consumer JVM
        // with no recovery (observed twice under machine load before the
        // checker kept consumer stderr). Bounded retry, loud past it.
        def bootstrap(): Unit = {
          var attempts = 0
          var done = false
          while (!done) {
            try {
              cursor = MorMirror.foldHorizon(w, table)
              replica.clear()
              MorMirror.read(spark, w, table)
                .select("id", "name", "ts").collect().foreach { r =>
                  replica(r.getLong(0)) = (r.getString(1), r.getString(2), -1L, "U")
                }
              done = true
            } catch {
              case scala.util.control.NonFatal(e)
                  if graft.sources.Tables.isSnapshotRace(e) && attempts < 20 =>
                attempts += 1; Thread.sleep(100)
            }
          }
        }
        def applyRows(df: org.apache.spark.sql.DataFrame): Unit =
          df.select("id", "name", "ts", Cdc.SeqCol, graft.DmsEnvelope.OpCol)
            .collect().foreach { r =>
              val (id, name, ts) = (r.getLong(0), r.getString(1), r.getString(2))
              val seq = if (r.isNullAt(3)) 0L else r.getLong(3)
              val op = if (r.isNullAt(4)) "U" else r.getString(4)
              val newer = replica.get(id).forall { case (_, oldTs, oldSeq, _) =>
                ts > oldTs || (ts == oldTs && seq >= oldSeq)
              }
              if (newer) replica(id) = (name, ts, seq, op)
            }
        def poll(): Unit =
          try {
            val (d, c) = MorMirror.changesSince(spark, w, table, cursor)
            d.foreach(applyRows); cursor = c
          } catch {
            case _: NoSuchElementException => rebootstraps += 1; bootstrap()
            // the listed delta dirs are lazy-read; a second compaction
            // can GC them between list and collect — same recovery as a
            // cursor that fell behind (re-bootstrap from the new base)
            case scala.util.control.NonFatal(e)
                if graft.sources.Tables.isSnapshotRace(e) =>
              rebootstraps += 1; bootstrap()
          }
        bootstrap()
        while (!Files.exists(Paths.get(stopFile))) { poll(); Thread.sleep(sleepMs) }
        poll() // drain the tail
        val rows = replica.toSeq.collect {
          case (id, (name, _, _, op)) if op != "D" => s"$id,$name"
        }.sorted
        Files.writeString(Paths.get(outFile), rows.mkString("\n"))
        println(s"[concurrent] consumer done rows=${rows.size} " +
          s"cursor=$cursor rebootstraps=$rebootstraps")

      case other =>
        System.err.println(s"unknown role/args: ${other.mkString(" ")}")
        sys.exit(2)
    }
    spark.stop()
  }
}
