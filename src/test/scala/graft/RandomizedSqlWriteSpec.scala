package graft

import scala.collection.mutable
import scala.util.Random

import graft.sources.GraftCatalog
import graft.sources.Tables.Warehouse

/** Randomized golden-model check of the SQL write surface: a seeded
  * stream of mutations — INSERT INTO, UPDATE, pushable and
  * rewrite-flavor DELETE, three-arm MERGE INTO, INSERT OVERWRITE,
  * TRUNCATE, ROLLBACK to a random retained snapshot (restoring the
  * model state that version held), and explicit snapshot expiry — runs
  * against a catalog table AND a driver-side model map; the table must
  * equal the model after every few operations. Re-cluster ticks
  * interleave so the file-granular COW paths (static zone-map selection,
  * runtime bloom narrowing, carried hard links) are exercised
  * mid-stream, not just on a pristine layout. Arithmetic sticks to
  * binary fractions (0.25 steps) so double comparison is exact.
  */
class RandomizedSqlWriteSpec extends SparkTestBase {
  import spark.implicits._

  private def register(name: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", root)
    // deep enough retention that the rollback arm has history to restore
    spark.conf.set(s"spark.sql.catalog.$name.retain", "4")
  }

  private val grps = Vector("a", "b", "c", "d", "e")

  private def check(cat: String, model: mutable.Map[Long, (String, Double)],
      step: String, grpCol: String = "grp"): Unit = {
    val got = spark.sql(s"SELECT id, $grpCol, x FROM $cat.t ORDER BY id")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getDouble(2))))
      .toSeq
    val want = model.toSeq.sortBy(_._1)
    assert(got == want,
      s"divergence after $step:\n table=${got.take(20)}...\n model=${want.take(20)}...")
  }

  protected def run(seed: Int, withEvolution: Boolean = false,
      mor: Boolean = false, keyCols: String = "id"): Unit = {
    val rng = new Random(seed)
    val root = tmpDir(s"sqlw-fuzz-$seed")
    val wh = Warehouse(root, retain = 4)
    val cat = s"wf$seed"
    register(cat, root)
    val model = mutable.Map.empty[Long, (String, Double)]
    var nextId = 0L
    def freshRows(k: Int): Seq[(Long, String, Double)] = (0 until k).map { _ =>
      val id = nextId; nextId += 1
      (id, grps(rng.nextInt(grps.size)), rng.nextInt(64) * 0.25)
    }
    def valuesSql(rows: Seq[(Long, String, Double)]): String =
      rows.map { case (i, g, x) => s"($i, '$g', CAST($x AS DOUBLE))" }
        .mkString(", ")

    // seed table
    val seedRows = freshRows(20)
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, grp STRING, x DOUBLE)")
    spark.sql(s"INSERT INTO $cat.t VALUES ${valuesSql(seedRows)}")
    seedRows.foreach { case (i, g, x) => model(i) = (g, x) }
    graft.plans.Maintenance.declareClustering(wh, "t", Seq("id"),
      bloomKeys = Seq("id"), targetFiles = Some(4))
    // MOR mode: translatable deletes become equality-delete sidecars;
    // every read between a delete and the next compact exercises the
    // per-signature sidecar scan against the model
    // COMPOSITE keys (round 17): 'id,grp' — an UPDATE that rewrites grp
    // CHANGES the row's identity, so the delta write must delete the OLD
    // tuple and reinsert under the new one; the model (keyed by the
    // still-unique id) is blind to the mechanism and catches any drift
    if (mor) spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES(" +
      s"'write.delete.mode'='merge-on-read', 'cdc.key-column'='$keyCols')")
    // group-based rewrites (UPDATE/MERGE/untranslatable DELETE) refuse
    // while sidecars pend — fold first, exactly as an operator would
    def foldIfPending(): Unit =
      if (mor && graft.sources.EqDeletes
          .pending(wh.snapshotPath("t")).nonEmpty)
        spark.sql(s"CALL $cat.system.compact('t', 4)").collect()

    // per-version model snapshots: what the ROLLBACK arm restores; every
    // committed version maps to the model state it held
    val history = mutable.Map.empty[Long, Map[Long, (String, Double)]]
    def snapshot(): Unit =
      wh.currentVersion("t").foreach(v => history(v) = model.toMap)
    snapshot()

    var grpCol = "grp"
    (1 to 24).foreach { step =>
      // mid-stream DECLARED schema evolution: the rename registers in the
      // SchemaEvolution registry + one COW rewrite; every later mutation
      // (and the model compare) speaks the new name, while the pre-rename
      // snapshot keeps its bytes
      if (withEvolution && step == 12) {
        val before = wh.currentVersion("t").get
        spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN grp TO label")
        grpCol = "label"
        assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF $before")
          .schema.fieldNames.contains("grp"),
          "the pre-rename snapshot must keep its own schema")
        check(cat, model, s"seed=$seed rename", grpCol)
      }
      // deterministic branch + CHERRYPICK block (round 19) at fixed
      // steps (so the seeds' random streams stay identical): fork,
      // stage an INSERT + identity-stable UPDATE of branch-only ids
      // under WAP, publish with CALL cherrypick (never a genuine
      // conflict — fresh ids), drop the branch. The golden model is
      // blind to the replay mechanism (sidecar apply on MOR layouts,
      // COW otherwise) and catches any drift it introduces.
      if (step == 8 || step == 18) {
        val b = s"fz$step"
        spark.sql(s"CALL $cat.system.create_branch('t', '$b')").collect()
        val rows = freshRows(2 + rng.nextInt(3))
        spark.conf.set("spark.graft.wap.branch", b)
        try {
          spark.sql(s"INSERT INTO $cat.t VALUES ${valuesSql(rows)}")
          spark.sql(
            s"UPDATE $cat.t SET x = x + 0.25 WHERE id = ${rows.head._1}")
        } finally spark.conf.unset("spark.graft.wap.branch")
        spark.sql(s"CALL $cat.system.cherrypick('t', '$b', 'id')").collect()
        spark.sql(s"CALL $cat.system.drop_branch('t', '$b')").collect()
        rows.zipWithIndex.foreach { case ((i, g, x), ix) =>
          model(i) = (g, if (ix == 0) x + 0.25 else x) }
        snapshot()
        check(cat, model, s"seed=$seed cherrypick step=$step", grpCol)
      }
      rng.nextInt(if (mor) 11 else 10) match {
        case 0 | 1 => // INSERT fresh rows
          val rows = freshRows(1 + rng.nextInt(4))
          spark.sql(s"INSERT INTO $cat.t VALUES ${valuesSql(rows)}")
          rows.foreach { case (i, g, x) => model(i) = (g, x) }
        case 2 => // UPDATE by group (a DELTA write in mor mode — stacks
          // a sidecar over pending deletes, no fold required)
          val g = grps(rng.nextInt(grps.size))
          spark.sql(s"UPDATE $cat.t SET x = x + 0.25 WHERE $grpCol = '$g'")
          model.mapValuesInPlace { case (_, (mg, mx)) =>
            if (mg == g) (mg, mx + 0.25) else (mg, mx) }
        case 3 => // pushable DELETE (range; a MOR sidecar in mor mode)
          val lo = rng.nextInt(nextId.toInt + 1).toLong
          val hi = lo + rng.nextInt(10)
          spark.sql(s"DELETE FROM $cat.t WHERE id BETWEEN $lo AND $hi")
          model.filterInPlace { case (i, _) => i < lo || i > hi }
        case 4 => // rewrite-flavor DELETE (modulo: group-based even in mor)
          foldIfPending()
          val m = 2 + rng.nextInt(5)
          val r = rng.nextInt(m)
          spark.sql(s"DELETE FROM $cat.t WHERE id % $m = $r AND x > 4.0")
          model.filterInPlace { case (i, (_, x)) => !(i % m == r && x > 4.0) }
        case 5 => // MERGE: update some existing, delete some, insert
          // fresh (a DELTA write in mor mode — stacks like the UPDATE)
          val existing = rng.shuffle(model.keys.toSeq).take(3)
          val fresh = freshRows(2)
          val src = existing.map(i => (i, grps(rng.nextInt(grps.size)),
              rng.nextInt(64) * 0.25, i % 2 == 0)) ++
            fresh.map { case (i, g, x) => (i, g, x, false) }
          if (src.nonEmpty) {
            src.toDF("id", "grp", "x", "is_del")
              .createOrReplaceTempView(s"fuzz_src_$seed")
            spark.sql(
              s"""MERGE INTO $cat.t t USING fuzz_src_$seed s ON t.id = s.id
                 |WHEN MATCHED AND s.is_del THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET $grpCol = s.grp, x = s.x
                 |WHEN NOT MATCHED AND NOT s.is_del THEN INSERT (id, $grpCol, x)
                 |  VALUES (s.id, s.grp, s.x)""".stripMargin)
            src.foreach { case (i, g, x, del) =>
              if (del) { if (model.contains(i)) model.remove(i) else () }
              else model(i) = (g, x)
            }
          }
        case 6 => // maintenance tick: incremental-first re-cluster
          wh.retryingConflicts(maxAttempts = 10) {
            if (!graft.plans.Maintenance.clusterIncremental(
                spark, wh, "t", Seq("id"), Seq("id")))
              graft.plans.Maintenance.cluster(spark, wh, "t", Seq("id"), 4,
                bloomKeys = Seq("id"))
          }
        case 7 => // rare resets
          if (rng.nextBoolean()) {
            val rows = freshRows(5)
            spark.sql(s"INSERT OVERWRITE $cat.t VALUES ${valuesSql(rows)}")
            model.clear(); rows.foreach { case (i, g, x) => model(i) = (g, x) }
          } else {
            spark.sql(s"TRUNCATE TABLE $cat.t")
            model.clear()
          }
        case 8 => // ROLLBACK to a random retained snapshot (roll-forward)
          // skipped after a rename: a pre-rename snapshot restores the old
          // column name and the model compare speaks the new one
          val vs = wh.listVersions("t").filter(history.contains)
          if (vs.nonEmpty && grpCol == "grp") {
            val v = vs(rng.nextInt(vs.size))
            spark.sql(s"CALL $cat.system.rollback_to_version('t', $v)")
            model.clear(); model ++= history(v)
          }
        case 9 => // explicit snapshot expiry mid-stream: data unchanged.
          // Randomly exercise the age axis too: a cutoff in the past is
          // a no-op (everything is younger), a future one defers to the
          // keep_last floor — current data survives either way
          val age = rng.nextInt(3) match {
            case 0 => ""
            case 1 => s", ${System.currentTimeMillis() - 3600 * 1000L}"
            case _ => s", ${System.currentTimeMillis() + 1000L}"
          }
          spark.sql(s"CALL $cat.system.expire_snapshots('t', " +
            s"${2 + rng.nextInt(3)}$age)")
        case 10 => // (mor only) re-INSERT a previously deleted id — the
          // census rule must keep it alive past the older sidecars
          val deleted = (0L until nextId).filterNot(model.contains)
          if (deleted.nonEmpty) {
            val id = deleted(rng.nextInt(deleted.size))
            val g = grps(rng.nextInt(grps.size))
            val x = rng.nextInt(64) * 0.25
            spark.sql(s"INSERT INTO $cat.t VALUES ($id, '$g', " +
              s"CAST($x AS DOUBLE))")
            model(id) = (g, x)
          }
      }
      snapshot()
      if (step % 4 == 0) check(cat, model, s"seed=$seed step=$step", grpCol)
    }
    check(cat, model, s"seed=$seed final", grpCol)
  }

  test("random SQL mutation stream equals the golden model (seed 7)") { run(7) }
  test("random SQL mutation stream equals the golden model (seed 23)") { run(23) }
  test("random SQL mutation stream with a mid-stream column rename (seed 41)") {
    run(41, withEvolution = true)
  }
  test("random SQL mutation stream equals the golden model (seed 97)") { run(97) }
  test("random SQL mutation stream on a MERGE-ON-READ table (seed 13): sidecar scans, re-inserted keys, fold ticks all equal the model") {
    run(13, mor = true)
  }
  test("random SQL mutation stream on a MERGE-ON-READ table (seed 61)") {
    run(61, mor = true)
  }
  test("random SQL mutation stream on a COMPOSITE-key (id,grp) MERGE-ON-READ table (seed 29): tuple sidecars, identity-changing updates, fold ticks all equal the model") {
    run(29, mor = true, keyCols = "id,grp")
  }
  test("random SQL mutation stream on a COMPOSITE-key MERGE-ON-READ table (seed 83)") {
    run(83, mor = true, keyCols = "id,grp")
  }
}
