package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.MirrorChangelog
import graft.plans.MirrorChangelog._
import graft.sources.Tables.Warehouse

/** The mirror changelog must (a) classify inserts/deletes/updates with
  * faithful before/after images, (b) emit NOTHING for unchanged keys
  * (null fields included — struct equality is null-safe), and (c) satisfy
  * the replay contract: applying `diff(N, M)` onto snapshot N reproduces
  * snapshot M exactly — including across retained Warehouse versions,
  * which is what makes it an incremental feed and not a report.
  */
class MirrorChangelogSpec extends SparkTestBase {

  private def snap(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "name", "score")
  }

  private def rowsOf(df: DataFrame): Set[(Long, String, Any, String)] =
    df.collect().map(r => (r.getLong(r.fieldIndex("id")),
      r.getString(r.fieldIndex("name")),
      r.get(r.fieldIndex("score")),
      r.getString(r.fieldIndex(ChangeTypeCol)))).toSet

  test("diff classifies insert/delete/update with before+after images; unchanged emit nothing") {
    val oldV = snap((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
    val newV = snap((1L, "a", 1.0), (2L, "b2", 2.5), (4L, "d", 4.0))
    val d = MirrorChangelog.diff(oldV, newV, "id")
    assert(rowsOf(d) == Set(
      (2L, "b", 2.0, UpdateBefore),
      (2L, "b2", 2.5, UpdateAfter),
      (3L, "c", 3.0, Delete),
      (4L, "d", 4.0, Insert)))
  }

  test("null fields compare null-safe: a key with an unchanged null emits no change") {
    import spark.implicits._
    val oldV = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "name")
    val newV = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "name")
    val d = MirrorChangelog.diff(oldV, newV, "id")
    val types = d.select("id", ChangeTypeCol).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(types == Set((2L, UpdateBefore), (2L, UpdateAfter)),
      "null==null must not fabricate a change; x->null must emit one")
  }

  test("additive schema evolution: new column joins as null on before-images") {
    import spark.implicits._
    val oldV = Seq((1L, "a")).toDF("id", "name")
    val newV = Seq((1L, "a", 9L)).toDF("id", "name", "added")
    val d = MirrorChangelog.diff(oldV, newV, "id").collect()
    val byType = d.map(r => r.getString(r.fieldIndex(ChangeTypeCol)) -> r).toMap
    assert(byType.keySet == Set(UpdateBefore, UpdateAfter))
    assert(byType(UpdateBefore).isNullAt(byType(UpdateBefore).fieldIndex("added")))
    assert(byType(UpdateAfter).getLong(byType(UpdateAfter).fieldIndex("added")) == 9L)
  }

  test("replay contract: diff applied to N reproduces M (fuzzed)") {
    val rnd = new scala.util.Random(163)
    (1 to 5).foreach { trial =>
      val keys = 1L to 40L
      def randomSnap(): DataFrame = snap(keys.flatMap { k =>
        if (rnd.nextDouble() < 0.7)
          Some((k, s"v${rnd.nextInt(3)}", rnd.nextInt(5).toDouble))
        else None
      }: _*)
      val a = randomSnap().localCheckpoint(true)
      val b = randomSnap().localCheckpoint(true)
      val replayed = MirrorChangelog.replay(
        a, MirrorChangelog.diff(a, b, "id"), "id")
      val want = b.collect().map(_.toSeq).toSet
      val got = replayed.select("id", "name", "score").collect().map(_.toSeq).toSet
      assert(got == want, s"trial $trial: replay(N, diff) != M")
    }
  }

  test("between two retained versions + replay across the warehouse snapshot log") {
    val wh = Warehouse(tmpDir("chlog"), retain = 3)
    wh.overwrite(snap((1L, "a", 1.0), (2L, "b", 2.0)), "m") // v1
    wh.overwrite(snap((1L, "a", 1.0), (2L, "b2", 2.0), (3L, "c", 3.0)), "m") // v2
    wh.overwrite(snap((2L, "b3", 2.0), (3L, "c", 3.0)), "m") // v3
    assert(wh.listVersions("m") == Seq(1L, 2L, 3L))

    // multi-hop incremental consumption: v1 -> v3 directly
    val d13 = MirrorChangelog.between(spark, wh, "m", 1L, 3L, "id")
    assert(rowsOf(d13) == Set(
      (1L, "a", 1.0, Delete),
      (2L, "b", 2.0, UpdateBefore), (2L, "b3", 2.0, UpdateAfter),
      (3L, "c", 3.0, Insert)))
    val replayed = MirrorChangelog.replay(
      wh.readVersion(spark, "m", 1L), d13, "id")
    assert(replayed.collect().map(_.toSeq).toSet ==
      wh.readVersion(spark, "m", 3L).collect().map(_.toSeq).toSet,
      "diff replayed onto v1 must reproduce v3")

    // chained single hops compose to the same state
    val hop = MirrorChangelog.replay(
      MirrorChangelog.replay(wh.readVersion(spark, "m", 1L),
        MirrorChangelog.between(spark, wh, "m", 1L, 2L, "id"), "id"),
      MirrorChangelog.between(spark, wh, "m", 2L, 3L, "id"), "id")
    assert(hop.collect().map(_.toSeq).toSet ==
      wh.readVersion(spark, "m", 3L).collect().map(_.toSeq).toSet)
  }

  test("emitPending: cursor registers, hops emit once, re-runs are no-ops, replay reproduces the mirror") {
    val wh = Warehouse(tmpDir("chlog-feed"), retain = 5)
    wh.overwrite(snap((1L, "a", 1.0), (2L, "b", 2.0)), "m") // v1
    // consumer registers at v1: cursor set, nothing emitted
    assert(MirrorChangelog.emitPending(spark, wh, "m", "m_changes", "id").isEmpty)
    val origin = wh.readVersion(spark, "m", 1L).localCheckpoint(true)

    wh.overwrite(snap((1L, "a2", 1.0), (3L, "c", 3.0)), "m") // v2
    wh.overwrite(snap((1L, "a2", 1.0), (3L, "c2", 3.5), (4L, "d", 4.0)), "m") // v3
    val hops = MirrorChangelog.emitPending(spark, wh, "m", "m_changes", "id")
    assert(hops == Seq((1L, 2L), (2L, 3L)))
    // idempotent: nothing new pending
    assert(MirrorChangelog.emitPending(spark, wh, "m", "m_changes", "id").isEmpty)

    // replaying the feed in hop order from the registration-time state
    // reproduces the current mirror exactly
    val feed = wh.read(spark, "m_changes", mergeSchema = true)
    val replayed = (2L to 3L).foldLeft(origin) { (st, v) =>
      MirrorChangelog.replay(st,
        feed.filter(col("_to_version") === v)
          .drop("_from_version", "_to_version"), "id")
    }
    assert(replayed.collect().map(_.toSeq).toSet ==
      wh.read(spark, "m").collect().map(_.toSeq).toSet,
      "the emitted feed must reproduce the mirror from the consumer's origin")
  }

  test("emitPending reads LOGICAL content through pending MOR sidecars: the delete hop carries the deletions, the fold hop is empty") {
    import spark.implicits._
    import graft.sources.{EqDeletes, GraftCatalog, PosDeletes, Tables}
    val root = tmpDir("chlog-mor")
    val wh = Warehouse(root, retain = 8)
    wh.overwrite((1L to 10L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(2).localCheckpoint(true), "m") // v1
    Tables.TableProps.write(wh, "m", Map(
      EqDeletes.ModeProp -> "merge-on-read", EqDeletes.KeyProp -> "id"))
    val cat = "mcfeed"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
    spark.conf.set(s"spark.sql.catalog.$cat.retain", "8")
    assert(MirrorChangelog.emitPending(spark, wh, "m", "m_ch", "id").isEmpty)
    // v2: a MOR DELETE — the snapshot carries a pending equality sidecar
    spark.sql(s"DELETE FROM $cat.m WHERE id <= 3")
    assert(EqDeletes.pending(wh.snapshotPath("m")).nonEmpty)
    assert(MirrorChangelog.emitPending(spark, wh, "m", "m_ch", "id") ==
      Seq((1L, 2L)))
    def hop(v: Long): Set[(Long, String)] =
      wh.read(spark, "m_ch", mergeSchema = true)
        .filter(col("_to_version") === v)
        .select("id", ChangeTypeCol).collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          r.getString(1))).toSet
    assert(hop(2L) == Set((1L, Delete), (2L, Delete), (3L, Delete)),
      "the delete hop must diff the LOGICAL content (a raw read of the " +
        "sidecar-bearing snapshot would emit nothing here)")
    // fold (compact = fold + rewrite commits) — logical content is
    // identical at every hop, so they must all be EMPTY (the pre-fix
    // raw read reported the deletions HERE, one version late for every
    // incremental consumer)
    spark.sql(s"CALL $cat.system.compact('m', 2)").collect()
    assert(EqDeletes.pending(wh.snapshotPath("m")).isEmpty)
    val foldHops = MirrorChangelog.emitPending(spark, wh, "m", "m_ch", "id")
    assert(foldHops.nonEmpty && foldHops.head._1 == 2L)
    foldHops.foreach { case (_, to) =>
      assert(hop(to).isEmpty,
        s"emit over the fold must be empty (hop -> v$to): " +
          "emit-with-pending == emit-after-compact")
    }
    // and the POSITIONAL kind: a NULL-key delete routes ordinally, its
    // hop still carries exactly the logical deletions
    wh.appendVersioned(spark.sql(
      "SELECT CAST(null AS BIGINT) id, 'ng' s"), "m")
    spark.sql(s"DELETE FROM $cat.m WHERE s = 'ng' OR id = 9")
    assert(PosDeletes.pending(wh.snapshotPath("m")).nonEmpty)
    val posHops = MirrorChangelog.emitPending(spark, wh, "m", "m_ch", "id")
    assert(posHops.size == 2, posHops.toString)
    assert(hop(posHops.head._2) == Set((-1L, Insert)))
    assert(hop(posHops.last._2) == Set((-1L, Delete), (9L, Delete)),
      "the positional hop must carry the logical deletions, got " +
        s"${hop(posHops.last._2)}")
  }

  test("the feed view is STREAM-TAILABLE: a stock file stream absorbs each emitted hop exactly once across restarts (the documented streaming-read remedy)") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmpDir("chlog-tail")
    val wh = Warehouse(root, retain = 8)
    wh.overwrite(snap((1L, "a", 1.0), (2L, "b", 2.0)), "m") // v1
    assert(MirrorChangelog.emitPending(spark, wh, "m", "m_feed", "id").isEmpty)
    wh.overwrite(snap((1L, "a2", 1.0), (3L, "c", 3.0)), "m") // v2
    assert(MirrorChangelog.emitPending(spark, wh, "m", "m_feed", "id") ==
      Seq((1L, 2L)))
    val feedDir = wh.tablePath("m_feed")
    val schema = wh.read(spark, "m_feed", mergeSchema = true).schema
    val ckpt = tmpDir("chlog-tail-ckpt")
    val outDir = tmpDir("chlog-tail-out")
    def drain(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(feedDir)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    drain()
    def tailed: Set[(Long, String, Long)] =
      spark.read.schema(schema).parquet(outDir)
        .selectExpr("id", ChangeTypeCol, "_to_version")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
    val hop2 = Set(
      (1L, UpdateBefore, 2L), (1L, UpdateAfter, 2L),
      (2L, Delete, 2L), (3L, Insert, 2L))
    assert(tailed == hop2, tailed.toString)
    // a later hop lands; a RESTARTED stream (same checkpoint) absorbs
    // ONLY the new hop — the feed's per-hop subdirs are a plain file
    // source, so exactly-once rides the stock checkpoint
    wh.overwrite(snap((1L, "a2", 1.0), (3L, "c", 3.0), (4L, "d", 4.0)), "m")
    assert(MirrorChangelog.emitPending(spark, wh, "m", "m_feed", "id") ==
      Seq((2L, 3L)))
    drain()
    assert(tailed == hop2 + ((4L, Insert, 3L)),
      s"the restart must absorb exactly the new hop, got $tailed")
  }

  test("tailAsConsumer auto-advances the retention cursor exactly with absorbed hops: never ahead, crash-healed, zero manual CALLs") {
    val root = tmpDir("chlog-auto")
    val wh = Warehouse(root, retain = 8)
    wh.overwrite(snap((1L, "a", 1.0), (2L, "b", 2.0)), "m") // v1
    assert(MirrorChangelog.emitPending(spark, wh, "m", "m_feed", "id").isEmpty)
    wh.overwrite(snap((1L, "a2", 1.0), (3L, "c", 3.0)), "m") // v2
    assert(MirrorChangelog.emitPending(spark, wh, "m", "m_feed", "id") ==
      Seq((1L, 2L)))
    val ckpt = tmpDir("chlog-auto-ckpt")
    val outDir = tmpDir("chlog-auto-out")
    def cursorOf: Option[Long] =
      MirrorChangelog.consumerStates(wh, "m_feed")
        .collectFirst { case ("tail", c, _, _) => c }
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    // absorb is durable + idempotent (overwrite keyed by stream batch
    // id) — the standard foreachBatch exactly-once recipe the helper's
    // contract mandates
    def drain(failFirst: Boolean): Unit = {
      val q = MirrorChangelog.tailAsConsumer(spark, wh, "m_feed", "tail",
        ckpt) { (b, batchId) =>
        b.write.mode("overwrite").parquet(s"$outDir/b_$batchId")
        if (failFirst && failOnce.compareAndSet(false, true))
          throw new RuntimeException(
            "injected crash between absorb and advance")
      }
      try { q.awaitTermination(120000); () }
      catch {
        case _: org.apache.spark.sql.streaming.StreamingQueryException => ()
      }
    }
    // crash AFTER the durable absorb, BEFORE the advance: the cursor
    // must stay stale-LOW (unregistered — never ahead of a hop the
    // consumer has not provably absorbed)
    drain(failFirst = true)
    assert(cursorOf.isEmpty,
      "a crash before the advance must leave the cursor stale-LOW")
    // the restarted stream re-delivers the batch from the checkpoint;
    // the idempotent absorb re-lands the same bytes and the cursor
    // advances to exactly the absorbed hop
    drain(failFirst = false)
    assert(cursorOf.contains(2L), s"cursor after heal: $cursorOf")
    // two more hops; the restarted tail absorbs ONLY them and the
    // cursor follows to the new emission cursor — still zero CALLs
    wh.overwrite(snap((1L, "a2", 1.0), (3L, "c", 3.0), (4L, "d", 4.0)),
      "m") // v3
    wh.overwrite(snap((1L, "a2", 1.0), (3L, "c", 3.0), (4L, "d", 4.0),
      (5L, "e", 5.0)), "m") // v4
    assert(MirrorChangelog.emitPending(spark, wh, "m", "m_feed", "id") ==
      Seq((2L, 3L), (3L, 4L)))
    drain(failFirst = false)
    assert(cursorOf.contains(4L), s"cursor after second drain: $cursorOf")
    assert(MirrorChangelog.emissionCursor(wh, "m_feed").contains(4L))
    val absorbed = spark.read.option("recursiveFileLookup", "true")
      .parquet(outDir)
    assert(absorbed.select("_to_version").distinct().collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L, 4L),
      "every hop absorbed exactly once across the crash-restart")
    assert(absorbed.count() == 6L,
      "hop2 = 4 change rows (update pair + delete + insert), " +
        "hop3/hop4 = 1 insert each; re-delivery must not double rows")
    // retention now gates BY CONSTRUCTION: the auto-registered consumer
    // is the only registration, and every absorbed-and-aged hop sweeps
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 120000)
    java.nio.file.Files.walk(
      java.nio.file.Paths.get(wh.tablePath("m_feed"))).forEach(p =>
      java.nio.file.Files.setLastModifiedTime(p, old))
    val swept = MirrorChangelog.expireConsumedHops(wh, "m_feed", 60000L)
    assert(swept.map(_.split("/").last).toSet ==
      Set("batch_2", "batch_3", "batch_4"),
      s"absorbed+aged hops must sweep with zero manual CALLs: $swept")
  }

  test("emitPending fails loudly when the cursor's snapshot was GC'd (retention too shallow)") {
    val wh = Warehouse(tmpDir("chlog-gc"), retain = 2)
    wh.overwrite(snap((1L, "a", 1.0)), "t") // v1
    assert(MirrorChangelog.emitPending(spark, wh, "t", "t_changes", "id").isEmpty)
    // three more commits: v1 (the cursor) falls out of the retain=2 window
    (2 to 4).foreach(i => wh.overwrite(snap((1L, s"a$i", i.toDouble)), "t"))
    val e = intercept[NoSuchElementException] {
      MirrorChangelog.emitPending(spark, wh, "t", "t_changes", "id")
    }
    assert(e.getMessage.contains("no retained version"),
      s"GC'd cursor must fail loudly, got: ${e.getMessage}")
  }

  test("stream-then-feed: the changelog view of a streamed flat mirror tracks every commit") {
    import spark.implicits._
    val g = DmsGenerator.generate(51L)
    val src = tmpDir("feed-src")
    val ckpt = tmpDir("feed-ckpt")
    val wh = Warehouse(tmpDir("feed-wh"), retain = 16)
    val spec = PipelineSpec(src, "fm_changelog", "fm", CdcConfig("id", "ts"))
    def writeBatch(logs: Seq[DmsGenerator.Log], path: String): Unit =
      logs.toDF().withColumnRenamed("modificationDate", "modification_date")
        .coalesce(1).write.mode("overwrite").parquet(path)

    // first drain commits v1; the consumer registers on it
    writeBatch(g.batches.head, s"$src/dms_logs_1.parquet")
    graft.streaming.CdcStream.start(spark, wh, spec, ckpt).awaitTermination()
    assert(MirrorChangelog.emitPending(spark, wh, "fm", "fm_changes", "id").isEmpty)
    val origin = wh.read(spark, "fm").localCheckpoint(true)

    // each later file is its own micro-batch -> its own mirror version
    g.batches.tail.zipWithIndex.foreach { case (b, i) =>
      writeBatch(b, s"$src/dms_logs_${i + 2}.parquet")
    }
    graft.streaming.CdcStream.start(spark, wh, spec, ckpt,
      maxFilesPerTrigger = Some(1)).awaitTermination()
    val hops = MirrorChangelog.emitPending(spark, wh, "fm", "fm_changes", "id")
    assert(hops.size == g.batches.size - 1, s"one hop per commit, got $hops")

    // the feed diffs STORED mirror states (tombstones + bookkeeping
    // included) — replay over the stored origin, compare visible states
    val feed = wh.read(spark, "fm_changes", mergeSchema = true)
    val replayed = hops.foldLeft(origin) { case (st, (_, to)) =>
      MirrorChangelog.replay(st,
        feed.filter(col("_to_version") === to)
          .drop("_from_version", "_to_version"), "id")
    }
    val want = graft.operators.Cdc.currentState(wh.read(spark, "fm"))
      .select("id", "name").collect().map(_.toSeq).toSet
    assert(graft.operators.Cdc.currentState(replayed)
      .select("id", "name").collect().map(_.toSeq).toSet == want,
      "incremental consumption must reconstruct the streamed mirror")
    assert(want == g.expectedFinal.map(r => Seq(r.id, r.name)).toSet)
  }

  test("retention matrix: GC keeps exactly `retain` versions; a GC'd read fails loudly") {
    val deep = Warehouse(tmpDir("chlog-deep"), retain = 4)
    (1 to 6).foreach(i => deep.overwrite(snap((1L, s"v$i", i.toDouble)), "t"))
    assert(deep.listVersions("t") == Seq(3L, 4L, 5L, 6L))
    assert(deep.currentVersion("t").contains(6L))
    // every retained version is readable (snapshot isolation across k)
    (3L to 6L).foreach { v =>
      assert(deep.readVersion(spark, "t", v).collect()
        .map(_.getString(1)).toSeq == Seq(s"v$v"))
    }
    val e = intercept[NoSuchElementException] {
      deep.readVersion(spark, "t", 2L)
    }
    assert(e.getMessage.contains("no retained version 2"))

    // default retention is unchanged round-9 behavior: current + one
    val shallow = Warehouse(tmpDir("chlog-shallow"))
    (1 to 3).foreach(i => shallow.overwrite(snap((1L, s"v$i", i.toDouble)), "t"))
    assert(shallow.listVersions("t") == Seq(2L, 3L))
  }
}
