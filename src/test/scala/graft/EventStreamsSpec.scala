package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{CdcStateful, EventStreams}
import graft.streaming.CdcStateful.DmsChange

/** Real StreamingQuery execution for the windowed aggregations and the
  * stateful CDC path: streaming results must equal the batch results of the
  * same transforms (incremental ≡ batch), and the state-store fold must
  * reproduce the latest-wins semantics of the batch Cdc kernel.
  */
class EventStreamsSpec extends SparkTestBase {

  /** events at sf0.001 with a proper TimestampType ts column (µs). */
  private lazy val eventsTs: DataFrame = {
    val ev = graft.operators.Queries.events(spark, "/root/testdata/sf0.001")
    ev.withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
  }

  private def runStream(transform: DataFrame => DataFrame, name: String): DataFrame = {
    val src = tmpDir("stream-src")
    eventsTs.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(eventsTs.schema)
      .option("recursiveFileLookup", "true").parquet(src)
    val q = transform(EventStreams.watermarked(stream))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", tmpDir("stream-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("streaming tumbling window == batch tumbling window") {
    val streamed = runStream(EventStreams.tumblingCounts(_), "tumbling_out")
    val batch = EventStreams.tumblingCounts(eventsTs)
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }

  test("streaming sliding window == batch; each event lands in width/slide windows") {
    val streamed = runStream(EventStreams.slidingCounts(_), "sliding_out")
    val batch = EventStreams.slidingCounts(eventsTs)
    assert(canon(streamed) == canon(batch))
    val total = streamed.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == 2 * eventsTs.count(), "2-day/1-day slide duplicates each event once")
  }

  test("streaming session window == batch session window") {
    val streamed = runStream(EventStreams.sessionCounts(_), "session_out")
    val batch = EventStreams.sessionCounts(eventsTs)
    assert(canon(streamed) == canon(batch))
  }

  test("streaming windowed heavy_hitters == batch (mergeable summary under incremental state)") {
    graft.functions.GraftFunctions.register(spark)
    def hh(df: DataFrame): DataFrame = df
      .groupBy(window(col("ts"), "1 day"))
      .agg(expr("heavy_hitters(event_type, 32)").as("hh"))
      .select(col("window.start").as("day"),
        expr("transform(hh, e -> concat(e.item, ':', e.cnt))").as("ranked"))
    val streamed = runStream(hh(_), "hh_out")
    val batch = hh(eventsTs)
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }

  test("streaming bottom-k hash sample == batch (q106's sampling primitive under incremental state)") {
    graft.functions.GraftFunctions.register(spark)
    // the q106 move on a stream: per-day uniform sample = the 8 rows with
    // the smallest md5(event_id), kept incrementally by the mergeable
    // top_k_by state (KMV property: k-smallest of a union = k-smallest of
    // the parts' k-smallest), so streamed state == one-shot batch exactly
    def smp(df: DataFrame): DataFrame = df
      .withColumn("h", expr(
        "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      .groupBy(window(col("ts"), "1 day"))
      .agg(expr("top_k_by(CAST(event_id AS STRING), -h, 8)").as("smp"))
      .select(col("window.start").as("day"),
        expr("transform(smp, e -> e.v)").as("sampled_ids"))
    val streamed = runStream(smp(_), "smp_out")
    val batch = smp(eventsTs)
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }

  test("streaming dedup keeps one row per key; watermark bounds the state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "k", "v")
    val q = EventStreams.dedupStream(df, Seq("k"), delay = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("dedup-ckpt"))
      .start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    input.addData((ts(0), 1L, "a"), (ts(1), 1L, "a-dup"), (ts(2), 2L, "b"))
    drain(q)
    input.addData((ts(3), 1L, "a-dup2"), (ts(4), 3L, "c"))
    drain(q)
    q.stop()
    val out = spark.table("dedup_out").collect()
      .map(r => (r.getLong(1), r.getString(2)))
    assert(out.toSet == Set((1L, "a"), (2L, "b"), (3L, "c")),
      s"duplicates within the watermark horizon must be dropped, got ${out.toSeq}")
  }

  test("stream-stream interval join == batch interval join") {
    val src = tmpDir("ssj-src")
    eventsTs.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(eventsTs.schema)
      .option("recursiveFileLookup", "true").parquet(src)
    val q = EventStreams.conversionJoin(stream)
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ssj-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("ssj_out")
    val batch = EventStreams.conversionJoin(eventsTs)
    assert(canon(streamed) == canon(batch))
    assert(batch.count() > 0, "expected conversions in testdata")
  }

  test("env-based pipeline config parses the reference's config surface") {
    val cfg = PipelineConfig.fromEnv(Map(
      "GRAFT_WAREHOUSE_DIR" -> "/tmp/wh",
      "GRAFT_SOURCES" -> "/data/a, /data/b,",
      "GRAFT_CDC_TS" -> "ts"))
    assert(cfg.warehouseDir == "/tmp/wh")
    assert(cfg.cdc == CdcConfig("id", "ts"), "key defaults to the reference's production value")
    assert(cfg.sources == Seq("/data/a", "/data/b"))
    assert(cfg.mirrorBuckets.isEmpty, "flat mirror is the reference-faithful default")
    val bucketed = PipelineConfig.fromEnv(Map(
      "GRAFT_WAREHOUSE_DIR" -> "/tmp/wh", "GRAFT_SOURCES" -> "/data/a",
      "GRAFT_MIRROR_BUCKETS" -> "128"))
    assert(bucketed.mirrorBuckets.contains(128))
    assert(bucketed.catalog.isEmpty, "offline warehouse catalog is the default")
    val rest = PipelineConfig.fromEnv(Map(
      "GRAFT_WAREHOUSE_DIR" -> "/tmp/wh", "GRAFT_SOURCES" -> "/data/a",
      "GRAFT_CATALOG_URL" -> "https://cat.example.com",
      "GRAFT_CATALOG_NAMESPACE" -> "db",
      "GRAFT_CATALOG_CREDENTIAL" -> "id:secret"))
    assert(rest.catalog.contains(("https://cat.example.com", "db", "id:secret")))
    // a catalog URL without a credential must fail loudly, not silently
    // fall back to the offline catalog (the reference requires
    // TABULAR_CREDENTIAL, batch_bootstrapper.py:43)
    intercept[IllegalArgumentException](PipelineConfig.fromEnv(Map(
      "GRAFT_WAREHOUSE_DIR" -> "/tmp/wh", "GRAFT_SOURCES" -> "/data/a",
      "GRAFT_CATALOG_URL" -> "https://cat.example.com")))
    intercept[IllegalArgumentException](PipelineConfig.fromEnv(Map.empty))
  }

  test("stateful CDC: tombstone TTL evicts state; null ts loses to any real ts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DmsChange]
    // ProcessingTimeTimeout makes FlatMapGroupsWithStateExec.shouldRunAnotherBatch
    // return true UNCONDITIONALLY (Spark runs no-data batches forever so
    // pending timeouts can fire). Two consequences for this test, learned
    // from the round-2 "deadlock": (a) `processAllAvailable` NEVER returns
    // for such a query — `noNewData` is never set — so synchronization must
    // poll the sink instead; (b) the default 0ms trigger busy-loops
    // micro-batches flat out, flooding the checkpoint dir. A paced trigger
    // keeps the timeout machinery (the thing under test) and bounds churn.
    val q = CdcStateful.latestStateStream(spark, input.toDS(),
        tombstoneTtl = Some("1 second"))
      .writeStream.format("memory").queryName("cdc_ttl_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
      .option("checkpointLocation", tmpDir("ttl-ckpt"))
      .start()
    def rowsFor(id: Long): Seq[CdcStateful.KeyUpdate] =
      spark.table("cdc_ttl_out").as[CdcStateful.KeyUpdate].collect().filter(_.id == id).toSeq
    def awaitSink(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!cond) {
        if (System.nanoTime() > deadline) { q.stop(); fail(s"sink never showed: $what") }
        q.exception.foreach(e => fail(s"query failed waiting for $what", e))
        Thread.sleep(100)
      }
    }
    // null ts orders below a real ts (batch-path alignment), no NPE
    input.addData(
      DmsChange(7, "real", "m", "I", "2024-01-01T00:00:00"),
      DmsChange(7, "null-ts", "m", "U", null))
    awaitSink("key 7 insert")(rowsFor(7).nonEmpty)
    // key 2: insert then delete -> tombstone armed with the 1s TTL
    input.addData(DmsChange(2, "b", "m", "I", "2024-01-01T00:00:01"))
    awaitSink("key 2 insert")(rowsFor(2).nonEmpty)
    input.addData(DmsChange(2, "b", "m", "D", "2024-01-02T00:00:00"))
    awaitSink("key 2 tombstone")(rowsFor(2).exists(_.deleted))
    // let the TTL lapse; the continuously-triggered batches fire the timeout
    // and GC the state entry on their own (no data needed)
    Thread.sleep(2500)
    // a change OLDER than the (now evicted) tombstone: with the tombstone
    // retained it would lose silently; after GC it re-establishes the key —
    // the observable proof the state entry was removed
    input.addData(DmsChange(2, "post-gc", "m", "U", "2024-01-01T12:00:00"))
    awaitSink("key 2 post-gc resurrection")(rowsFor(2).exists(_.name == "post-gc"))
    q.stop()
    val out = spark.table("cdc_ttl_out").as[CdcStateful.KeyUpdate].collect()
    assert(out.filter(_.id == 7).map(_.name).toSeq == Seq("real"),
      "null-ts change must lose without crashing the query")
    assert(out.filter(_.id == 2).map(_.name).contains("post-gc"),
      "after the TTL the tombstone must be gone from the state store")
  }

  test("stateful CDC runs unchanged on the RocksDB state store (the 100 TB state backend)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // At 100 TB the per-key CDC state does not fit executor heaps; Spark's
    // RocksDB provider spills it to native memory + local SSD with
    // changelog checkpointing. The fold's semantics must be
    // provider-agnostic — same latest-wins outcome as the HDFS-backed
    // default used by the other specs.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[DmsChange]
      val q = CdcStateful.latestStateStream(spark, input.toDS())
        .writeStream.format("memory").queryName("cdc_rocks_out")
        .outputMode("append")
        .option("checkpointLocation", tmpDir("rocks-ckpt"))
        .start()
      input.addData(
        DmsChange(1, "a", "m", "I", "2024-01-01T00:00:00"),
        DmsChange(2, "b", "m", "I", "2024-01-01T00:00:01"))
      drain(q)
      input.addData(
        DmsChange(1, "a2", "m", "U", "2024-01-02T00:00:00"),
        DmsChange(1, "stale", "m", "U", "2023-01-01T00:00:00"))
      drain(q)
      q.stop()
      val out = spark.table("cdc_rocks_out").as[CdcStateful.KeyUpdate].collect()
      assert(out.filter(_.id == 1).map(_.name).sorted.toSeq == Seq("a", "a2"),
        "latest-wins across batches; the stale change emits nothing")
      assert(out.count(_.id == 2) == 1)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stateful CDC fold (flatMapGroupsWithState) applies latest-wins across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DmsChange]
    val q = CdcStateful.latestStateStream(spark, input.toDS())
      .writeStream.format("memory").queryName("cdc_state_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("state-ckpt"))
      .start()

    // batch 1: insert two keys
    input.addData(
      DmsChange(1, "a", "2024-01-01T00:00:00", "I", "2024-01-01T00:00:00"),
      DmsChange(2, "b", "2024-01-01T00:00:01", "I", "2024-01-01T00:00:01"))
    drain(q)
    // batch 2: update key 1, delete key 2, late stale update for key 1 loses
    input.addData(
      DmsChange(1, "a2", "2024-01-02T00:00:00", "U", "2024-01-02T00:00:00"),
      DmsChange(2, "b", "2024-01-02T00:00:01", "D", "2024-01-02T00:00:01"))
    drain(q)
    // batch 3: stale change older than stored state -> no emission
    input.addData(
      DmsChange(1, "old", "2023-12-31T00:00:00", "U", "2023-12-31T00:00:00"))
    drain(q)
    q.stop()

    val out = spark.table("cdc_state_out").as[CdcStateful.KeyUpdate].collect()
    assert(out.count(_.id == 1) == 2, "key 1: insert + update, stale drop emits nothing")
    val last1 = out.filter(_.id == 1).maxBy(_.ts)
    assert(last1.name == "a2" && !last1.deleted)
    val last2 = out.filter(_.id == 2).maxBy(_.ts)
    assert(last2.deleted, "key 2 ends as tombstone")
  }

  test("streaming as-of enrichment == batch q99 (watermark-exact, out-of-order batches)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // replay the whole sf0.001 events table through MemoryStream in three
    // CHRONOLOGICAL thirds, each internally SHUFFLED: disorder inside a
    // batch (purchases before their matching click) is what the state
    // buffer must absorb, while cross-batch order respects the lateness
    // horizon — events jumping a whole batch back would be dropped by the
    // watermark in any engine, that's the watermark contract, not a bug
    val evRows = eventsTs
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(_._2.getTime)
    val maxTs = evRows.map(_._2.getTime).max
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Long, Double)]
    val q = graft.streaming.AsOfStream.enrich(spark,
        input.toDS().toDF("user_id", "ts", "event_type", "event_id", "value"))
      .writeStream.format("memory").queryName("asof_stream_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("asof-ckpt"))
      .start()
    val third = (evRows.length + 2) / 3
    val rndOrder = new scala.util.Random(7)
    evRows.grouped(third).foreach { slice =>
      input.addData(rndOrder.shuffle(slice.toSeq))
      drain(q)
    }
    // two future sentinel clicks for an unused user: the first advances
    // the watermark past every purchase, the second triggers the
    // event-time timeouts that flush still-pending purchases
    for (k <- 1 to 2) {
      input.addData(Seq((-1L,
        new java.sql.Timestamp(maxTs + k * 3 * 3600 * 1000L), "click", -k.toLong, 0.0)))
      drain(q)
    }
    q.stop()
    val got = spark.table("asof_stream_out")
      .select("event_id", "user_id", "ts_us", "click_ts_us", "click_value", "gap_us")
    val want = graft.operators.Queries.q99AsofCustom(spark, "/root/testdata/sf0.001")
    assert(canon(got).nonEmpty, "expected enriched purchases")
    assert(canon(got) == canon(want),
      s"streaming as-of must equal the batch as-of join: " +
        s"sizes ${canon(got).size}/${canon(want).size}")
  }

  test("streaming as-of survives crash-restart mid-stream: no lost or duplicated enrichments") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // same replay shape as the equality test, but the query is KILLED after
    // the first two thirds and restarted from its checkpoint — per-user
    // state (compacted clicks + pending purchases) must come back from the
    // state store, and the parquet sink's transaction log must keep the
    // output exactly-once across the restart (CdcStreamSpec's T4 pattern)
    val evRows = eventsTs
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(_._2.getTime)
    val maxTs = evRows.map(_._2.getTime).max
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Long, Double)]
    val ckpt = tmpDir("asof-restart-ckpt")
    val outPath = tmpDir("asof-restart-out")
    def start() = graft.streaming.AsOfStream.enrich(spark,
        input.toDS().toDF("user_id", "ts", "event_type", "event_id", "value"))
      .toDF()
      .writeStream.format("parquet").option("path", outPath)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    val third = (evRows.length + 2) / 3
    val slices = evRows.grouped(third).toSeq
    val rndOrder = new scala.util.Random(11)
    val q1 = start()
    slices.take(2).foreach { slice =>
      input.addData(rndOrder.shuffle(slice.toSeq))
      drain(q1)
    }
    q1.stop() // crash: offsets + state live only in the checkpoint
    val q2 = start()
    slices.drop(2).foreach { slice =>
      input.addData(rndOrder.shuffle(slice.toSeq))
      drain(q2)
    }
    for (k <- 1 to 2) {
      input.addData(Seq((-1L,
        new java.sql.Timestamp(maxTs + k * 3 * 3600 * 1000L), "click", -k.toLong, 0.0)))
      drain(q2)
    }
    q2.stop()
    val got = spark.read.parquet(outPath)
      .select("event_id", "user_id", "ts_us", "click_ts_us", "click_value", "gap_us")
    val want = graft.operators.Queries.q99AsofCustom(spark, "/root/testdata/sf0.001")
    assert(canon(got).nonEmpty, "expected enriched purchases across the restart")
    assert(got.count() == got.select("event_id").distinct().count(),
      "restart must not duplicate an enrichment")
    assert(canon(got) == canon(want),
      s"restarted streaming as-of must still equal the batch join: " +
        s"sizes ${canon(got).size}/${canon(want).size}")
  }

  test("streaming as-of lookback == batch tolerance; idle-user state drains") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evRows = eventsTs
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(_._2.getTime)
    val maxTs = evRows.map(_._2.getTime).max
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Long, Double)]
    val q = graft.streaming.AsOfStream.enrich(spark,
        input.toDS().toDF("user_id", "ts", "event_type", "event_id", "value"),
        lookback = Some("6 hours"))
      .writeStream.format("memory").queryName("asof_lookback_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("asof-lb-ckpt"))
      .start()
    val third = (evRows.length + 2) / 3
    val rndOrder = new scala.util.Random(13)
    evRows.grouped(third).foreach { slice =>
      input.addData(rndOrder.shuffle(slice.toSeq))
      drain(q)
    }
    // sentinels 12h/24h out: after the second, the watermark sits 23h past
    // the last real event — every real click's ts + 6h lookback horizon is
    // long expired, so ALL real users' state must have been evicted by the
    // event-time timeouts (the round-5 advice: without this, one compacted
    // click per user ever seen is retained forever)
    for (k <- 1 to 2) {
      input.addData(Seq((-1L,
        new java.sql.Timestamp(maxTs + k * 12 * 3600 * 1000L), "click", -k.toLong, 0.0)))
      drain(q)
    }
    val stateRows = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    q.stop()
    assert(stateRows <= 2,
      s"idle users' state must drain under a lookback horizon, found $stateRows rows")
    // semantics: identical to the batch custom exec with tolerance
    val ev = graft.operators.Queries.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts_us").as("click_ts_us"),
        col("value").as("click_value"))
    val want = graft.plans.AsOf.join(purchases, clicks,
        "user_id", "c_user_id", "ts_us", "click_ts_us",
        tolerance = Some(6L * 3600 * 1000000L))
      .withColumn("gap_us", col("ts_us") - col("click_ts_us"))
      .select("event_id", "user_id", "ts_us", "click_ts_us", "click_value", "gap_us")
    val got = spark.table("asof_lookback_out")
      .select("event_id", "user_id", "ts_us", "click_ts_us", "click_value", "gap_us")
    assert(canon(got).nonEmpty && canon(got) == canon(want),
      s"lookback streaming as-of must equal batch tolerance as-of: " +
        s"sizes ${canon(got).size}/${canon(want).size}")
  }
}
