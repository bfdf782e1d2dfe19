package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.{Maintenance, ZoneMap}
import graft.plans.ZoneMap.Bound
import graft.sources.Tables.Warehouse

/** The zone-map contract: (a) a pruned read is EXACTLY the full filtered
  * scan — on clustered data, on unclustered data, with nulls, with zero
  * survivors, and through the staleness fallback; (b) on clustered data
  * it actually prunes (the 100 TB point — file-level skipping before any
  * footer is opened); (c) Maintenance.cluster preserves content, commits
  * atomically through the version chain, and refuses the layouts whose
  * partitioning IS the upsert contract.
  */
class ZoneMapSpec extends SparkTestBase {
  import spark.implicits._

  private def li: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_shipdate")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("pruned read == full filtered scan, and a 2-D box prunes most files") {
    val wh = Warehouse(tmpDir("zm-exact"))
    wh.overwrite(li, "li")
    Maintenance.cluster(spark, wh, "li", Seq("l_partkey", "l_suppkey"),
      targetFiles = 16)
    val path = wh.snapshotPath("li")
    // sf0.001 domains: l_partkey 0-199, l_suppkey 0-9 — a ~10%-of-space box
    val bounds = Seq(Bound.between("l_partkey", 40L, 90L),
      Bound.between("l_suppkey", 2L, 5L))
    val pruned = ZoneMap.read(spark, path, bounds)
    val full = wh.read(spark, "li")
      .filter(col("l_partkey").between(40, 90) && col("l_suppkey").between(2, 5))
    assert(pruned.count() > 0, "test box must select something")
    assert(sortedRows(pruned) == sortedRows(full))
    val (kept, total) = ZoneMap.pruneStats(spark, path, bounds)
    assert(total >= 15, s"clustered rewrite should emit ~16 files, got $total")
    assert(kept <= total / 2,
      s"a narrow 2-D box on z-clustered data must prune most files " +
        s"($kept/$total survived)")
    // one-sided bounds are exact too
    val oneSided = Seq(Bound.atLeast("l_partkey", 190L))
    assert(sortedRows(ZoneMap.read(spark, path, oneSided)) ==
      sortedRows(wh.read(spark, "li").filter(col("l_partkey") >= 190)))
  }

  test("single-dim range clustering prunes on that dim; content is preserved exactly") {
    val wh = Warehouse(tmpDir("zm-1d"))
    wh.overwrite(li, "li")
    val before = sortedRows(wh.read(spark, "li"))
    val v0 = wh.currentVersion("li")
    Maintenance.cluster(spark, wh, "li", Seq("l_shipdate"), targetFiles = 12)
    assert(wh.currentVersion("li").get > v0.get, "cluster commits a new version")
    assert(sortedRows(wh.read(spark, "li")) == before,
      "clustering is a layout rewrite: content must be byte-for-byte the same rows")
    val path = wh.snapshotPath("li")
    // string dim: range sort handles any orderable type
    val bounds = Seq(Bound.between("l_shipdate", "1995-01-01", "1995-03-31"))
    assert(sortedRows(ZoneMap.read(spark, path, bounds)) ==
      sortedRows(wh.read(spark, "li")
        .filter(col("l_shipdate").between("1995-01-01", "1995-03-31"))))
    val (kept, total) = ZoneMap.pruneStats(spark, path, bounds)
    assert(kept < total, s"a quarter-year slice must prune something ($kept/$total)")
  }

  test("nulls: all-null stats never prune; null rows never satisfy an interval") {
    val dir = tmpDir("zm-null") + "/t"
    val df = (1 to 100).map(i => (i.toLong, if (i % 3 == 0) null else s"k$i"))
      .toDF("id", "name")
      .withColumn("v", when(col("id") <= 50, col("id")).otherwise(lit(null)))
    // two files: one carries only null v (stats null -> must survive)
    df.repartitionByRange(2, col("id")).write.parquet(dir)
    ZoneMap.buildAndSave(spark, dir, Seq("v"))
    val bounds = Seq(Bound.between("v", 10L, 20L))
    val got = ZoneMap.read(spark, dir, bounds)
    val want = spark.read.parquet(dir).filter(col("v").between(10, 20))
    assert(sortedRows(got) == sortedRows(want))
    assert(got.count() == 11)
  }

  test("zero survivors returns an empty frame with the table schema") {
    val wh = Warehouse(tmpDir("zm-empty"))
    wh.overwrite(li, "li")
    Maintenance.cluster(spark, wh, "li", Seq("l_partkey"), targetFiles = 4)
    val path = wh.snapshotPath("li")
    val got = ZoneMap.read(spark, path,
      Seq(Bound.atLeast("l_partkey", 999999999L)))
    assert(got.count() == 0)
    assert(got.columns.toSeq == li.columns.toSeq)
  }

  test("a stale manifest falls back to the full scan — extra rows are never lost") {
    val dir = tmpDir("zm-stale") + "/t"
    (1 to 100).map(i => (i.toLong, i * 2L)).toDF("id", "v")
      .repartitionByRange(4, col("id")).write.parquet(dir)
    ZoneMap.buildAndSave(spark, dir, Seq("id"))
    // a writer that bypassed maintenance appends a file the manifest
    // doesn't know about — with rows INSIDE the pruned-away range
    Seq((1000L, 7L)).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(dir)
    val got = ZoneMap.read(spark, dir, Seq(Bound.atLeast("id", 900L)))
    assert(got.count() == 1, "the unmanifested file's row must be found")
    // rebuild restores pruning
    ZoneMap.buildAndSave(spark, dir, Seq("id"))
    val (kept, total) = ZoneMap.pruneStats(spark, dir, Seq(Bound.atLeast("id", 900L)))
    assert(kept == 1 && total == 5)
  }

  test("bloom point-lookup == plain isin filter, prunes to ~|keys| files, falls back when missing") {
    val wh = Warehouse(tmpDir("zm-bloom"))
    val ords = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderdate", "o_totalprice")
    wh.overwrite(ords, "ord")
    // clustered by DATE; the bloom serves the key the layout does NOT order
    Maintenance.cluster(spark, wh, "ord", Seq("o_orderdate"), targetFiles = 16,
      bloomKeys = Seq("o_orderkey"))
    val path = wh.snapshotPath("ord")
    val keys: Seq[Any] = Seq(7L, 1313L, 4033L)
    val got = ZoneMap.lookupRead(spark, path, "o_orderkey", keys)
    val want = wh.read(spark, "ord").filter(col("o_orderkey").isin(keys: _*))
    assert(want.count() > 0, "test keys must exist in sf0.001 orders")
    assert(sortedRows(got) == sortedRows(want))
    // pruning: a date-clustered layout scatters keys, yet the lookup must
    // open at most ~|keys| files (+ bloom false positives, ~1%)
    val opened = got.select(input_file_name()).distinct().count()
    assert(opened <= keys.size,
      s"3-key lookup opened $opened files of 16 — bloom pruning not engaged")
    // a manifest without this bloom column: loud-but-correct fallback
    val wh2 = Warehouse(tmpDir("zm-bloomless"))
    wh2.overwrite(ords, "ord")
    Maintenance.cluster(spark, wh2, "ord", Seq("o_orderdate"), targetFiles = 8)
    val got2 = ZoneMap.lookupRead(spark, wh2.snapshotPath("ord"), "o_orderkey", keys)
    assert(sortedRows(got2) == sortedRows(want))
  }

  test("review edges: empty-table cluster no-ops; an uncastable lookup key matches nothing") {
    val wh = Warehouse(tmpDir("zm-edge"))
    wh.overwrite(li.filter(lit(false)), "empty")
    val v0 = wh.currentVersion("empty")
    Maintenance.cluster(spark, wh, "empty", Seq("l_partkey"), targetFiles = 4)
    assert(wh.currentVersion("empty") == v0,
      "clustering an empty table must be a no-op, not a crash or an empty commit")
    // an uncastable key: under ANSI (Spark 4 default) the PLAIN isin
    // filter throws CAST_INVALID_INPUT at the scan — the lookup path
    // must be exactly as loud, at planning, not quietly wrong. (With
    // ANSI off the cast yields null; the probe's coalesce keeps a null
    // from poisoning the planning OR — defense pinned by code review.)
    val wh2 = Warehouse(tmpDir("zm-edge2"))
    wh2.overwrite(spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderdate"), "ord")
    Maintenance.cluster(spark, wh2, "ord", Seq("o_orderdate"), targetFiles = 4,
      bloomKeys = Seq("o_orderkey"))
    val mixed: Seq[Any] = Seq("not-a-number", 1313L)
    val e1 = intercept[Exception] {
      wh2.read(spark, "ord").filter(col("o_orderkey").isin(mixed: _*)).collect()
    }
    val e2 = intercept[Exception] {
      ZoneMap.lookupRead(spark, wh2.snapshotPath("ord"), "o_orderkey", mixed)
        .collect()
    }
    assert(e1.getMessage.contains("CAST_INVALID_INPUT") &&
      e2.getMessage.contains("CAST_INVALID_INPUT"),
      s"both paths must fail the ANSI cast identically: $e1 / $e2")
    // well-typed keys keep working on the same table
    assert(ZoneMap.lookupRead(spark, wh2.snapshotPath("ord"), "o_orderkey",
      Seq(1313L)).count() ==
      wh2.read(spark, "ord").filter(col("o_orderkey") === 1313L).count())
  }

  test("cluster refuses MOR and key-bucketed layouts (their partitioning is the upsert contract)") {
    val cfg = CdcConfig(keyCol = "id", tsCol = "ts")
    val seed = Seq((1L, 1L, "a", "U")).toDF("id", "ts", "x", "op")
    val whM = Warehouse(tmpDir("zm-mor"))
    graft.plans.MorMirror.initialize(whM, "m",
      graft.operators.Cdc.fold(seed, cfg), cfg, nBuckets = 4)
    intercept[UnsupportedOperationException] {
      Maintenance.cluster(spark, whM, "m", Seq("ts"), 4)
    }
    val whB = Warehouse(tmpDir("zm-bucketed"))
    graft.plans.PartitionedMirror.initialize(whB, "b",
      graft.operators.Cdc.fold(seed, cfg), cfg, nBuckets = 4)
    intercept[UnsupportedOperationException] {
      Maintenance.cluster(spark, whB, "b", Seq("ts"), 4)
    }
  }

  test("countFast: manifest-credited counts are exact — wide, narrow, nulls, fallback") {
    val wh = Warehouse(tmpDir("zm-cf"))
    wh.overwrite(li, "li")
    Maintenance.cluster(spark, wh, "li", Seq("l_partkey", "l_suppkey"),
      targetFiles = 16)
    val path = wh.snapshotPath("li")
    def fullCnt(b: Seq[Bound]): Long =
      wh.read(spark, "li").filter(b.map(_.rowPredicate).reduce(_ && _)).count()
    // wide box: every file fully contained -> the count IS the manifest sum
    val wide = Seq(Bound.between("l_partkey", 0L, 999999L))
    assert(ZoneMap.countFast(spark, path, wide) == fullCnt(wide))
    // narrow 2-D box: mixed contained/partial files
    val narrow = Seq(Bound.between("l_partkey", 40L, 90L),
      Bound.between("l_suppkey", 2L, 5L))
    assert(ZoneMap.countFast(spark, path, narrow) == fullCnt(narrow))
    // nulls in the bound column: containment may never credit null rows
    val dir = tmpDir("zm-cf-null") + "/t"
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, if (i % 4 == 0) null
      else java.lang.Long.valueOf(i.toLong))).toDF("id", "v")
      .repartitionByRange(2, col("id")).write.parquet(dir)
    ZoneMap.buildAndSave(spark, dir, Seq("v"))
    val nb = Seq(Bound.between("v", 1L, 100L)) // contains every NON-null v
    assert(ZoneMap.countFast(spark, dir, nb) == 75,
      "null rows satisfy no interval and must not be credited from the manifest")
    // a pre-null-census manifest (no nulls_ columns): loud-safe fallback
    val stripped = ZoneMap.manifest(spark, dir).drop("nulls_v").cache()
    stripped.count()
    stripped.write.mode("overwrite").parquet(s"$dir/${ZoneMap.ManifestDir}")
    assert(ZoneMap.countFast(spark, dir, nb) == 75)
  }

  test("declared clustering: the maintenance role clusters when stale, skips when fresh") {
    val wh = Warehouse(tmpDir("zm-maint"))
    wh.overwrite(li, "li")
    Maintenance.declareClustering(wh, "li", Seq("l_partkey", "l_suppkey"),
      bloomKeys = Seq("l_orderkey"))
    // tick 1: no manifest yet -> clusters and builds it
    assert(MaintenanceMain.run(spark, wh, Seq("li"), targetFiles = 8,
      tombstoneHorizon = None, orphanAgeMs = Long.MaxValue).isEmpty)
    val v1 = wh.currentVersion("li")
    assert(ZoneMap.isFresh(spark, wh.snapshotPath("li")), "tick 1 built the manifest")
    // the declared bloom key works through the maintained manifest
    val k = li.select("l_orderkey").head.getLong(0)
    assert(ZoneMap.lookupRead(spark, wh.snapshotPath("li"), "l_orderkey", Seq(k))
      .count() == li.filter(col("l_orderkey") === k).count())
    // tick 2: fresh manifest -> NO rewrite (version unchanged)
    assert(MaintenanceMain.run(spark, wh, Seq("li"), targetFiles = 8,
      tombstoneHorizon = None, orphanAgeMs = Long.MaxValue).isEmpty)
    assert(wh.currentVersion("li") == v1,
      "a fresh manifest must skip the (full-table) re-cluster")
    // a new commit stales the census -> tick 3 re-clusters
    wh.overwrite(li.limit(500), "li")
    assert(MaintenanceMain.run(spark, wh, Seq("li"), targetFiles = 8,
      tombstoneHorizon = None, orphanAgeMs = Long.MaxValue).isEmpty)
    assert(wh.currentVersion("li").get > v1.get, "stale census must re-cluster")
    assert(ZoneMap.isFresh(spark, wh.snapshotPath("li")))
    assert(wh.read(spark, "li").count() == 500, "content follows the latest commit")
  }

  test("property fuzz: pruning never loses rows across random data, layouts and bounds") {
    val rng = new scala.util.Random(11)
    (1 to 6).foreach { trial =>
      val n = 200 + rng.nextInt(1800)
      val rows = (1 to n).map { i =>
        (if (rng.nextInt(10) == 0) null else java.lang.Long.valueOf(rng.nextInt(1000).toLong),
          rng.nextDouble() * 100 - 50,
          if (rng.nextInt(12) == 0) null else f"s${rng.nextInt(500)}%04d")
      }
      val df = rows.toDF("a", "b", "c")
      val dir = tmpDir(s"zm-fuzz$trial") + "/t"
      val parts = 1 + rng.nextInt(7)
      (rng.nextInt(3) match {
        case 0 => df.repartitionByRange(parts, col("a"))
        case 1 => df.repartitionByRange(parts, col("c"))
        case _ => df.repartition(parts)
      }).write.parquet(dir)
      ZoneMap.buildAndSave(spark, dir, Seq("a", "b", "c"))
      (1 to 4).foreach { _ =>
        def side[T](v: => T): Option[Any] =
          if (rng.nextBoolean()) Some(v) else None
        val candidates = Seq[(String, Option[Any], Option[Any])](
          ("a", side(rng.nextInt(1000).toLong), side(rng.nextInt(1000).toLong)),
          ("b", side(rng.nextDouble() * 100 - 50), side(rng.nextDouble() * 100 - 50)),
          ("c", side(f"s${rng.nextInt(500)}%04d"), side(f"s${rng.nextInt(500)}%04d")))
          .filter(t => t._2.isDefined || t._3.isDefined)
          .map(t => Bound(t._1, t._2, t._3))
        if (candidates.nonEmpty) {
          val bounds = rng.shuffle(candidates).take(1 + rng.nextInt(candidates.size))
          val pred = bounds.map(_.rowPredicate).reduce(_ && _)
          val want = spark.read.parquet(dir).filter(pred)
          assert(sortedRows(ZoneMap.read(spark, dir, bounds)) == sortedRows(want),
            s"trial $trial diverged on bounds $bounds")
          assert(ZoneMap.countFast(spark, dir, bounds) == want.count(),
            s"trial $trial countFast diverged on bounds $bounds")
        }
      }
    }
  }

  test("declaration parsing survives junk props (empty dims, bad ints, stray spaces)") {
    import graft.sources.Tables.TableProps
    val wh = Warehouse(tmpDir("zm-props"))
    wh.overwrite(li.limit(5), "t")
    // junk written by hand (disk is disk): empty dims -> no declaration
    TableProps.write(wh, "t", Map(
      Maintenance.ClusterDimsProp -> " , ,",
      Maintenance.ClusterFilesProp -> "not-a-number"))
    assert(Maintenance.declaredClustering(wh, "t").isEmpty)
    // spaces trimmed, bad file budget dropped rather than crashing the tick
    TableProps.write(wh, "t", Map(
      Maintenance.ClusterDimsProp -> " a , b ",
      Maintenance.ClusterBloomProp -> " k ",
      Maintenance.ClusterFilesProp -> "12x"))
    assert(Maintenance.declaredClustering(wh, "t")
      .contains((Seq("a", "b"), Seq("k"), None)))
    // the declare API round-trips, including the optional budget
    Maintenance.declareClustering(wh, "t", Seq("x"), Seq("id"), Some(24))
    assert(Maintenance.declaredClustering(wh, "t")
      .contains((Seq("x"), Seq("id"), Some(24))))
    // re-declaring WITHOUT blooms clears the stale bloom prop
    Maintenance.declareClustering(wh, "t", Seq("x"))
    assert(Maintenance.declaredClustering(wh, "t")
      .contains((Seq("x"), Seq.empty[String], Some(24))))
  }

  test("cluster writes parquet NATIVE footer blooms on the key columns; past the manifest ceiling lookups stay exact on them") {
    import scala.jdk.CollectionConverters._
    val wh = Warehouse(tmpDir("zm-footer-bloom"))
    // high-cardinality keys (~200k distinct per output file): the parquet
    // writer only MATERIALIZES a bloom once the column's dictionary page
    // overflows (a fully-dict-encoded row group is exactly filterable from
    // the dictionary itself, so a bloom would be redundant bytes) — this
    // is the 100 TB file shape the footer-bloom tier exists for; tiny
    // all-dict files are already covered by parquet dictionary filtering
    val big = spark.range(400000).select(col("id"),
      pmod(hash(col("id")), lit(1000)).cast("long").as("x"))
    wh.overwrite(big.repartition(4), "t")
    // targetFiles ABOVE the (test-sized) ceiling: manifest min/max-only
    Maintenance.cluster(spark, wh, "t", Seq("x"), targetFiles = 2,
      bloomKeys = Seq("id"), manifestBloomMaxFiles = 1)
    val path = wh.snapshotPath("t")
    val mCols = ZoneMap.manifest(spark, path).columns.toSeq
    assert(!mCols.exists(_.startsWith("bloom_")),
      s"above the ceiling the manifest must stay min/max-only: $mCols")
    assert(mCols.contains("min_x"), "stats columns must remain")
    // the membership bits moved into the parquet footers: assert with the
    // parquet-mr reader that the key column has a bloom and others do not
    val conf = spark.sparkContext.hadoopConfiguration
    val dataFile = Files.list(Paths.get(path)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq.head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(dataFile), conf))
    try {
      val block = reader.getRowGroups.get(0)
      val bfr = reader.getBloomFilterDataReader(block)
      def bloomOf(c: String) = block.getColumns.asScala
        .find(_.getPath.toDotString == c).map(bfr.readBloomFilter).orNull
      assert(bloomOf("id") != null,
        "the declared bloom key must carry a native footer bloom")
      assert(bloomOf("x") == null,
        "non-key columns must not pay footer-bloom bytes")
    } finally reader.close()
    // lookupRead above the ceiling: manifest-miss fallback, exact rows —
    // the filtered scan the footer blooms row-group-prune
    val keys: Seq[Any] = Seq(1L, 963L, 399999L, 999999999L)
    val viaLookup = sortedRows(ZoneMap.lookupRead(spark, path, "id", keys))
    val viaScan = sortedRows(
      wh.read(spark, "t").filter(col("id").isin(keys: _*)))
    assert(viaLookup == viaScan && viaLookup.size == 3)
    // BELOW the ceiling the manifest keeps its planning-time bitsets
    Maintenance.cluster(spark, wh, "t", Seq("x"), targetFiles = 2,
      bloomKeys = Seq("id"), manifestBloomMaxFiles = 2)
    assert(ZoneMap.manifest(spark, wh.snapshotPath("t")).columns
      .contains("bloom_id"))
  }

  test("cluster carries root marker files through the rewrite (replay cursors survive)") {
    val wh = Warehouse(tmpDir("zm-markers"))
    wh.overwrite((1 to 10).map(i => (i.toLong, i.toString)).toDF("id", "s"), "t")
    val marker = Paths.get(wh.snapshotPath("t"), "_ivm_batch_id")
    Files.write(marker, "7".getBytes)
    Maintenance.cluster(spark, wh, "t", Seq("id"), targetFiles = 2)
    val carried = Paths.get(wh.snapshotPath("t"), "_ivm_batch_id")
    assert(Files.exists(carried) && new String(Files.readAllBytes(carried)) == "7",
      "the rewrite must carry replay-cursor markers exactly like compact does")
  }

  test("keyedSurvivors never schema-infers the data path: manifest stats derive the key type, a statless probe without a hint refuses") {
    import spark.implicits._
    val wh = Warehouse(tmpDir("zm-keytype"))
    wh.overwrite((1L to 1000L).map(i => (i, i * 2)).toDF("id", "w")
      .repartition(4).localCheckpoint(true), "t")
    Maintenance.cluster(spark, wh, "t", Seq("id"), targetFiles = 4)
    val path = wh.snapshotPath("t")
    // hintless probe on a statted column: the manifest's own min_ column
    // provides the type (no spark.read over the data path)
    val s1 = ZoneMap.keyedSurvivors(spark, path, "id", Seq(5L))
    assert(s1.isDefined && s1.get.size == 1)
    // an UNSTATTED column short-circuits to None (no narrowing) before
    // any type derivation — never a guess, never a data-path read
    assert(ZoneMap.keyedSurvivors(spark, path, "w", Seq(10L)).isEmpty)
  }
}
