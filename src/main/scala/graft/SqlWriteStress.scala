package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables.Warehouse

/** Measures the SQL write path's scale behavior beyond bench SF: the
  * hard-link fast append ([[graft.sources.Tables.Warehouse.appendVersioned]],
  * the INSERT INTO path) must cost O(new data) — NOT O(table) — or SQL
  * appends to a 100 TB table are a rewrite per statement. Prints the
  * measured append/rewrite ratio and the link census, plus the COW
  * DELETE cost (which IS O(table) by design — the documented trade
  * against the MOR mirror's delta path).
  *
  * Run: SPARK_GRAFT_ROWS=20000000 sbt "runMain graft.SqlWriteStress"
  */
object SqlWriteStress {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "20000000").toLong
    val appendRows = math.max(1L, rows / 1000L) // 0.1%
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_sqlw_stress")
    val wh = Warehouse(root.toString, retain = 3)
    def mk(n: Long, offset: Long) = spark.range(n)
      .select((col("id") + offset).as("id"),
        pmod(col("id") * 2654435761L, lit(1000)).as("grp"),
        (col("id") % 97).cast("double").as("v"))
    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    try {
      val (_, tBase) = time(wh.overwrite(mk(rows, 0), "t"))
      println(f"[sqlwrite-stress] base build: $rows rows in $tBase%.1f s")

      // the INSERT INTO path: 0.1% append
      val (_, tAppend) = time(
        wh.retryingConflicts() {
          wh.appendVersioned(mk(appendRows, rows), "t")
        })
      // the naive alternative: full rewrite with the rows unioned
      val (_, tRewrite) = time(
        wh.overwrite(wh.read(spark, "t"), "t"))
      val total = wh.read(spark, "t").count()
      assert(total == rows + appendRows, s"row loss: $total")

      // link census of the appended version: carried files must be
      // hard links (nlink > 1), fresh files single-linked
      val vDirs = wh.listVersions("t")
      val appendDir = java.nio.file.Paths.get(s"${root.toString}/t.v${vDirs(vDirs.length - 2)}")
      var linked = 0L; var fresh = 0L
      val s = java.nio.file.Files.list(appendDir)
      try s.iterator().forEachRemaining { f =>
        if (f.getFileName.toString.endsWith(".parquet")) {
          val n = java.nio.file.Files.getAttribute(f, "unix:nlink")
            .asInstanceOf[Integer].intValue()
          if (n > 1) linked += 1 else fresh += 1
        }
      } finally s.close()

      println(f"[sqlwrite-stress] rows=$rows append=$appendRows (0.1%%) | " +
        f"fast append $tAppend%.2f s vs full rewrite $tRewrite%.2f s " +
        f"(${tRewrite / tAppend}%.1fx) | carried(linked)=$linked fresh=$fresh")

      // COW DELETE of one grp (~0.1% of rows): O(table) by design
      val (_, tDelete) = time {
        wh.retryingConflicts() {
          val expected = wh.currentVersion("t")
          val survivors = wh.read(spark, "t").filter(col("grp") =!= 0)
          wh.commit("t", expectCurrent = expected)(p =>
            survivors.write.mode("overwrite").parquet(p))
        }
      }
      println(f"[sqlwrite-stress] COW delete of grp=0: $tDelete%.2f s " +
        "(O(table) rewrite by design; row-granular churn belongs on the MOR mirror)")

      // file-granular row-level groups: the same single-group UPDATE on a
      // CLUSTERED table must rewrite ~1/64th and hard-link the rest,
      // vs the whole-table rewrite on the unclustered twin
      spark.conf.set("spark.sql.catalog.gstress",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.gstress.warehouse", root.toString)
      wh.overwrite(mk(rows, 0), "tw") // unclustered twin (whole-table groups)
      wh.overwrite(mk(rows, 0), "tc")
      graft.plans.Maintenance.cluster(spark, wh, "tc", Seq("grp"), 64)
      val (_, tWhole) = time(
        spark.sql("UPDATE gstress.tw SET v = -1.0 WHERE grp = 7"))
      val (_, tGrouped) = time(
        spark.sql("UPDATE gstress.tc SET v = -1.0 WHERE grp = 7"))
      val curC = wh.currentVersion("tc").get
      var linkedC = 0
      val sc = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"${root.toString}/tc.v$curC"))
      try sc.iterator().forEachRemaining { f =>
        if (f.getFileName.toString.endsWith(".parquet") &&
            java.nio.file.Files.getAttribute(f, "unix:nlink")
              .asInstanceOf[Integer].intValue() > 1) linkedC += 1
      } finally sc.close()
      val nUpd = spark.sql("SELECT count(*) FROM gstress.tc WHERE v = -1.0")
        .head.getLong(0)
      println(f"[sqlwrite-stress] single-group UPDATE at $rows rows: " +
        f"whole-table ${tWhole}%.2f s vs file-granular ${tGrouped}%.2f s " +
        f"(${tWhole / tGrouped}%.1fx) | carried(linked)=$linkedC rowsUpdated=$nUpd")

      // MERGE with RUNTIME group filtering: the matched keys probe the
      // per-file id blooms at execution time; only their neighborhood
      // rewrites. Same 16-key merge against the unclustered twin is the
      // whole-table rewrite.
      // bloom sizing is a real constraint, stated not hidden: the default
      // 1M-bit manifest bitsets saturate past ~100k keys/file (every probe
      // passes, narrowing degrades to whole-table - correct, unhelped).
      // 256 files here = 78k keys/file = 13 bits/key, the regime the
      // two-tier design targets for manifest bitsets.
      wh.overwrite(mk(rows, 0).withColumnRenamed("grp", "g"), "mw")
      wh.overwrite(mk(rows, 0).withColumnRenamed("grp", "g"), "mc")
      graft.plans.Maintenance.cluster(spark, wh, "mc", Seq("id"), 256,
        bloomKeys = Seq("id"))
      spark.range(16).select((col("id") * 997L).as("id"),
        lit(-5.0).as("v")).createOrReplaceTempView("merge_src")
      def mergeSql(t: String) =
        s"""MERGE INTO gstress.$t t USING merge_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin
      val (_, tMergeWhole) = time(spark.sql(mergeSql("mw")))
      val (_, tMergeGrouped) = time(spark.sql(mergeSql("mc")))
      val curM = wh.currentVersion("mc").get
      var linkedM = 0; var freshM = 0
      val sm = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"${root.toString}/mc.v$curM"))
      try sm.iterator().forEachRemaining { f =>
        if (f.getFileName.toString.endsWith(".parquet")) {
          if (java.nio.file.Files.getAttribute(f, "unix:nlink")
              .asInstanceOf[Integer].intValue() > 1) linkedM += 1
          else freshM += 1
        }
      } finally sm.close()
      val nMerged = spark.sql("SELECT count(*) FROM gstress.mc WHERE v = -5.0")
        .head.getLong(0)
      println(f"[sqlwrite-stress] 16-key MERGE at $rows rows: " +
        f"whole-table ${tMergeWhole}%.2f s vs runtime-bloom-grouped " +
        f"${tMergeGrouped}%.2f s (${tMergeWhole / tMergeGrouped}%.1fx) | " +
        f"carried(linked)=$linkedM rewritten=$freshM rowsMerged=$nMerged")
    } finally {
      graft.sources.Tables.deleteRecursively(root)
      spark.stop()
    }
  }
}
