package graft

import org.apache.spark.sql.functions._

import graft.sources.{EqDeletes, GraftCatalog, Tables}
import graft.sources.Tables.Warehouse

/** Measured copy-on-write vs merge-on-read row-level UPDATE at scale
  * (SCALE.md evidence): the same 1%-of-rows correction on the same
  * N-row table, once through the group-based COW rewrite and once
  * through the delta write ([[graft.sources.MorDeltaOperation]]) —
  * wall time plus the byte/file census each commit actually wrote.
  *
  * Args: [rows] (default 2,000,000)
  */
object DeltaStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = Harness.session("graft-delta-stress")
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._

    def newVersionFootprint(wh: Warehouse, t: String,
        prev: Set[String]): (Long, Long) = {
      val snap = Paths.get(wh.snapshotPath(t))
      val w = Files.walk(snap)
      try {
        val fresh = w.iterator().asScala
          .filter(p => Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
          .filter { p =>
            // hard-linked carries share the inode with the previous
            // version; a genuinely written file does not
            !prev.contains(Files.getAttribute(p, "unix:ino").toString)
          }.toSeq
        (fresh.size.toLong, fresh.map(Files.size).sum)
      } finally w.close()
    }
    def inodes(wh: Warehouse, t: String): Set[String] = {
      val snap = Paths.get(wh.snapshotPath(t))
      val w = Files.walk(snap)
      try w.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(p => Files.getAttribute(p, "unix:ino").toString).toSet
      finally w.close()
    }

    def run(mor: Boolean): (Double, Long, Long) = {
      val root = Files.createTempDirectory(
        s"graft_dstress_${if (mor) "mor" else "cow"}").toString
      val wh = Warehouse(root, retain = 2)
      val cat = s"ds${if (mor) "m" else "c"}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      wh.overwrite(spark.range(n).select(col("id"),
        (col("id") % 97).cast("double").as("v"),
        concat(lit("payload-"), col("id")).as("s"))
        .repartition(16), "t")
      graft.plans.Maintenance.declareClustering(wh, "t", Seq("id"),
        bloomKeys = Seq("id"), targetFiles = Some(16))
      graft.plans.Maintenance.cluster(spark, wh, "t", Seq("id"), 16,
        bloomKeys = Seq("id"))
      if (mor) Tables.TableProps.write(wh, "t",
        Tables.TableProps.read(wh, "t") +
          (EqDeletes.ModeProp -> "merge-on-read") +
          (EqDeletes.KeyProp -> "id"))
      val before = inodes(wh, "t")
      val t0 = System.nanoTime()
      // the 1% correction: every id divisible by 100
      spark.sql(s"UPDATE $cat.t SET v = v + 1000.0 WHERE id % 100 = 0")
      val sec = (System.nanoTime() - t0) / 1e9
      val (files, bytes) = newVersionFootprint(wh, "t", before)
      // correctness spot check, then cleanup
      val got = spark.sql(
        s"SELECT count(*) FROM $cat.t WHERE v >= 1000.0").head.getLong(0)
      require(got == n / 100, s"expected ${n / 100} updated rows, got $got")
      Tables.deleteRecursively(Paths.get(root))
      (sec, files, bytes)
    }

    val (cowSec, cowFiles, cowBytes) = run(mor = false)
    val (morSec, morFiles, morBytes) = run(mor = true)
    println(s"""{"rows":$n,"updated":${n / 100},""" +
      s""""cow":{"sec":${f"$cowSec%.2f"},"files_written":$cowFiles,"bytes_written":$cowBytes},""" +
      s""""mor_delta":{"sec":${f"$morSec%.2f"},"files_written":$morFiles,"bytes_written":$morBytes}}""")
    spark.stop()
  }
}
