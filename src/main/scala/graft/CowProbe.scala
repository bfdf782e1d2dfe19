package graft

import org.apache.spark.sql.functions._

import graft.sources.GraftCatalog
import graft.sources.Tables.Warehouse

/** Dev probe: where does the group-based COW UPDATE's wall time go?
  * Times (a) the V2 row-level UPDATE (GroupCowScan -> ReplaceData ->
  * GraftCowBatchWrite), (b) a plain INSERT OVERWRITE computing the same
  * transformed rows (the engine's ordinary overwrite commit — the floor
  * for "rewrite the table"), and (c) a bare DataFrame write of the same
  * rows to scratch (Spark's own write floor). Args: [rows]
  */
object CowProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = Harness.session("graft-cow-probe")
    val root = java.nio.file.Files.createTempDirectory("graft_cowprobe").toString
    val wh = Warehouse(root, retain = 2)
    spark.conf.set("spark.sql.catalog.cp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cp.warehouse", root)
    def mk(): Unit = wh.overwrite(spark.range(n).select(col("id"),
      (col("id") % 97).cast("double").as("v"),
      concat(lit("payload-"), col("id")).as("s")).repartition(16), "t")
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    mk()
    time("v2 COW UPDATE (whole-table group)") {
      spark.sql("UPDATE cp.t SET v = v + 1000.0 WHERE id % 100 = 0")
    }
    mk()
    time("INSERT OVERWRITE same transform") {
      spark.sql("INSERT OVERWRITE cp.t SELECT id, " +
        "CASE WHEN id % 100 = 0 THEN v + 1000.0 ELSE v END AS v, s FROM cp.t")
    }
    time("bare df write same rows") {
      spark.read.parquet(wh.snapshotPath("t"))
        .withColumn("v", when(col("id") % 100 === 0, col("v") + 1000.0)
          .otherwise(col("v")))
        .write.mode("overwrite").parquet(s"$root/scratch")
    }
    graft.sources.Tables.deleteRecursively(java.nio.file.Paths.get(root))
    spark.stop()
  }
}
