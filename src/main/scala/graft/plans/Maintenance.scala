package graft.plans

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.sources.Tables.Warehouse

/** Table maintenance for the append-only changelog (SURVEY §7.5 "changelog
  * compaction"): streaming appends produce one small file per micro-batch;
  * at 100 TB that's millions of files whose listing/footer overhead
  * dominates scans. Compaction rewrites a table to a bounded file count.
  */
object Maintenance {

  /** Rewrite `table` into `targetFiles` files (atomically: stage + swap).
    * At scale this runs per partition on a schedule, bounded by a target
    * file size instead of a count; the stage-and-swap commit is the same.
    */
  def compact(spark: SparkSession, wh: Warehouse, table: String, targetFiles: Int): Unit = {
    val path = wh.tablePath(table)
    val staged = s"$path._compact"
    spark.read.parquet(path)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(staged)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(staged), dst)
  }

  /** Data files of a table (parquet parts, not markers). */
  def dataFiles(spark: SparkSession, wh: Warehouse, table: String): Seq[String] =
    graft.sources.Tables.listFilesExcluding(wh.tablePath(table), None)
      .filter(_.endsWith(".parquet"))
}
