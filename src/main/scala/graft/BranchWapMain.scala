package graft

import graft.sources.GraftCatalog

/** Cross-process write-audit-publish role for
  * `tools/verify_branch_wap.py`: this JVM stages a deterministic DML
  * sequence on a branch (INSERT, file-granular/sidecar DELETE, UPDATE —
  * the round-16 WAP surface) while the PYTHON driver independently
  * polls main's snapshot through DuckDB — main must serve exactly the
  * seed until the one `fast_forward` CAS publishes the audited head,
  * and then exactly the model. The cross-JVM analog of BranchSpec's
  * in-process assertions: no staged row may ever leak into main through
  * the pointer, the props sidecar, or the grandfather/retention sweeps
  * another process could run.
  *
  * STREAM mode (round 17): the staged commits are real
  * `writeStream.toTable` EPOCHS under the WAP conf — three AvailableNow
  * runs over a growing source dir share one checkpoint, each epoch
  * CASes the branch head while main stays pinned, and the one
  * fast_forward publishes all of them with their replay markers.
  *
  * Args: whDir [pauseMs] [dml|stream]
  */
object BranchWapMain {
  def main(args: Array[String]): Unit = {
    val whDir = args(0)
    val pauseMs = args.lift(1).map(_.toLong).getOrElse(400L)
    val mode = args.lift(2).getOrElse("dml")
    val spark = Harness.session("graft-branch-wap")
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.bw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bw.warehouse", whDir)
    spark.conf.set("spark.sql.catalog.bw.retain", "8")

    (0L until 1000L).map(i => (i, 1.0)).toDF("id", "v")
      .createOrReplaceTempView("seed_rows")
    spark.sql("CREATE TABLE bw.sink AS SELECT * FROM seed_rows")
    println("[wap] SEEDED")
    Console.flush()

    spark.sql("CALL bw.system.create_branch('sink', 'fix')").collect()
    spark.conf.set("spark.graft.wap.branch", "fix")
    try {
      if (mode == "stream") {
        val src = java.nio.file.Files
          .createTempDirectory("wap_stream_src").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("wap_stream_ckpt").toString
        (0 until 3).foreach { b =>
          (1000L + b * 300L until 1000L + (b + 1) * 300L)
            .map(i => (i, 2.0)).toDF("id", "v")
            .write.mode("append").parquet(src)
          val q = spark.readStream.schema("id BIGINT, v DOUBLE")
            .parquet(src)
            .writeStream.option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .toTable("bw.sink")
          q.awaitTermination()
          println(s"[wap] staged stream epoch $b committed")
          Console.flush()
          Thread.sleep(pauseMs) // window for the auditor to catch a leak
        }
      } else {
        (1000L until 2000L).map(i => (i, 2.0)).toDF("id", "v")
          .createOrReplaceTempView("staged_rows")
        spark.sql("INSERT INTO bw.sink SELECT * FROM staged_rows")
        println("[wap] staged insert committed"); Console.flush()
        Thread.sleep(pauseMs) // window for the auditor to catch a leak
        spark.sql("DELETE FROM bw.sink WHERE id >= 1000 AND id < 1100")
        println("[wap] staged delete committed"); Console.flush()
        Thread.sleep(pauseMs)
        spark.sql("UPDATE bw.sink SET v = -1.0 WHERE id >= 1100 AND id < 1200")
        println("[wap] staged update committed"); Console.flush()
        Thread.sleep(pauseMs)
      }
    } finally spark.conf.unset("spark.graft.wap.branch")
    // announce BEFORE the swap: the auditor must stop treating polls as
    // mid-audit once publication is even POSSIBLE — the pointer swap can
    // beat the stdout pipe, and a poll landing in that gap read the
    // (legitimate) published state as a "leak" (observed flake)
    println("[wap] PUBLISHED")
    Console.flush()
    spark.sql("CALL bw.system.fast_forward('sink', 'fix')").collect()
    println("[wap] PUBLISH_DONE")
    Console.flush()
    spark.stop()
  }
}
