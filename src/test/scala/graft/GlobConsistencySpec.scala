package graft

import java.nio.file.{Files, Paths}
import scala.util.Random

import graft.sources.Tables
import graft.streaming.CdcStream

/** The driver-side listing (`Tables.listFilesExcluding`) and the streaming
  * scan predicate (`CdcStream.excludePredicate`) must exclude IDENTICAL
  * file sets for the reference's glob shapes — a disagreement means the
  * bootstrap and the stream see different data (the silent-empty-pipeline
  * failure class). Checked over randomized path forests.
  */
class GlobConsistencySpec extends SparkTestBase {
  import spark.implicits._

  private val globs = Seq("**/LOAD*", "**/*-*", "**/init/LOAD*", "**/dms_logs_?.parquet")

  private val segmentPool = Seq(
    "LOAD00000001.parquet", "LOAD1.parquet", "RELOADED.parquet",
    "dms_logs_1.parquet", "dms_logs_12.parquet", "part-00000-ab12.snappy.parquet",
    "data.parquet", "init", "nested", "2024-01-01.parquet", "plain")

  private def randomRelPaths(rnd: Random, n: Int): Seq[String] =
    (0 until n).map { _ =>
      val depth = 1 + rnd.nextInt(3)
      val segs = Seq.fill(depth - 1)(segmentPool(rnd.nextInt(segmentPool.size))) :+
        // leaf must look like a file the listing would keep (no extension filter here)
        segmentPool(rnd.nextInt(segmentPool.size))
      segs.mkString("/")
    }.distinct

  test("listing and stream predicate agree on exclusion for randomized path forests") {
    val rnd = new Random(2026)
    for (round <- 1 to 3; glob <- globs) {
      val root = tmpDir(s"glob-consistency-$round")
      val rels = randomRelPaths(rnd, 40)
      rels.foreach { rel =>
        val p = Paths.get(root, rel)
        try {
          Files.createDirectories(p.getParent)
          if (!Files.exists(p)) Files.createFile(p)
        } catch {
          // an earlier path claimed an ancestor as a FILE — skip this rel
          case _: java.nio.file.FileSystemException => ()
        }
      }
      // files only — a rel that became a parent DIRECTORY of another rel is
      // not a listable file and has no stream row either
      val fileRels = rels.filter(r => Files.isRegularFile(Paths.get(root, r)))
      val listed = Tables.listFilesExcluding(root, Some(glob))
        .map(p => Paths.get(root).relativize(Paths.get(p)).toString).toSet
      val keptByStream = fileRels.toDF("rel")
        .withColumn("_src_file",
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit(s"file://$root/"),
            org.apache.spark.sql.functions.col("rel")))
        .filter(!CdcStream.excludePredicate(glob, root))
        .select("rel").as[String].collect().toSet
      assert(listed == keptByStream,
        s"glob=$glob round=$round\nonly-listing=${listed.diff(keptByStream)}\n" +
          s"only-stream=${keptByStream.diff(listed)}")
    }
  }
}
