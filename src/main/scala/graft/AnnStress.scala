package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Beyond-bench-SF stress of the IVF ANN path on a synthesized clustered
  * corpus — the claims under test are SCALE.md's: (1) a probe scans
  * ~nprobe/K of the corpus, so IVF query cost stays a small constant
  * fraction of brute force as the corpus grows, and (2) multi-probe recall
  * against exact brute-force top-k stays high on clustered data (the
  * realistic embedding distribution — uniform random vectors are the
  * degenerate no-structure case where ANY space partitioning is useless).
  *
  * Corpus: `nVecs` 64-dim integer vectors in `nClusters` well-separated
  * hash-derived clusters (center spread 10x the per-vector noise).
  * Deterministic, generated distributed. Query = vector 0; ground truth =
  * exact cosine top-10 over everything; IVF trains k-means (seeds = first
  * `ivfK` vectors, 2 rounds — the q38/q82 configuration) and probes the
  * query's 2 nearest cells.
  *
  * Run: `sbt "runMain graft.AnnStress [nVecs]"` (default 100000). Prints
  * one JSON line with timings, probe fraction, and recall@10; requires
  * recall >= 0.9 and probe fraction <= 4/ivfK.
  */
object AnnStress {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(100000L)
    val nClusters = 64
    val ivfK = 16
    val spark = Harness.session("graft-ann-stress")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    import Harness.timed

    // center(c, d) in [-100, 100] scaled 10x; per-vector noise in [-10, 10]
    val vecs: DataFrame = spark.range(nVecs)
      .select(col("id").as("vec_id"), (col("id") % nClusters).as("c"))
      .withColumn("q", expr(
        s"""transform(sequence(0, 63), d -> CAST(
           |  (pmod(hash(c, d), 201) - 100) * 10 + pmod(hash(vec_id, d), 21) - 10
           |  AS BIGINT))""".stripMargin))
      .withColumn("nq", expr("long_dot(q, q)"))
      .select("vec_id", "q", "nq")
      .localCheckpoint(true)

    val query = vecs.filter(col("vec_id") === 0)
      .select(col("q").as("qq"), col("nq").as("qn"))

    // train: k-means seeds = first ivfK vectors, 2 update rounds (the
    // q38/q82 loop, inlined since the stress owns its own K), then the
    // INDEX BUILD: the corpus is STORED partitioned by cell id — the step
    // that turns "filter on cid" into files never read
    val base = java.nio.file.Files.createTempDirectory("graft-ann").toString
    val (centroids, tTrain) = timed {
      val seeds = vecs.filter(col("vec_id") < ivfK)
        .select(col("vec_id").as("cid"), col("q").as("csum"), col("nq").as("nc"))
      val c = Similarity.ivfCentroids(vecs, seeds).localCheckpoint(true)
      vecs.join(Similarity.assign(vecs, c), Seq("vec_id"))
        .write.partitionBy("cid").mode("overwrite").parquet(s"$base/index")
      c
    }
    val index = spark.read.parquet(s"$base/index")

    // exact ground truth + the full-scan cost, over the SAME stored index
    val (bruteTop, tBrute) = timed {
      index.filter(col("vec_id") =!= 0).join(broadcast(query))
        .withColumn("cos", Similarity.cosCol("long_dot(q, qq)", "nq", "qn"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10).select("vec_id").as[Long].collect().toSet
    }

    // probe: query's 2 nearest centroids; the cid IN (...) filter prunes
    // 14 of 16 partitions at the file level — the bytes never leave disk
    val ((ivfTop, probed), tProbe) = timed {
      val probeCids = query.crossJoin(broadcast(centroids))
        .withColumn("ccos", Similarity.cosCol("long_dot(qq, csum)", "qn", "nc"))
        .orderBy(col("ccos").desc, col("cid")).limit(2)
        .select("cid").as[Long].collect()
      val cell = index.filter(col("cid").isin(probeCids: _*) && col("vec_id") =!= 0)
      val top = cell.join(broadcast(query))
        .withColumn("cos", Similarity.cosCol("long_dot(q, qq)", "nq", "qn"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10).select("vec_id").as[Long].collect().toSet
      (top, cell.count())
    }

    val recall = (bruteTop & ivfTop).size / 10.0
    val probeFrac = probed.toDouble / nVecs
    require(recall >= 0.9, s"recall@10 $recall below 0.9")
    require(probeFrac <= 4.0 / ivfK,
      s"probe fraction $probeFrac exceeds the pruning envelope (4/$ivfK)")
    println(s"""{"harness":"ann-stress","n_vecs":$nVecs,"ivf_k":$ivfK,""" +
      s""""recall_at_10":$recall,"probe_fraction":${math.round(probeFrac * 10000) / 10000.0},""" +
      s""""sec_brute":${math.round(tBrute * 100) / 100.0},"sec_train":${math.round(tTrain * 100) / 100.0},""" +
      s""""sec_probe":${math.round(tProbe * 100) / 100.0}}""")
    spark.stop()
  }
}
