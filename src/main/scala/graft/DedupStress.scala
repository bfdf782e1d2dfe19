package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Beyond-bench-SF stress of the capped-Jaccard dedup pipeline (q49's
  * kernel) on a synthesized corpus with CONTROLLED duplication — the claim
  * under test is the one SCALE.md makes: candidate-pair volume is bounded
  * by the true near-dup structure (clusters), never quadratic in corpus
  * size, because the hot-shingle cap drops undiscriminating postings
  * before pair generation.
  *
  * Corpus: `nDocs` documents of `docLen` tokens over a `vocab`-word
  * vocabulary; documents in the same cluster (`clusterSize` consecutive
  * ids) share a template token stream, and each non-canonical member
  * perturbs one token position — i.e. every cluster is a true
  * near-identical group, and cross-cluster Jaccard is low by construction.
  * All token choices are hash-derived from (template, position): fully
  * deterministic, generated distributed (no driver-side data).
  *
  * Run: `sbt "runMain graft.DedupStress [nDocs] [clusterSize]"`
  * (defaults 20000 / 4). Prints one JSON line with index/candidate/pair
  * counts and seconds; asserts the expected per-cluster pairs were found
  * and that candidates stayed within the bounded envelope.
  */
object DedupStress {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(20000L)
    val clusterSize = if (args.length > 1) args(1).toInt else 4
    require(nDocs % clusterSize == 0,
      s"nDocs ($nDocs) must be a multiple of clusterSize ($clusterSize): " +
        "a partial trailing cluster would break the expected-pair count")
    // past the kernel's hot-shingle cap every shared shingle is "hot": the
    // capped index drops them all and the all-hot recall path degenerates
    // to quadratic corpus pairing — a different regime than this harness
    // measures
    require(clusterSize <= Dedup.ShingleDocCap,
      s"clusterSize ($clusterSize) must be <= the kernel's hot-shingle cap " +
        s"(${Dedup.ShingleDocCap})")
    val docLen = 40
    val vocab = 5000
    val spark = Harness.session("graft-dedup-stress")
    graft.functions.GraftFunctions.register(spark)
    import Harness.timed

    // template token stream is hash((template, pos)); every member m != 0
    // overwrites the SAME middle position with a member-unique token, so
    // each perturbed doc loses the same 3 of its (docLen-2) word 3-grams:
    // every within-cluster pair has Jaccard exactly
    // (docLen-5)/(docLen-2+3) = 35/41 ~ 0.854 >= 0.8 INDEPENDENT of
    // clusterSize (perturbing position m would let two members' destroyed
    // shingle windows diverge and drop boundary pairs below threshold),
    // while cross-cluster overlap stays at the random-collision floor
    val perturbPos = docLen / 2
    val docs: DataFrame = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        (col("id") - pmod(col("id"), lit(clusterSize.toLong))).as("template"),
        pmod(col("id"), lit(clusterSize.toLong)).cast("int").as("member"))
      .withColumn("text", expr(
        s"""concat_ws(' ', transform(sequence(0, ${docLen - 1}), p ->
           |  CASE WHEN member != 0 AND p = $perturbPos
           |       THEN concat('u', doc_id)
           |       ELSE concat('w', pmod(hash(template, p), $vocab)) END))""".stripMargin))
      .select(col("doc_id"), col("text"))

    val (out, sec) = timed {
      val pairs = Dedup.cappedJaccardOf(docs).localCheckpoint(true)
      pairs.count() -> pairs
    }
    val (nPairs, pairs) = out

    // every within-cluster pair must be found: C(clusterSize, 2) per
    // cluster (each pair's Jaccard is exactly 35/41, above the 0.8 bar)
    val nClusters = nDocs / clusterSize
    val expectedPairs = nClusters * clusterSize * (clusterSize - 1) / 2
    val within = pairs.filter(
      (col("i") - pmod(col("i"), lit(clusterSize.toLong))) ===
      (col("j") - pmod(col("j"), lit(clusterSize.toLong)))).count()
    require(within == expectedPairs,
      s"expected $expectedPairs within-cluster pairs, found $within")
    // the bounded-candidates claim: found pairs stay within the true
    // near-dup structure (no quadratic cross-cluster explosion)
    require(nPairs <= expectedPairs * 2,
      s"pair volume $nPairs exploded past the cluster structure $expectedPairs")

    val shingleRows = Dedup.shinglesOf(docs).count()
    println(s"""{"harness":"dedup-stress","n_docs":$nDocs,"cluster_size":$clusterSize,""" +
      s""""shingle_rows":$shingleRows,"near_dup_pairs":$nPairs,""" +
      s""""expected_within":$expectedPairs,"sec":${math.round(sec * 100) / 100.0}}""")
    spark.stop()
  }
}
