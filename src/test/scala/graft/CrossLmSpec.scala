package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** q134 held-out LM semantics: reference-trained scoring separates
  * off-domain text, and the smoothed arithmetic matches an independent
  * in-memory model bigram-for-bigram.
  */
class CrossLmSpec extends SparkTestBase {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val d = tmpDir("crosslm-docs")
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q134 == in-memory add-one-smoothed reference model; off-domain text ranks lowest") {
    val ref1 = "the cat sat on the mat"
    val ref2 = "the dog sat on the rug"
    val inDomain = "the cat sat on the rug"   // src1 but reference-like
    val alien = "zz yy xx ww vv uu"           // vocabulary the model never saw
    val d = writeDocs(Seq(
      (1L, ref1, "src0"), (2L, ref2, "src0"),
      (3L, inDomain, "src1"), (4L, alien, "src1")))
    val out = TextAnalysis.q134CrossLm(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap

    // independent reference: train on src0 only, score all docs
    def bigrams(t: String) = t.split(" ").sliding(2).map(a => (a(0), a(1))).toSeq
    val refBi = Seq(ref1, ref2).flatMap(bigrams)
    val cb = refBi.groupBy(identity).view.mapValues(_.size).toMap
    val cw = refBi.groupBy(_._1).view.mapValues(_.size).toMap
    val v = refBi.map(_._1).distinct.size
    def score(t: String): (Long, Double) = {
      val bs = bigrams(t)
      val nanos = bs.map { b =>
        math.round(math.log(
          (cb.getOrElse(b, 0) + 1).toDouble / (cw.getOrElse(b._1, 0) + v)) * 1e9)
      }
      (bs.size.toLong,
        BigDecimal(nanos.sum.toDouble / bs.size / 1e9)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    Seq(1L -> ref1, 2L -> ref2, 3L -> inDomain, 4L -> alien).foreach {
      case (id, t) =>
        val (n, s) = score(t)
        assert(out(id)._1 == n, s"doc $id n_bigrams")
        assert(math.abs(out(id)._2 - s) < 1e-9,
          s"doc $id avg_logprob: engine ${out(id)._2} vs reference $s")
    }
    // the held-out property: unseen-vocabulary text scores strictly below
    // every reference-like doc, and the flag is consistent with the score
    assert(out(4L)._2 < Seq(1L, 2L, 3L).map(out(_)._2).min,
      s"alien doc must rank lowest: $out")
    out.values.foreach { case (_, s, flag) => assert(flag == (s < -3.5)) }
  }
}
