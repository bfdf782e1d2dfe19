package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Beyond-bench-SF stress of the DSIR importance-selection kernel (q95's
  * [[Curation.dsirScoresOf]]) — the claim under test is the one SCALE.md
  * makes: the log-ratio model is a FIXED 1024-row table regardless of
  * corpus size (so the scoring join always broadcasts), and everything
  * corpus-sized is a linear pass.
  *
  * Corpus: `nDocs` documents of `docLen` tokens, hash-derived from
  * (doc_id, position) — fully deterministic, generated distributed (no
  * driver-side data). Every 5th doc is labeled `en` and draws tokens from
  * a 30-token TARGET vocabulary; the rest are labeled `de` and draw from
  * a disjoint 30-token background vocabulary — EXCEPT every 1000th doc
  * (the "planted" set), which is labeled `de` but written in the target
  * vocabulary. DSIR scores content, not labels, so the assertion is that
  * every planted doc outscores every background doc: the min planted
  * weight must exceed the max background weight.
  *
  * Vocabulary width matters and is chosen to match real text, not to
  * flatter the operator — hashed features carry signal only while the
  * corpus's distinct-bigram count does not drown the 1024 buckets (real
  * token distributions are Zipfian: the EFFECTIVE bigram vocabulary is
  * small; the testdata's is 31 tokens). A uniform 500-token-per-side draw
  * was tried first and correctly produced NO separation — every bucket
  * blends ~250 bigrams from each side, the known failure mode DSIR's
  * authors handle by sizing the feature space to the corpus. That regime
  * is the knob ([[Curation.DsirBuckets]]), not a plan defect.
  *
  * Run: `sbt "runMain graft.CurationStress [nDocs]"` (default 1,000,000).
  * Prints one JSON line with corpus size, the planted/background weight
  * margin, and wall seconds for the full score pass.
  */
object CurationStress {

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("novelty") =>
      noveltyStress(args.drop(1).headOption.map(_.toLong).getOrElse(1000000L))
    case Some("semdedup") =>
      semdedupSweep(args.drop(1).headOption.map(_.toLong).getOrElse(50000L))
    case _ => dsirStress(args.headOption.map(_.toLong).getOrElse(1000000L))
  }

  /** q97 τ-sweep (round-5 verdict #7): the bench τ=0.3 sits inside the
    * synthetic similarity range by design, so the operator's SENSITIVITY —
    * how the removal rate responds to the knob — was asserted, not
    * measured. This sweeps τ over a clustered corpus whose similarity
    * structure is controlled (centers ~10x the per-vector noise in
    * coordinate scale, noise wide enough that intra-cluster cosine spreads
    * over ~[0.5, 0.95] instead of pinning at 1), printing the removal-rate
    * curve, and pins the exact endpoints: at τ = -1 every pair qualifies,
    * so exactly n - (distinct buckets) vectors are removed (each bucket
    * keeps its canonical min id); past cos's upper bound nothing is. In
    * between the rate must be monotone non-increasing in τ.
    */
  private def semdedupSweep(nVecs: Long): Unit = {
    val nClusters = 64
    val spark = Harness.session("graft-semdedup-sweep")
    graft.functions.GraftFunctions.register(spark)
    import Harness.timed
    import graft.operators.Similarity
    val vecs = spark.range(nVecs)
      .select(col("id").as("vec_id"), (col("id") % nClusters).as("c"))
      .withColumn("q", expr(
        """transform(sequence(0, 63), d -> CAST(
          |  (pmod(hash(c, d), 201) - 100) * 10 + pmod(hash(vec_id, d), 1001) - 500
          |  AS BIGINT))""".stripMargin))
      .withColumn("nq", expr("long_dot(q, q)"))
      .select("vec_id", "q", "nq")
      .localCheckpoint(true)
    val p = Similarity.planesFor(nVecs)
    val e = vecs.join(
      Similarity.lshBucketsFor(spark, vecs, p).select("vec_id", "bucket"),
      Seq("vec_id")).localCheckpoint(true)
    val nBuckets = e.select("bucket").distinct().count()
    val taus = Seq(-1.0, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99, 1.000001)
    val removed = taus.map { tau =>
      val (n, sec) = timed(Similarity.semdedupRemoved(e, tau).count())
      println(s"""{"harness":"semdedup-sweep","n_vecs":$nVecs,"planes":$p,""" +
        s""""tau":$tau,"n_removed":$n,""" +
        f""""removal_rate":${n.toDouble / nVecs}%.4f,"sec":$sec%.1f}""")
      n
    }
    assert(removed.head == nVecs - nBuckets,
      s"tau=-1 must remove all but one per bucket: ${removed.head} vs ${nVecs - nBuckets}")
    assert(removed.last == 0L, s"tau > 1 must remove nothing, got ${removed.last}")
    assert(removed.zip(removed.tail).forall { case (a, b) => b <= a },
      s"removal must be monotone non-increasing in tau: $removed")
    spark.stop()
  }

  /** q96's scale claim, measured: per-shingle source multiplicity is
    * bounded by |sources|, never the corpus — so novelty runs as two hash
    * aggs and one equi-join at any size. The corpus makes the expected
    * answer EXACT: every doc is a shared 5-token boilerplate prefix
    * followed by tokens from its source's PRIVATE vocabulary, so the 3
    * prefix-only shingles are the only non-unique shingles any source has
    * (every other shingle contains a private token): for all sources,
    * n_unique == n_shingles - 3.
    */
  private def noveltyStress(nDocs: Long): Unit = {
    val nSources = 200
    val docLen = 25
    val spark = Harness.session("graft-novelty-stress")
    graft.functions.GraftFunctions.register(spark)
    import Harness.timed
    val docs = spark.range(nDocs).selectExpr(
      "id AS doc_id",
      s"concat('src', CAST(id % $nSources AS STRING)) AS source",
      s"""concat('b0 b1 b2 b3 b4 ', concat_ws(' ', transform(sequence(0, ${docLen - 1}), i ->
         |  concat('p', CAST(id % $nSources AS STRING), '_', CAST(
         |    CAST(conv(substr(md5(concat(CAST(id AS STRING), '_', CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 30
         |    AS STRING))))) AS text""".stripMargin.replaceAll("\n", " "))
    val (rows, sec) = timed {
      graft.operators.Curation.noveltyOf(docs).collect()
    }
    assert(rows.length == nSources, s"expected $nSources sources, got ${rows.length}")
    rows.foreach { r =>
      val (src, nSh, nUniq) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(nUniq == nSh - 3,
        s"$src: expected n_unique == n_shingles - 3, got $nUniq vs $nSh")
    }
    println(
      s"""{"harness":"novelty-stress","n_docs":$nDocs,"n_sources":$nSources,""" +
        f""""sec":$sec%.1f}""")
    spark.stop()
  }

  private def dsirStress(nDocs: Long): Unit = {
    val docLen = 30
    val spark = Harness.session("graft-curation-stress")
    graft.functions.GraftFunctions.register(spark)
    import Harness.timed

    // token t<k>: k is a md5-derived draw per (doc_id, pos) from the
    // 30-token target vocab [0, 30) or the disjoint background vocab
    // [500, 530). Planted docs (id % 1000 == 7) use the target vocab
    // under a background label.
    val isTargetVocab = "(id % 5 = 0 OR id % 1000 = 7)"
    val docs = spark.range(nDocs)
      .selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 5 = 0 THEN 'en' ELSE 'de' END AS lang",
        s"""concat_ws(' ', transform(sequence(0, ${docLen - 1}), i ->
           |  concat('t', CAST(
           |    CAST(conv(substr(md5(concat(CAST(id AS STRING), '_', CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 30
           |    + CASE WHEN $isTargetVocab THEN 0 ELSE 500 END AS STRING))))""".stripMargin
            .replaceAll("\n", " ")
            + " AS text")

    val (stats, sec) = timed {
      val scores = Curation.dsirScoresOf(docs).localCheckpoint(true)
      scores
        .withColumn("planted", expr("doc_id % 1000 = 7"))
        .withColumn("background", expr("doc_id % 5 <> 0 AND doc_id % 1000 <> 7"))
        .agg(
          count(lit(1)).as("n_scored"),
          min(when(col("planted"), col("dsir_weight"))).as("min_planted"),
          max(when(col("background"), col("dsir_weight"))).as("max_background"),
          max(when(col("planted"), col("dsir_weight"))).as("max_planted"))
        .collect()(0)
    }
    val nScored = stats.getLong(0)
    val minPlanted = stats.getDouble(1)
    val maxBackground = stats.getDouble(2)
    assert(nScored == nDocs, s"scored $nScored of $nDocs docs")
    assert(minPlanted > maxBackground,
      f"DSIR must separate planted target-vocab docs (min $minPlanted%.3f) " +
        f"from background docs (max $maxBackground%.3f)")
    println(
      s"""{"harness":"curation-stress","n_docs":$nDocs,"docLen":$docLen,""" +
        f""""min_planted":$minPlanted%.4f,"max_background":$maxBackground%.4f,""" +
        f""""sec_score":$sec%.1f}""")
    spark.stop()
  }
}
