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
  *
  * Two further modes stress the claims SCALE.md makes beyond the kernel:
  *  - `runMain graft.DedupStress funnel [nDocs]` — the q83 curation
  *    funnel composed end-to-end on a corpus with EXACTLY KNOWN per-stage
  *    attrition (see [[funnelStress]]), per-stage wall times recorded;
  *  - `runMain graft.DedupStress giant [copies] [nBackground]` — one
  *    duplicate cluster of `copies` identical docs (every shingle hot, so
  *    the whole cluster rides the all-hot recall path): the answer is
  *    inherently C(copies, 2) pairs, and the harness shows the kernel
  *    produces exactly that output-bounded result with no driver or
  *    single-task blowup ([[giantClusterStress]]);
  *  - `runMain graft.DedupStress spans [nDocs]` — q104 ExactSubstr spans
  *    on a corpus with exactly-known span structure and deliberately hot
  *    boilerplate blocks ([[spanStress]]).
  */
object DedupStress {
  def main(args: Array[String]): Unit = {
    args.headOption match {
      case Some("funnel") =>
        funnelStress(args.drop(1).headOption.map(_.toLong).getOrElse(100000L))
      case Some("sweep") =>
        capSweep(args.drop(1).headOption.map(_.toLong).getOrElse(20000L))
      case Some("giant") =>
        giantClusterStress(
          args.drop(1).headOption.map(_.toInt).getOrElse(5000),
          if (args.length > 2) args(2).toLong else 95000L)
      case Some("spans") =>
        spanStress(args.drop(1).headOption.map(_.toLong).getOrElse(200000L))
      case Some("boiler") =>
        boilerStress(args.drop(1).headOption.map(_.toLong).getOrElse(250000L))
      case _ => kernelStress(args)
    }
  }

  private def kernelStress(args: Array[String]): Unit = {
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

  /** ShingleDocCap sweep: the kernel's EXACTNESS is cap-independent (the
    * bounded-pruning + recall-path argument holds for any value — the cap
    * only moves work between the capped self-join and the all-hot recall
    * path), so every cap must produce the IDENTICAL pair set. This runs
    * the kernel-stress corpus at caps 10 / 50 / 200 and requires
    * bit-identical results, printing per-cap wall time — the sweep data
    * point behind the ShingleDocCap=50 rationale in Dedup.scala/SCALE.md.
    */
  private def capSweep(nDocs: Long): Unit = {
    val clusterSize = 4
    require(nDocs % clusterSize == 0)
    val spark = Harness.session("graft-cap-sweep")
    graft.functions.GraftFunctions.register(spark)
    import Harness.timed
    val docLen = 40
    val perturbPos = docLen / 2
    val docs: DataFrame = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        (col("id") - pmod(col("id"), lit(clusterSize.toLong))).as("template"),
        pmod(col("id"), lit(clusterSize.toLong)).cast("int").as("member"))
      .withColumn("text", expr(
        s"""concat_ws(' ', transform(sequence(0, ${docLen - 1}), p ->
           |  CASE WHEN member != 0 AND p = $perturbPos
           |       THEN concat('u', doc_id)
           |       ELSE concat('w', pmod(hash(template, p), 5000)) END))""".stripMargin))
      .select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    val results = Seq(10, 50, 200).map { cap =>
      val ((n, checksum), sec) = timed {
        val p = Dedup.cappedJaccardPairsOf(docs, materialize = true, cap = cap)
        val r = p.agg(count(lit(1)),
          sum(hash(col("i"), col("j"), round(col("jaccard"), 9)).cast("long"))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      println(s"""{"harness":"cap-sweep","cap":$cap,"pairs":$n,""" +
        s""""checksum":$checksum,"sec":${math.round(sec * 100) / 100.0}}""")
      (n, checksum)
    }
    require(results.distinct.size == 1,
      s"pair sets must be identical across caps, got $results")
    spark.stop()
  }

  /** q83 curation funnel at stress scale, on a corpus whose per-stage
    * attrition is exact by construction. Doc classes by `doc_id % 10`
    * (every doc is 60 tokens = 3 passage windows):
    *  - 1: byte-identical copy of doc_id-1 — removed by exact dedup;
    *  - 2: junk (1 unique marker + 59 one-char tokens) — fails the
    *    quality score (~0.23 << 0.7) but is NOT an exact dup of anything;
    *  - 3: two passage windows shared by ALL class-3 docs + one unique
    *    window — dup_ratio 2/3 > 0.5, removed by the passage filter;
    *  - 0, 4..9: unique hash-derived text — survives every stage.
    * So the funnel must report exactly N, 0.9N, 0.8N, 0.7N docs (and 60x
    * those tokens). Any deviation is a correctness failure, not noise —
    * the assert is exact recall at stress scale.
    */
  private def funnelStress(nDocs: Long): Unit = {
    require(nDocs % 10 == 0, s"nDocs ($nDocs) must be a multiple of 10")
    val spark = Harness.session("graft-funnel-stress")
    graft.functions.GraftFunctions.register(spark)
    import Harness.timed

    val docLen = 60
    val docs: DataFrame = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        pmod(col("id"), lit(10L)).cast("int").as("cls"))
      // class 1 copies class 0's text verbatim: same seed id
      .withColumn("seed", when(col("cls") === 1, col("doc_id") - 1)
        .otherwise(col("doc_id")))
      .withColumn("text", expr(
        s"""CASE
           |  WHEN cls = 2 THEN concat_ws(' ', concat('x', doc_id),
           |    concat_ws(' ', transform(sequence(1, ${docLen - 1}), p -> 'a')))
           |  WHEN cls = 3 THEN concat_ws(' ', transform(sequence(0, ${docLen - 1}), p ->
           |    CASE WHEN p < 40 THEN concat('c', p)
           |         ELSE concat('u', doc_id, 'p', p) END))
           |  ELSE concat_ws(' ', transform(sequence(0, ${docLen - 1}), p ->
           |    concat('w', seed, 'p', pmod(hash(seed, p), 100000)))) END""".stripMargin))
      .select(col("doc_id"), col("text"))
      .localCheckpoint(true) // generation cost must not pollute stage times

    // per-stage verdict timings, each over the materialized corpus
    val base = docs.withColumn("toks", split(col("text"), " "))
    val (nExactKeep, tExact) = timed {
      base.groupBy(md5(col("text"))).agg(min(col("doc_id")).as("doc_id")).count()
    }
    val (nQualityPass, tQuality) = timed {
      graft.operators.TextAnalysis.qualityScored(base)
        .filter(col("score") >= graft.operators.Curation.FunnelQualityMin).count()
    }
    val (nPassageOk, tPassage) = timed {
      Dedup.passageDupStats(docs)
        .filter(col("n_dup_passages").cast("double") <= col("n_passages") * graft.operators.Curation.FunnelDupMax)
        .count()
    }
    // the composed funnel, end-to-end (the number SCALE.md quotes)
    val (rows, tFunnel) = timed {
      graft.operators.Curation.funnelOf(docs)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    }
    val expect = Seq(
      (1L, nDocs, 60L * nDocs),
      (2L, nDocs / 10 * 9, 60L * (nDocs / 10 * 9)),
      (3L, nDocs / 10 * 8, 60L * (nDocs / 10 * 8)),
      (4L, nDocs / 10 * 7, 60L * (nDocs / 10 * 7)))
    require(rows.toSeq == expect,
      s"funnel attrition mismatch:\n  got    ${rows.toSeq}\n  expect $expect")
    def r2(x: Double) = math.round(x * 100) / 100.0
    println(s"""{"harness":"funnel-stress","n_docs":$nDocs,""" +
      s""""exact_keep":$nExactKeep,"quality_pass":$nQualityPass,"passage_ok":$nPassageOk,""" +
      s""""sec_exact":${r2(tExact)},"sec_quality":${r2(tQuality)},""" +
      s""""sec_passage":${r2(tPassage)},"sec_funnel_composed":${r2(tFunnel)}}""")
    spark.stop()
  }

  /** One giant duplicate cluster: `copies` byte-identical docs in a sea of
    * `nBackground` unique docs. Every shingle of the cluster appears in
    * `copies` >> ShingleDocCap docs, so the capped index drops them ALL
    * and the entire cluster must come back through the all-hot recall
    * path — whose output is C(copies, 2) pairs because that IS the true
    * answer. The claim under test (round-4 verdict): the
    * `broadcast(hotDocs)` pairing is bounded by the hot-doc set (here
    * `copies` ids, a few KB), the quadratic size lands only in the
    * DISTRIBUTED pair output, and nothing driver-side or single-task
    * blows up.
    */
  private def giantClusterStress(copies: Int, nBackground: Long): Unit = {
    val spark = Harness.session("graft-giant-cluster-stress")
    graft.functions.GraftFunctions.register(spark)
    import Harness.timed

    val docLen = 40
    val total = nBackground + copies
    // doc_ids [0, nBackground) unique; [nBackground, total) identical
    val docs: DataFrame = spark.range(total)
      .select(col("id").as("doc_id"),
        when(col("id") >= nBackground, lit(-1L)).otherwise(col("id")).as("seed"))
      .withColumn("text", expr(
        s"""concat_ws(' ', transform(sequence(0, ${docLen - 1}), p ->
           |  concat('w', seed, 'p', pmod(hash(seed, p), 100000))))""".stripMargin))
      .select(col("doc_id"), col("text"))

    val (out, sec) = timed {
      val p = Dedup.cappedJaccardOf(docs).localCheckpoint(true)
      p.count() -> p
    }
    val (nPairs, pairs) = out
    val expected = copies.toLong * (copies - 1) / 2
    require(nPairs == expected,
      s"giant cluster must yield exactly C($copies,2)=$expected pairs, got $nPairs")
    // round-5 verdict #5: the q50 clustering on this worst case — a
    // 5000-clique edge list — must close in the claimed 2-3 min-label
    // rounds (a clique's diameter is 1; one round labels everyone with the
    // canonical min id, the next observes the fixpoint), and the rollup
    // must report exactly ONE cluster of `copies` members
    val ((summary, rounds), secCluster) = timed {
      val (labels, r) =
        graft.operators.Curation.clusterLabelsWithRounds(pairs.select("i", "j"))
      val s = graft.operators.Curation.clusterSummary(labels)
        .select("cluster_id", "n_docs").collect()
      (s, r)
    }
    require(summary.length == 1 && summary(0).getLong(1) == copies.toLong,
      s"expected one $copies-member cluster, got ${summary.toSeq}")
    require(rounds <= 3,
      s"near-clique propagation must close in <=3 rounds, took $rounds")
    println(s"""{"harness":"giant-cluster-stress","copies":$copies,""" +
      s""""background":$nBackground,"pairs":$nPairs,""" +
      s""""sec":${math.round(sec * 100) / 100.0},""" +
      s""""cluster_rounds":$rounds,"sec_cluster":${math.round(secCluster * 100) / 100.0}}""")
    spark.stop()
  }

  /** q104 ExactSubstr-span stress: a corpus where the exact span answer is
    * known by construction, with boilerplate blocks HOT on purpose (one
    * block recurs in nDocs/5 documents). The claim under test is the one
    * that separates span dedup from pair dedup at 100 TB: output volume is
    * LINEAR in duplicated text (one span row per occurrence), never
    * C(occurrences, 2) — a block shared by 40k docs yields 40k rows where
    * a pair formulation would yield 800M.
    *
    * Layout per doc (docLen 56, k = [[graft.operators.Dedup.SpanWindowTokens]]):
    * unique filler everywhere except — for doc_id%10 IN (0,1) — a shared
    * 14-token block `bp1` at offset 3+(doc_id%7), and — for doc_id%10 == 1
    * only — a second shared 12-token block `bp2` at offset +26 (gap 22 > k,
    * so the islands must NOT merge). Expected rows: exactly nDocs/10 docs
    * with (1 span, 14 dup tokens) and nDocs/10 with (2 spans, 26).
    */
  /** q137's scale claim measured: the frequent-bigram set is
    * corpus-size-INDEPENDENT. Corpus: every 5th doc carries a planted
    * 5-token boilerplate prefix (4 bigrams whose df = 20% of docs, above
    * the 8% bar); all other bigrams are hash-unique filler over a
    * 100k-word vocabulary, so their df stays at the collision floor. At
    * nDocs and 4x nDocs the census must return EXACTLY the 4 planted
    * bigrams (|fq| flat while the corpus quadruples — the bound that
    * lets the set broadcast at any scale), and total covered positions
    * must equal the planted count (5 per boilerplate doc = nDocs when
    * nDocs % 5 == 0).
    *
    * Run: `sbt "runMain graft.DedupStress boiler [nDocs]"` (default
    * 250000; measures nDocs and 4x nDocs).
    */
  private def boilerStress(nDocs: Long): Unit = {
    require(nDocs % 5 == 0, s"nDocs ($nDocs) must be a multiple of 5")
    val docLen = 40
    val vocab = 100000
    val spark = Harness.session("graft-boiler-stress")
    graft.functions.GraftFunctions.register(spark)
    import Harness.timed

    def corpus(n: Long): DataFrame = spark.range(n)
      .select(col("id").as("doc_id"))
      .withColumn("text", expr(
        s"""CASE WHEN pmod(doc_id, 5) = 0
           |THEN concat('b0 b1 b2 b3 b4 ', concat_ws(' ',
           |  transform(sequence(0, ${docLen - 6}), p ->
           |    concat('w', pmod(hash(doc_id, p), $vocab)))))
           |ELSE concat_ws(' ', transform(sequence(0, ${docLen - 1}), p ->
           |  concat('w', pmod(hash(doc_id, p), $vocab))))
           |END""".stripMargin))
      .withColumn("toks", split(col("text"), " "))

    def run(n: Long): (Long, Long, Double) = {
      val d = corpus(n).localCheckpoint(true)
      val ((fqCount, covered), sec) = timed {
        val fq = graft.operators.TextAnalysis.boilerplateGramsOf(d)
          .localCheckpoint(true)
        val cov = graft.operators.TextAnalysis.coveredPerDoc(d, fq)
          .agg(sum(col("covered"))).first().getLong(0)
        (fq.count(), cov)
      }
      (fqCount, covered, sec)
    }

    val (fq1, cov1, sec1) = run(nDocs)
    val (fq4, cov4, sec4) = run(nDocs * 4)
    require(fq1 == 4 && fq4 == 4,
      s"frequent set must be exactly the 4 planted bigrams at both sizes: $fq1 / $fq4")
    require(cov1 == nDocs && cov4 == nDocs * 4,
      s"covered positions must equal the planted count: $cov1 / $cov4")
    println(s"""{"harness":"boiler-stress","n_docs":$nDocs,""" +
      s""""fq_small":$fq1,"fq_4x":$fq4,"covered_small":$cov1,"covered_4x":$cov4,""" +
      s""""sec_small":${math.round(sec1 * 100) / 100.0},""" +
      s""""sec_4x":${math.round(sec4 * 100) / 100.0}}""")
    spark.stop()
  }

  private def spanStress(nDocs: Long): Unit = {
    require(nDocs % 10 == 0, s"nDocs ($nDocs) must be a multiple of 10")
    val k = Dedup.SpanWindowTokens
    val docLen = 56
    val spark = Harness.session("graft-span-stress")
    import Harness.timed

    val docs: DataFrame = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        pmod(col("id"), lit(10L)).as("cls"),
        (pmod(col("id"), lit(7L)) + 3L).as("o1"))
      .withColumn("text", expr(
        s"""concat_ws(' ', transform(sequence(0, ${docLen - 1}), p ->
           |  CASE WHEN cls <= 1 AND p >= o1 AND p < o1 + 14
           |         THEN concat('bp1_', p - o1)
           |       WHEN cls = 1 AND p >= o1 + 26 AND p < o1 + 38
           |         THEN concat('bp2_', p - o1 - 26)
           |       ELSE concat('f', doc_id, '_', p) END))""".stripMargin))
      .select(col("doc_id"),
        split(col("text"), " ").as("toks"))

    val (out, sec) = timed {
      val s = Dedup.dupSpanStats(docs, k).localCheckpoint(true)
      s.count() -> s
    }
    val (nRows, stats) = out
    val one = stats.filter(col("n_spans") === 1 && col("dup_tokens") === 14L &&
      col("max_span") === 14L).count()
    val two = stats.filter(col("n_spans") === 2 && col("dup_tokens") === 26L &&
      col("max_span") === 14L).count()
    require(one == nDocs / 10, s"expected ${nDocs / 10} one-span docs, got $one")
    require(two == nDocs / 10, s"expected ${nDocs / 10} two-span docs, got $two")
    require(nRows == nDocs / 5,
      s"expected ${nDocs / 5} rows total (only boilerplate docs), got $nRows")
    val windowRows = nDocs * (docLen - k + 1)
    // duplicated window occurrences: 5 bp1 windows in nDocs/5 docs + 3 bp2
    // windows in nDocs/10 docs — the linear-output bound made concrete
    val dupRows = (nDocs / 5) * 5 + (nDocs / 10) * 3
    println(s"""{"harness":"span-stress","n_docs":$nDocs,""" +
      s""""window_rows":$windowRows,"dup_window_rows":$dupRows,""" +
      s""""span_rows":$nRows,"sec":${math.round(sec * 100) / 100.0}}""")
    spark.stop()
  }
}
