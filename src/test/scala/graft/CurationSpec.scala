package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Semantic invariants for the curation surface (q50–q56) that the DuckDB
  * hash gate can't express: transitive closure of clustering, prefix-sum
  * identity of packing, determinism of sampling, and brute-force agreement
  * on small data.
  */
class CurationSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** Write a synthetic documents table compatible with the Curation ops. */
  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = tmpDir("curation-docs")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("synth"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q123 BPE merge pass is greedy left-to-right: overlapping matches merge at odd positions only") {
    // "a a a a a" under winning pair (a, a): greedy merges positions 1-2
    // and 3-4, leaving the 5th alone -> ["a a", "a a", "a"]; a naive
    // merge-all would also fuse the overlap. "b c b c" has non-adjacent
    // matches -> both merge. The corpus is weighted so (a, a) wins round 1.
    val d = writeDocs(Seq(
      1L -> "a a a a a",
      2L -> "b c b c",
      3L -> "a a x a a"))
    val (table, merged) = graft.operators.TextAnalysis.bpeTrainLoop(spark, d, 1)
    val row = table.collect().head
    assert((row.getAs[String]("t1"), row.getAs[String]("t2")) == ("a", "a"),
      s"expected (a, a) to win round 1: $row")
    val toks = merged.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getSeq[String](1).toList).toMap
    assert(toks(1L) == List("a a", "a a", "a"), s"doc 1: ${toks(1L)}")
    assert(toks(2L) == List("b", "c", "b", "c"), s"doc 2: ${toks(2L)}")
    assert(toks(3L) == List("a a", "x", "a a"), s"doc 3: ${toks(3L)}")
  }

  test("q50 clusters are transitively closed: A~B and B~C collapse even when A!~C") {
    // B overlaps A and C at jaccard >= 0.8, but A vs C falls below the
    // threshold; a pair list alone would keep A and C apart.
    val a = (1 to 18).map(i => s"w$i").mkString(" ")                 // w1..w18
    val b = (1 to 19).map(i => s"w$i").mkString(" ")                 // w1..w19
    val c = (1 to 20).map(i => s"w$i").mkString(" ")                 // w1..w20
    val d = writeDocs(Seq((1L, a), (2L, b), (3L, c),
      (9L, "totally different content here nothing shared at all")))
    val out = Curation.q50DedupClusters(spark, d).collect()
    assert(out.length == 1, s"expected one cluster, got ${out.toSeq}")
    assert(out(0).getLong(0) == 1L) // cluster_id = min member
    assert(out(0).getString(2) == "1,2,3")
  }

  test("q50 cluster ids equal the min member and the member sample is sorted+bounded") {
    val out = Curation.q50DedupClusters(spark, dir).collect()
    assert(out.nonEmpty, "expected near-dup clusters in testdata")
    out.foreach { r =>
      val members = r.getString(2).split(",").map(_.toLong)
      assert(members.min == r.getLong(0))
      assert(members.sorted.sameElements(members))
      assert(members.length == math.min(r.getLong(1), 20L))
    }
  }

  test("q50 member sample stays bounded when one cluster dwarfs the rest") {
    import spark.implicits._
    // one 10k-member mega-cluster (the dominant real dedup shape: a single
    // huge near-identical cluster) next to a 3-member one; the rollup must
    // report exact n_docs but only the 20 smallest member ids — unbounded
    // collect_list here is a single-task memory bomb at corpus scale
    val labels = ((1L to 10000L).map(d => (d, 1L)) ++
      Seq((20001L, 20001L), (20002L, 20001L), (20003L, 20001L)))
      .toDF("doc_id", "lbl")
    graft.functions.GraftFunctions.register(spark)
    val out = Curation.clusterSummary(labels).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 20001L))
    val mega = out(0)
    assert(mega.getLong(1) == 10000L, "n_docs stays exact")
    assert(mega.getString(2) == (1L to 20L).mkString(","),
      "sample = the 20 smallest member ids")
    assert(out(1).getString(2) == "20001,20002,20003",
      "clusters under the cap report every member")
  }

  test("q83 funnel: stages monotonically shrink, stage 1 is the corpus, survivors respect every verdict") {
    import spark.implicits._
    val out = Curation.q83CurationFunnel(spark, dir)
      .as[(Long, String, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_._2).toSeq == Seq("raw", "exact_dedup", "quality", "passage_dedup"))
    val corpus = graft.operators.Queries.t(spark, dir, "documents")
    assert(out(0)._3 == corpus.count(), "stage 1 must count the whole corpus")
    out.sliding(2).foreach { case Array((_, _, d1, t1), (s, n, d2, t2)) =>
      assert(d2 <= d1 && t2 <= t1, s"stage $s ($n) grew: $d1->$d2 docs, $t1->$t2 tokens")
    }
    assert(out(3)._3 > 0, "the funnel must not empty the corpus")
  }

  test("q83 funnel keeps the canonical of an exact-dup group (census over survivors)") {
    import spark.implicits._
    // the testdata has no exact duplicates, so this input shape is the
    // one the oracle can never exercise: a raw-corpus passage census
    // would see the canonical's own removed copies and drop it at stage 4
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"),
      (3L, "a a a a a a")).toDF("doc_id", "text")
    val out = Curation.funnelOf(docs)
      .as[(Long, String, Long, Long)].collect()
    assert(out.map(r => (r._2, r._3)).toSeq == Seq(
      ("raw", 4L), ("exact_dedup", 3L), ("quality", 2L), ("passage_dedup", 2L)),
      s"funnel stages: ${out.toSeq}")
  }

  test("q51 sampling is deterministic and respects the per-language rates") {
    val s1 = Curation.q51StratifiedSample(spark, dir).collect()
    val s2 = Curation.q51StratifiedSample(spark, dir).collect()
    assert(s1.toSeq == s2.toSeq) // no RNG state anywhere
    s1.foreach { r =>
      val cap = if (r.getString(1) == "en") 40 else 80
      assert(r.getLong(3) < cap)
    }
  }

  test("q52 contamination agrees with a brute-force 8-gram overlap check") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams8(t: String): Set[String] =
      t.split(" ").sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
    val evalGrams = docs.filter(_._1 % 20 == 0).flatMap(d => grams8(d._3)).toSet
    val expected = docs.filter(_._1 % 20 != 0)
      .groupBy(_._2)
      .map { case (lang, ds) =>
        (lang, ds.length.toLong,
          ds.count(d => grams8(d._3).exists(evalGrams.contains)).toLong)
      }
    val got = Curation.q52Decontaminate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected.toSet)
  }

  test("q53 offsets are the exact prefix sum in doc_id order") {
    val rows = Curation.q53PackWindows(spark, dir).collect()
    var run = 0L
    rows.sortBy(_.getLong(0)).foreach { r =>
      assert(r.getLong(3) == run, s"doc ${r.getLong(0)}: offset ${r.getLong(3)} != $run")
      assert(r.getLong(4) == r.getLong(3) / 512)
      assert(r.getLong(5) == (r.getLong(3) + r.getLong(2) - 1) / 512)
      run += r.getLong(2)
    }
  }

  test("q54 chunking covers the doc with the declared stride") {
    val d = writeDocs(Seq((1L, "x" * 500)))
    val out = Curation.q54ChunkOverlap(spark, d).collect()
    // ceil(500 / 150) starts: 0, 150, 300, 450
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 150L, 300L, 450L))
    val fp0 = org.apache.commons.codec.digest.DigestUtils.md5Hex("x" * 200)
    assert(out(0).getString(3) == fp0)
    // last chunk is the 50-char tail, not a full window
    val fpLast = org.apache.commons.codec.digest.DigestUtils.md5Hex("x" * 50)
    assert(out(3).getString(3) == fpLast)
  }

  test("q110 chunks partition each doc exactly; cuts realign after an upstream insertion") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val base = (1 to 400).map(_ => s"w${rnd.nextInt(500)}").mkString(" ")
    val shifted = (1 to 37).map(i => s"p$i").mkString(" ") + " " + base
    val d = writeDocs(Seq((1L, base), (2L, shifted), (3L, "tiny doc")))
    val out = Curation.q110CdcChunks(spark, d)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    // partition invariant: contiguous starts, token counts sum to doc length
    for ((doc, chunks) <- out) {
      val nToks = Map(1L -> 400, 2L -> 437, 3L -> 2)(doc)
      assert(chunks.map(_._4).sum == nToks, s"doc $doc chunk sizes must sum to $nToks")
      chunks.foldLeft(0L) { case (pos, (_, _, s, n, _)) =>
        assert(s == pos, s"doc $doc chunk at $s expected $pos"); pos + n
      }
      assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong), s"doc $doc ids contiguous")
    }
    // a doc shorter than the window is one chunk
    assert(out(3L).length == 1)
    // shift robustness: every chunk of the base doc except (at most) its
    // first appears verbatim in the shifted doc — cut points depend only
    // on local content, so chunks realign after the inserted prefix
    val baseFps = out(1L).map(_._5).toSeq
    val shiftedFps = out(2L).map(_._5).toSet
    assert(baseFps.size > 3, s"corpus too small to exercise cuts: ${baseFps.size} chunks")
    assert(baseFps.tail.forall(shiftedFps.contains),
      "all base chunks after the first must survive the upstream insertion")
  }

  test("q56 scores repetitive text above unique text") {
    val rep = ((1 to 5).map(i => s"a$i") ++ (1 to 5).map(i => s"a$i")
      ++ (1 to 5).map(i => s"a$i")).mkString(" ") // 3x the same 5 tokens
    val uniq = (1 to 15).map(i => s"u$i").mkString(" ")
    val d = writeDocs(Seq((1L, rep), (2L, uniq)))
    val out = Curation.q56Repetition(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(4))).toMap
    assert(out(1L) > out(2L))
    assert(out(2L) == 0.0) // all 5-grams distinct
  }

  /** documents table with controlled lang/source per row. */
  private def writeDocsFull(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val d = tmpDir("curation-docs-full")
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q95 DSIR ranks target-distribution docs above off-target docs") {
    // 'en' docs are built from the `en-marker` bigram vocabulary, 'de'
    // docs from a disjoint one; a mixed doc sits between. DSIR weights
    // must order en > mixed > de regardless of doc length.
    val enText = (1 to 20).map(_ => "alpha beta").mkString(" ")
    val deText = (1 to 20).map(_ => "zeta omega").mkString(" ")
    val mixed = "alpha beta alpha beta zeta omega zeta omega"
    val d = writeDocsFull(Seq(
      (1L, enText, "en", "s"), (2L, enText, "en", "s"),
      (3L, deText, "de", "s"), (4L, deText, "de", "s"),
      (5L, mixed, "de", "s")))
    val out = Curation.q95DsirSelection(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(out(1L) > out(5L), s"en doc must outrank mixed: $out")
    assert(out(5L) > out(3L), s"mixed doc must outrank de: $out")
    assert(out(1L) > 0 && out(3L) < 0,
      s"log-ratio signs must separate target from off-target: $out")
  }

  test("q95 bucket-weight table joins as a broadcast (bounded build side)") {
    val plan = Curation.q95DsirSelection(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected the 1024-row weight table broadcast, got:\n$plan")
  }

  test("q96 novelty separates a duplicated source from a unique one") {
    // sources A and B share all shingles (novelty 0); C is disjoint (1.0)
    val shared = (1 to 10).map(i => s"c$i").mkString(" ")
    val unique = (1 to 10).map(i => s"u$i").mkString(" ")
    val d = writeDocsFull(Seq(
      (1L, shared, "en", "A"), (2L, shared, "en", "B"), (3L, unique, "en", "C")))
    val out = Curation.q96SourceNovelty(spark, d).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("A") == ((8L, 0L, 0.0)))
    assert(out("B") == ((8L, 0L, 0.0)))
    assert(out("C") == ((8L, 8L, 1.0)))
  }

  test("q95 DSIR == in-memory reference with identical arithmetic (fuzz)") {
    // Reference mirrors the engine op for op: md5-prefix bucket, Laplace
    // log-ratio in double, HALF_UP nano round, bigint sum, 6-decimal
    // output round — any drift in the Spark expression chain (e.g. a
    // literal silently parsing as DECIMAL) breaks exact equality here.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def bucket(g: String): Long =
      java.lang.Long.parseLong(md5hex(g).take(15), 16) % 1024
    def halfUp(x: Double, scale: Int): BigDecimal =
      BigDecimal.decimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val vocab = 5 + rnd.nextInt(8)
      val docs = (0L until 30L).map { id =>
        val lang = if (rnd.nextBoolean()) "en" else "de"
        val len = 2 + rnd.nextInt(15)
        val base = if (lang == "en") 0 else vocab / 2 // overlapping vocabularies
        val text = (0 until len)
          .map(k => s"w${base + rnd.nextInt(vocab)}").mkString(" ")
        (id, text, lang, "s")
      }
      val d = writeDocsFull(docs)
      val bg = docs.flatMap { case (id, text, lang, _) =>
        text.split(" ").toSeq.sliding(2).filter(_.length == 2)
          .map(w => (id, lang, bucket(w.mkString(" "))))
      }
      val tr = bg.size.toLong
      val tt = bg.count(_._2 == "en").toLong
      val cr = bg.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
      val ct = bg.filter(_._2 == "en").groupBy(_._3)
        .map { case (b, xs) => b -> xs.size.toLong }
      val lw = cr.map { case (b, c) =>
        val arg = ((ct.getOrElse(b, 0L) + 1.0d) / (tt + 1024)) *
          ((tr + 1024.0d) / (c + 1))
        b -> halfUp(math.log(arg) * 1e9, 0).toLong
      }
      val expected = bg.groupBy(x => (x._1, x._2)).map { case ((id, lang), xs) =>
        val nano = xs.map(x => lw(x._3)).sum
        (id, lang, xs.size.toLong, halfUp(nano.toDouble / 1e9, 6).toDouble)
      }.toSeq.sortBy(x => (-x._4, x._1)).take(100)
      val got = Curation.q95DsirSelection(spark, d).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got == expected,
        s"trial $trial (vocab $vocab): got=${got.take(3)} want=${expected.take(3)}")
    }
  }

  test("q96 novelty == brute-force set reference on random corpora (fuzz)") {
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 3) {
      val docs = (0L until 25L).map { id =>
        val src = s"s${rnd.nextInt(4)}"
        val len = 3 + rnd.nextInt(10)
        val text = (0 until len).map(k => s"w${rnd.nextInt(8)}").mkString(" ")
        (id, text, "en", src)
      }
      val d = writeDocsFull(docs)
      val bySrc = docs.groupBy(_._4).map { case (src, xs) =>
        src -> xs.flatMap(_._2.split(" ").toSeq.sliding(3).filter(_.length == 3)
          .map(_.mkString(" "))).toSet
      }
      val expected = bySrc.map { case (src, sh) =>
        val others = bySrc.filter(_._1 != src).values.flatten.toSet
        val unique = sh.diff(others).size.toLong
        (src, sh.size.toLong, unique)
      }.toSeq.sortBy(_._1)
      val got = Curation.q96SourceNovelty(spark, d).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected, s"trial $trial: got=$got want=$expected")
    }
  }

  test("q98 outliers == in-memory exact median/MAD reference (fuzz)") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val docs = (0L until 40L).map { id =>
        val src = s"s${rnd.nextInt(3)}"
        // small value domain forces ties and degenerate (zero) MADs
        (id, "x" * (1 + rnd.nextInt(12)), "en", src)
      }
      val d = writeDocsFull(docs)
      val expected = docs.groupBy(_._4).toSeq.flatMap { case (src, xs) =>
        val vals = xs.map(_._2.length.toLong)
        val s = vals.sorted
        val n = s.length
        val med2 = s((n - 1) / 2) + s(n / 2)
        val d2 = vals.map(x => math.abs(2 * x - med2)).sorted
        val mad4 = d2((n - 1) / 2) + d2(n / 2)
        xs.filter(x => math.abs(4L * x._2.length - 2 * med2) > 3 * mad4)
          .map(x => (x._1, src, x._2.length.toLong, med2 / 2.0, mad4 / 4.0))
      }.sortBy(x => (x._2, x._1))
      val got = Curation.q98LengthOutliers(spark, d).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSeq
      assert(got == expected, s"trial $trial: got=$got want=$expected")
    }
  }

  test("q98 census median/MAD matches hand-computed values, odd and even counts") {
    // odd count + zero MAD: ten docs at 100 chars, one at 1000 — median
    // 100, MAD 0, so ONLY the 1000-char doc deviates
    val d1 = writeDocsFull(
      (1L to 10L).map(i => (i, "x" * 100, "en", "s1")) :+
        ((11L, "x" * 1000, "en", "s1")))
    val out1 = Curation.q98LengthOutliers(spark, d1).collect()
    assert(out1.map(_.getLong(0)).toSeq == Seq(11L), out1.toSeq.toString)
    assert(out1(0).getDouble(3) == 100.0 && out1(0).getDouble(4) == 0.0)

    // even count: lengths 1,2,3,1000 -> median 2.5 (interpolated), MAD
    // over |x-2.5| = {1.5, 0.5, 0.5, 997.5} -> 1.0; only 1000 exceeds 3*MAD
    val d2 = writeDocsFull(Seq(
      (1L, "x", "en", "s2"), (2L, "xx", "en", "s2"),
      (3L, "xxx", "en", "s2"), (4L, "x" * 1000, "en", "s2")))
    val out2 = Curation.q98LengthOutliers(spark, d2).collect()
    assert(out2.map(_.getLong(0)).toSeq == Seq(4L), out2.toSeq.toString)
    assert(out2(0).getDouble(3) == 2.5 && out2(0).getDouble(4) == 1.0)
  }

  /** The q51/q131 md5 bucket, recomputed independently of Spark/DuckDB. */
  private def refBucket(key: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.toString.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % 100
  }

  private def refSplit(key: Long): String = {
    val b = refBucket(key)
    if (b < 90) "train" else if (b < 95) "val" else "test"
  }

  test("q131 splits are cluster-granular: near-dup members share a split, singletons hash alone") {
    // docs 1-3 form one near-dup cluster (the q50 transitive shape);
    // 9 and 10 are unrelated singletons
    val a = (1 to 18).map(i => s"w$i").mkString(" ")
    val b = (1 to 19).map(i => s"w$i").mkString(" ")
    val c = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = writeDocs(Seq((1L, a), (2L, b), (3L, c),
      (9L, "totally different content here nothing shared at all"),
      (10L, "another unrelated island of text with zero overlap")))
    val rows = Curation.leakageSplitAssignments(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[String]("split"),
          r.getAs[String]("naive_split"))).toMap
    // one cluster {1,2,3} labeled by its min member; all three share the
    // CLUSTER hash's split regardless of their own doc hashes
    assert(Seq(1L, 2L, 3L).map(rows(_)._1).toSet == Set(1L))
    assert(Seq(1L, 2L, 3L).map(rows(_)._2).toSet == Set(refSplit(1L)))
    // singletons: cluster = own id, split = own hash, naive == safe
    Seq(9L, 10L).foreach { id =>
      assert(rows(id)._1 == id)
      assert(rows(id)._2 == refSplit(id) && rows(id)._3 == refSplit(id))
    }
    // every naive_split matches the reference md5 arithmetic doc-by-doc
    rows.foreach { case (id, (_, _, naive)) => assert(naive == refSplit(id)) }
  }

  test("q131 straddle count equals the brute-force leakage of the naive doc-hash split") {
    val out = Curation.q131LeakageSplits(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // reference: recompute per-doc assignments and the straddle censuses
    val asg = Curation.leakageSplitAssignments(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_toks"),
        r.getAs[Long]("cluster_id"), r.getAs[String]("split"),
        r.getAs[String]("naive_split")))
    val byCluster = asg.groupBy(_._3)
    val refRows = byCluster.toSeq.groupBy(_._2.head._4).map {
      case (split, clusters) =>
        split -> (
          clusters.map(_._2.size).sum.toLong,
          clusters.size.toLong,
          clusters.flatMap(_._2.map(_._2)).sum,
          clusters.count(_._2.map(_._5).distinct.size > 1).toLong)
    }
    assert(out == refRows, s"engine $out vs reference $refRows")
    // the splits partition the corpus
    assert(out.values.map(_._1).sum == asg.length.toLong)
    // clusters never straddle the engine split (granularity invariant)
    byCluster.values.foreach(ms => assert(ms.map(_._4).distinct.size == 1))
  }

  /** The q135 64-bit shuffle hash, recomputed independently. */
  private def refHash64(key: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.toString.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("q135 shards partition the corpus, match the md5 permutation, and stay balanced") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val out = Curation.q135ShuffleShard(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    // reference assignment doc-by-doc
    val ref = docs.groupBy(id => refHash64(id) % 16)
    assert(out.keySet == ref.keySet && out.keySet.size == 16)
    ref.foreach { case (s, ids) =>
      assert(out(s)._1 == ids.length.toLong, s"shard $s count")
      assert(out(s)._2 == ids.minBy(id => (refHash64(id), id)), s"shard $s first")
      assert(out(s)._3 == ids.maxBy(id => (refHash64(id), id)), s"shard $s last")
    }
    // balance: data-parallel workers must finish together
    val counts = out.values.map(_._1)
    assert(counts.max <= 2 * counts.min,
      s"shard skew exceeds 2x: min ${counts.min}, max ${counts.max}")
  }

  test("q135 export writes one directory per shard with rows in shuffle order") {
    val outDir = tmpDir("shards")
    Curation.writeTrainShards(spark, dir, s"$outDir/t")
    val dirs = new java.io.File(s"$outDir/t").listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.length == 16, s"expected 16 shard dirs, got ${dirs.toSeq}")
    val back = spark.read.parquet(s"$outDir/t")
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    assert(back.count() == corpus.count())
    // within every shard file, rows are stored in ascending hash order
    dirs.foreach { sd =>
      val rows = spark.read.parquet(s"$outDir/t/$sd")
        .select("h", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.sameElements(rows.sortBy(identity)),
        s"$sd not in shuffle order")
    }
  }
}
