package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bloom, GraftFunctions}
import graft.operators.{Dedup, Multimodal, Queries, Similarity, TextAnalysis}

/** Operator-level invariants for the analytics / LLM-pipeline surface, run
  * against the sf0.001 testdata (the DuckDB hash-compare at sf0.01 is the
  * cross-engine gate; these tests pin semantic properties that a hash can't
  * express — candidate-superset guarantees, kernel equivalence, plumbing
  * shapes).
  */
class OperatorsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("long_dot matches the interpreted reference on random vectors, incl. nulls") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    import spark.implicits._
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextInt(20001).toLong - 10000),
      Array.fill(64)(rnd.nextInt(20001).toLong - 10000)))
    val df = rows.toDF("a", "b")
    val got = df.select(expr("long_dot(a, b)").as("d")).as[Long].collect()
    val want = rows.map { case (a, b) => a.zip(b).map { case (x, y) => x * y }.sum }
    assert(got.toSeq == want)
    // null propagation
    val n = df.limit(1)
      .select(expr("long_dot(a, CAST(NULL AS ARRAY<BIGINT>))")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("word_ngrams (codegen) == the interpreted HOF formulation it replaced") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = Seq.fill(300)(
      Seq.fill(rnd.nextInt(12))(s"w${rnd.nextInt(9)}").mkString(" ")) ++
      Seq("", "one", "one two", "one two three", "a b c d e")
    val df = docs.toDF("text").withColumn("toks", split(col("text"), " "))
    for (n <- Seq(2, 3, 5, 8)) {
      val parts = (0 until n).map(k => s"toks[i+$k]").mkString(", ")
      val hof =
        s"""CASE WHEN size(toks) >= $n
           |  THEN transform(sequence(0, size(toks) - $n),
           |                 i -> concat_ws(' ', $parts))
           |  ELSE array() END""".stripMargin
      val got = df.select(expr(s"word_ngrams(toks, $n)")).collect().map(_.getSeq[String](0))
      val want = df.select(expr(hof)).collect().map(_.getSeq[String](0))
      assert(got.toSeq == want.toSeq, s"n=$n mismatch")
    }
    // codegen and interpreted paths agree (null array propagates)
    val nullOut = spark.sql("SELECT word_ngrams(CAST(NULL AS ARRAY<STRING>), 3)").collect()(0)
    assert(nullOut.isNullAt(0))
  }

  test("minhash-LSH candidates are a superset of high-jaccard pairs (recall at threshold)") {
    // Every pair the exact n-gram query reports at >= 0.8 must also be
    // found by the banded MinHash query at >= 0.5 (4 bands x 3 rows makes
    // missing a 0.8-jaccard pair overwhelmingly unlikely; deterministic
    // here since the hashes are fixed).
    val exact = Dedup.q31NgramJaccard(spark, dir)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.q32MinhashLsh(spark, dir)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "expected near-dup pairs in testdata")
    assert(exact.subsetOf(lsh),
      s"missed by LSH: ${exact.diff(lsh).take(5)}")
  }

  test("incremental dedup probes only new-vs-corpus and agrees with the batch LSH result") {
    val inc = Dedup.q67IncrementalDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // side discipline: left = freshly ingested batch, right = existing corpus
    assert(inc.forall { case (n, o) => n % 10 == 0 && o % 10 != 0 },
      "pairs must be (new batch) x (existing corpus) only")
    // the incremental probe must find exactly the cross-side subset of the
    // batch LSH result (same bands, same verification threshold)
    val batch = Dedup.q32MinhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val crossSide = batch.collect {
      case (i, j) if i % 10 == 0 && j % 10 != 0 => (i, j)
      case (i, j) if j % 10 == 0 && i % 10 != 0 => (j, i)
    }
    // q32 verifies at >= 0.5 like q67; orientation differs (i<j vs new,old)
    assert(inc == crossSide,
      s"incremental != batch cross-side: only-inc=${inc.diff(crossSide).take(5)} " +
        s"only-batch=${crossSide.diff(inc).take(5)}")
  }

  test("token-budget selection: kept docs are a quality-prefix, budget respected per language") {
    val rows = graft.operators.Curation.q68TokenBudget(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (lang, docs) =>
      // greedy rule: every kept doc started under the budget...
      assert(docs.forall(_.getLong(4) < 5000L), s"$lang: doc kept past the budget")
      // ...and spent_before is consistent: it equals the running token sum
      // in (score DESC, doc_id) order — the kept set is a PREFIX, no gaps
      val ordered = docs.sortBy(r => (-r.getDouble(3), r.getLong(0)))
      var spent = 0L
      ordered.foreach { r =>
        assert(r.getLong(4) == spent,
          s"$lang: spent_before mismatch at doc ${r.getLong(0)}: ${r.getLong(4)} != $spent")
        spent += r.getLong(2)
      }
    }
  }

  test("int8 quantized cosine ranks like exact cosine within a small error") {
    val rows = graft.operators.Similarity.q69QuantizedCosine(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (cos, cos8, err) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(cos8 >= -1.0001 && cos8 <= 1.0001, s"cos_i8 out of range: $cos8")
      assert(err == math.abs(cos - cos8))
      // 8-bit rounding on 64-dim unit-ish vectors: error stays small —
      // the property that makes the 4x-smaller index usable at all
      assert(err < 0.05, s"int8 cosine error too large: $err")
    }
  }

  test("capped jaccard == exact jaccard on randomized skewed corpora (fuzz)") {
    // Random small-vocab corpora force partially-hot intersections — the
    // regime where the bounded-pruning arithmetic and the recall path
    // must hand off correctly. Reference = in-memory brute force.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val vocab = 6 + rnd.nextInt(6) // tiny vocab => many hot shingles
      val docs = (0L until 40L).map { id =>
        val n = 8 + rnd.nextInt(30)
        // near-dup pairs: every 4th doc repeats the previous doc with a
        // one-token tail perturbation
        if (id % 4 == 1 && id > 0) {
          val prev = (0 until (8 + ((id - 1) % 7).toInt * 3))
            .map(k => s"w${(id - 1 + k * 7) % vocab}").mkString(" ")
          (id, prev + s" u$id")
        } else {
          val len = 8 + (id % 7).toInt * 3
          (id, (0 until len).map(k => s"w${(id + k * 7) % vocab}").mkString(" "))
        }
      }
      val dir = tmpDir(s"fuzz-jaccard-$trial")
      docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
      // in-memory exact reference over distinct 3-gram shingle sets
      val sets = docs.map { case (id, text) =>
        val toks = text.split(" ")
        id -> toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.toMap
      val expected = (for {
        i <- docs.map(_._1); j <- docs.map(_._1) if i < j
        si = sets(i); sj = sets(j)
        if si.nonEmpty && sj.nonEmpty
        inter = (si & sj).size
        uni = si.size + sj.size - inter
        if uni > 0 && inter.toDouble / uni >= 0.8
      } yield (i, j)).toSet
      val got = Dedup.q49NgramJaccardCapped(spark, dir)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"trial $trial (vocab $vocab): missing=${expected.diff(got).take(5)} " +
          s"spurious=${got.diff(expected).take(5)}")
    }
  }

  test("capped jaccard equals exact jaccard when the whole intersection is hot") {
    // A cluster of >ShingleDocCap near-identical docs makes every shared
    // shingle hot: the capped index drops the entire intersection, so only
    // the recall path (pairing individually hot-dominated docs) can keep
    // q49 == q31 on the dominant real dedup shape.
    import spark.implicits._
    val dir = tmpDir("hot-cluster")
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs =
      (1L to 55L).map(id => (id, base)) ++ // all-hot identical cluster
      Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"),
          (101L, "alpha beta gamma delta epsilon zeta eta iota"),
          (102L, "unrelated words entirely different content here now"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = pairs(Dedup.q31NgramJaccard(spark, dir))
    val capped = pairs(Dedup.q49NgramJaccardCapped(spark, dir))
    assert(exact.size >= 55 * 54 / 2, s"expected the full cluster, got ${exact.size}")
    assert(capped == exact,
      s"missing: ${exact.diff(capped).take(5)}; spurious: ${capped.diff(exact).take(5)}")
  }

  test("simhash pairs are symmetric-free (i<j), hamming bound holds") {
    val rows = Dedup.q33Simhash(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(4) <= 2)
      val fi = r.getLong(2); val fj = r.getLong(3)
      assert(java.lang.Long.bitCount(fi ^ fj) == r.getLong(4))
    }
  }

  test("simhash banding: bucket occupancy is corpus-size-independent (20-bit bands)") {
    // splitmix64 fingerprints stand in for a corpus of unrelated docs —
    // EVERY candidate pair the banding emits on them is spurious, so the
    // candidate count measures band-bucket collision load directly.
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    import spark.implicits._
    val n = 2000
    val fps = (0 until n).map(i => (i.toLong, mix(i.toLong) & ((1L << 60) - 1)))
    val fp = fps.toDF("doc_id", "f")
    val spurious = Dedup.simhashCandidates(fp).count()
    // expectation ≈ 3 * C(2000,2) / 2^20 ≈ 5.7 pairs; 200 is generous
    assert(spurious <= 200, s"20-bit banding emitted $spurious spurious candidates")
    // contrast: round-4's 32-bit/11+11+10 banding on the SAME fingerprints —
    // expectation ≈ C(2000,2) * (2/2^11 + 1/2^10) ≈ 3900 pairs. This is the
    // Θ(N²/2¹¹) growth the 20-bit bands remove.
    val oldBands = Seq((0, 2047L), (11, 2047L), (22, 1023L))
    val bandCols = oldBands.zipWithIndex.map { case ((shift, mask), i) =>
      struct(lit(i).as("band"), expr(s"(f >> $shift) & $mask").as("v"))
    }
    val banded = fp.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.v").as("v"))
    val oldSpurious = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select("a.doc_id", "b.doc_id").distinct().count()
    assert(oldSpurious >= 1000,
      s"expected the narrow banding to collide heavily, got $oldSpurious")
  }

  test("LSH buckets: one bucket per vector in [0, 256); bucket hits agree with brute force") {
    val buckets = Similarity.lshBuckets(spark, dir).collect()
    val nVecs = Queries.t(spark, dir, "embeddings").count()
    assert(buckets.length == nVecs, "exactly one bucket per vector")
    buckets.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b < 256)
    }
    val bf = Similarity.q35AnnBruteforce(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // any LSH hit that is also a global top-10 must agree exactly on cos
    // (the bucket can be a singleton at tiny SF — consistency, not recall)
    Similarity.q36AnnLsh(spark, dir).collect().foreach { r =>
      bf.get(r.getLong(0)).foreach(c =>
        assert(c == r.getDouble(2), s"cos mismatch for vec ${r.getLong(0)}"))
    }
  }

  test("lang-id prediction is deterministic argmax with fixed tie order") {
    val rows = TextAnalysis.q21LangId(spark, dir).collect()
    rows.foreach { r =>
      val hits = Map("en" -> r.getLong(1), "de" -> r.getLong(2),
        "es" -> r.getLong(3), "fr" -> r.getLong(4))
      val pred = r.getString(5)
      if (hits.values.forall(_ == 0)) assert(pred == "und")
      else {
        val best = hits.values.max
        assert(hits(pred) == best)
        // fixed preference order: en beats later langs on ties
        val order = Seq("en", "de", "es", "fr")
        val winners = order.filter(l => hits(l) == best)
        assert(pred == winners.head)
      }
    }
  }

  test("multimodal decode stub: mapPartitions batch shape, deterministic metadata") {
    val media = Multimodal.mediaTable(spark, dir)
    val meta = Multimodal.decodeStub(spark, media).collect()
    assert(meta.length == media.count())
    val again = Multimodal.decodeStub(spark, media).collect()
    assert(meta.sortBy(_.docId).toSeq == again.sortBy(_.docId).toSeq,
      "decode stub must be deterministic")
    meta.foreach { m =>
      assert(m.nBytes > 0 && m.contentMd5.length == 32)
      assert(m.width >= 160 && m.width < 224 && m.height >= 90 && m.height < 154)
    }
  }

  test("real image decode: JDK ImageIO reads synthesized PNGs, corrupt bytes degrade gracefully") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, png(320, 180)), (2L, png(64, 64)),
      (3L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "media")
    val metas = graft.operators.Multimodal.decodeImages(spark, media)
      .collect().sortBy(_.docId)
    assert(metas(0).ok && metas(0).format == "png" &&
      metas(0).width == 320 && metas(0).height == 180)
    assert(metas(1).ok && metas(1).width == 64 && metas(1).height == 64)
    assert(!metas(2).ok, "corrupt bytes must produce an error record, not a crash")

    val resized = graft.operators.Multimodal.resizeImages(spark, media, maxDim = 100)
      .collect().sortBy(_.getLong(0))
    assert(resized.length == 2, "unreadable media dropped from resize")
    assert(resized(0).getInt(2) == 100 && resized(0).getInt(3) == 56,
      "320x180 scaled to long edge 100 is 100x56")
    // resized bytes are themselves decodable PNGs
    val rt = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(0).getAs[Array[Byte]](1)))
    assert(rt.getWidth == 100 && rt.getHeight == 56)
  }

  test("perceptual aHash: invariant to brightness shift, far for unrelated images") {
    import spark.implicits._
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 64).foreach(x => (0 until 64).foreach { y =>
        val v = math.min(255, math.max(0, f(x, y)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val gradient = png((x, _) => x * 4)
    val brighter = png((x, _) => x * 4 + 30)       // uniform shift
    val noise = { val r = new scala.util.Random(5); png((_, _) => r.nextInt(256)) }
    val media = Seq((1L, gradient), (2L, brighter), (3L, noise),
      (4L, "junk".getBytes("UTF-8"))).toDF("doc_id", "media")
    val h = Multimodal.imageAHash(spark, media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h.keySet == Set(1L, 2L, 3L), "undecodable media dropped")
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(2L)) <= 2,
      s"brightness shift must preserve the mean-relative hash (got ${hamming(h(1L), h(2L))})")
    assert(hamming(h(1L), h(3L)) >= 16,
      s"unrelated noise must be far (got ${hamming(h(1L), h(3L))})")
  }

  test("q130 banding is exact at Hamming<=3: banded pairs == brute-force all-pairs") {
    import graft.operators.Multimodal
    val dir = "/root/testdata/sf0.001"
    // the banded candidate set feeding q130's clusters must equal the
    // no-banding all-pairs scan — the 4x16-bit pigeonhole guarantee,
    // checked on the real fixture corpus (not a synthetic toy)
    val brute = Multimodal.bruteForceNeardupPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture must contain near-dup images")
    // recompute the banded pair set exactly as q130 does, by reusing its
    // cluster output: every brute pair's endpoints must share a cluster
    val labels = Multimodal.q130ImageNeardup(spark, dir)
    val hashes = Multimodal.imageAHash(
      spark, Multimodal.imageTable(spark, dir)).localCheckpoint(true)
    val banded = hashes.select(col("doc_id"), col("ahash"),
        explode(expr("sequence(0, 3)")).as("b"))
      .withColumn("bk", expr("(ahash >> (b * 16)) & 65535"))
    val bandedPairs = banded.as("a").join(banded.as("b"),
        col("a.b") === col("b.b") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.ahash").as("hi"), col("b.ahash").as("hj"))
      .distinct()
      .filter(expr("bit_count(hi ^ hj)") <= 3)
      .select("i", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bandedPairs == brute,
      s"banding lost ${(brute -- bandedPairs).size} pairs / invented ${(bandedPairs -- brute).size}")
    assert(labels.collect().map(_.getLong(1)).sum >= 2,
      "clusters must aggregate the paired images")
  }

  test("real WAV decode: header parsed by javax.sound, features exact, corrupt bytes degrade") {
    import spark.implicits._
    import graft.operators.Multimodal
    // 4 samples around the unsigned midpoint: 128±d -> peak=2, rms=sqrt(2.5)
    val pcm = Array[Byte](128.toByte, 130.toByte, 126.toByte, 129.toByte)
    val wav = Multimodal.wavContainer(pcm, sampleRate = 4000)
    val media = Seq(
      (1L, wav),
      (2L, Array.fill[Byte](64)(42)), // no RIFF header: must error, not throw
      (3L, wav.take(20))).toDF("doc_id", "media") // truncated header
    val out = Multimodal.decodeAudio(spark, media).collect()
      .map(m => m.docId -> m).toMap
    val good = out(1L)
    assert(good.ok && good.sampleRate == 4000, "rate must come from the parsed header")
    assert(good.nSamples == 4L && good.durationMs == 1L) // 4/4000s = 1ms
    assert(good.peak == 2L)
    assert(math.abs(good.rms - math.sqrt((0 + 4 + 4 + 1) / 4.0)) < 1e-12)
    assert(!out(2L).ok && out(2L).error.nonEmpty, "garbage must degrade to an error row")
    assert(!out(3L).ok, "truncated header must degrade to an error row")
  }

  test("frame sampling emits offset windows covering the blob exactly") {
    val media = Multimodal.mediaTable(spark, dir).limit(10)
    val frames = Multimodal.frameSample(media, stride = 100).collect()
    val byDoc = frames.groupBy(_.getLong(0))
    byDoc.foreach { case (_, fs) =>
      val n = fs.head.getLong(1)
      val sorted = fs.sortBy(_.getLong(2))
      assert(sorted.head.getLong(2) == 0)
      assert(sorted.map(_.getLong(3)).sum == n, "frame windows must tile the blob")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(2) == a.getLong(2) + 100)
        case _ =>
      }
    }
  }

  test("top_k_by: order- and partitioning-independent, ties break on value ascending") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(i => (s"g${i % 5}", s"v$i", rnd.nextInt(50).toLong))
    def run(data: Seq[(String, String, Long)], parts: Int): Map[String, Seq[(String, Long)]] =
      data.toDF("g", "v", "c").repartition(parts)
        .groupBy($"g").agg(expr("top_k_by(v, c, 4)").as("t"))
        .select($"g", $"t").as[(String, Seq[(String, Long)])]
        .collect().toMap
    val a = run(rows, 7)
    val b = run(rnd.shuffle(rows), 2)
    assert(a == b, "top_k_by must not depend on row order or partitioning")
    // reference: sort each group by (c desc, v asc), take 4
    val want = rows.groupBy(_._1).view.mapValues(
      _.map(t => (t._2, t._3)).sortBy { case (v, c) => (-c, v) }.take(4)).toMap
    assert(a == want)
  }

  test("bloom filter: no false negatives, order-independent bytes, sane FP rate") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val keys = (0L until 3000L).map(_ * 7919L)
    val asc = keys.toDF("k").repartition(8)
    val desc = keys.reverse.toDF("k").repartition(3)
    def build(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.selectExpr("bloom_build(xxhash64(k), 65536, 5) as bf").as[Array[Byte]].head()
    val a = build(asc)
    val b = build(desc)
    assert(java.util.Arrays.equals(a, b),
      "bloom bytes must be identical regardless of row order and partitioning")
    // no false negatives: every inserted key probes true
    val misses = asc.selectExpr("k", s"bloom_might_contain(${hexLit(a)}, xxhash64(k), 5) as hit")
      .filter(!col("hit")).count()
    assert(misses == 0, "a bloom filter can never have false negatives")
    // FP rate: 3k keys in 64Kbit/5 hashes ≈ 0.1%; allow 1%
    val probes = (1L to 20000L).map(i => i * 7919L + 3L).toDF("k")
    val fps = probes.selectExpr(s"bloom_might_contain(${hexLit(a)}, xxhash64(k), 5) as hit")
      .filter(col("hit")).count()
    assert(fps < 200, s"false-positive rate too high: $fps / 20000")
  }

  test("q79/q81 oracle precondition: testdata vocabulary fits the heavy-hitter capacity") {
    // heavy_hitters(tok, 64) is EXACT only while every partial buffer sees
    // <= 64 distinct tokens; the exact-census DuckDB oracles rely on that.
    // If the generated corpus ever outgrows the capacity, fail HERE with a
    // clear message instead of as a confusing hash mismatch in the verify
    // gate (headroom policy: capacity 64 = 2x the current 31-token vocab).
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val v = Queries.t(spark, sf, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(countDistinct(col("tok"))).head().getLong(0)
      assert(v <= 64, s"$sf vocabulary ($v tokens) exceeds heavy_hitters capacity 64 " +
        "— q79/q81 exactness no longer holds; raise m or relax the oracles")
    }
  }

  test("capped kernel: a corpus-hot shingle emits zero candidate pairs") {
    // 200 docs share one 3-token run but are otherwise disjoint — true
    // Jaccard for every pair is tiny. The retired uncapped index emitted
    // C(200,2) = 19900 intermediate pairs from the hot shingle alone; the
    // capped kernel (now behind q31/q50/q92 too) generates none: the hot
    // shingle is dropped from the index, no doc is >= 4/9 hot (1 hot of 9
    // shingles), and the exact answer is empty.
    GraftFunctions.register(spark)
    import spark.implicits._
    val docs = (0 until 200).map { i =>
      (i.toLong, s"common run here u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h")
    }.toDF("doc_id", "text")
    val (_, _, candidates) = Dedup.cappedCandidatesOf(docs, materialize = false)
    assert(candidates.count() == 0,
      "hot-shingle-only overlap must never reach candidate generation")
    assert(Dedup.cappedJaccardPairsOf(docs).count() == 0)
  }

  test("q74 bloom sizing: FP rate stays bounded at 10x the bench build cardinality") {
    // splitmix64 — independent well-mixed 64-bit keys for the FP estimate
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val n = 30000 // ~10x the sf0.1 build side (~3k urgent finished orders)
    val bits = graft.operators.ScaleOps.sizedBloomBits(n.toLong)
    assert(bits >= 10 * n && (bits & 7) == 0)
    val sized = new Array[Byte](bits >>> 3)
    val fixed = new Array[Byte](65536 >>> 3) // round 3's hardcoded 64 Kbit
    (0 until n).foreach { i =>
      Bloom.add(sized, mix(i.toLong), 5); Bloom.add(fixed, mix(i.toLong), 5)
    }
    val probes = 100000
    def fpCount(buf: Array[Byte]): Int =
      (0 until probes).count(i => Bloom.mightContain(buf, mix((n + i).toLong), 5))
    val fpSized = fpCount(sized)
    // m = 10n, k = 5 gives ~0.9% expected FP; 2% is generous headroom
    assert(fpSized < probes / 50, s"sized filter FP rate too high: $fpSized / $probes")
    // and the round-3 fixed filter demonstrably saturates at this scale
    assert(fpCount(fixed) > probes / 3,
      "the fixed 64 Kbit filter should be saturated at 10x bench cardinality " +
        "(if not, the sized variant is unnecessary)")
  }

  private def hexLit(bytes: Array[Byte]): String =
    "X'" + bytes.map(b => f"$b%02X").mkString + "'"

  test("PII scrub: redaction removes every detected match, lengths reconcile") {
    import spark.implicits._
    val out = TextAnalysis.q72PiiScrub(spark, dir)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_emails", "n_phones", "len_raw", "len_redacted", "redacted_md5"))
    val rows = out.as[(Long, Long, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    // construction: doc_id%4 emails, phone iff odd doc_id
    rows.foreach { case (id, em, ph, _, _, _) =>
      assert(em == id % 4, s"doc $id email count")
      assert(ph == (id % 2), s"doc $id phone count")
    }
    assert(rows.exists(_._2 > 0) && rows.exists(_._3 > 0), "annotation produced PII")
    // every removed char is accounted for: len_raw - len_redacted equals
    // (match chars - placeholder chars) per doc; placeholders are 7 chars each
    rows.foreach { case (id, em, ph, raw, red, _) =>
      val emailLen = s" contact user$id@example.org".length - " contact ".length
      val phoneLen = 11 // +1-555-dddd
      val expected = raw - em * emailLen - ph * phoneLen + em * "<EMAIL>".length + ph * "<PHONE>".length
      assert(red == expected, s"doc $id redacted length")
    }
  }

  test("URL domains: www stripped, every doc contributes, https share consistent") {
    import spark.implicits._
    val out = TextAnalysis.q73UrlDomains(spark, dir)
    assert(out.columns.toSeq == Seq("domain", "n_urls", "n_docs", "n_https"))
    val rows = out.as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_._1.startsWith("www.")), "www. must be stripped")
    assert(rows.exists(_._1 == "mirror.example.net"), "mirror domain present")
    // mirror URLs are all http; shard URLs all https
    rows.foreach { case (d, urls, _, https) =>
      if (d == "mirror.example.net") assert(https == 0L)
      else assert(https == urls, s"domain $d should be all-https")
    }
    val nDocs = Queries.t(spark, dir, "documents").count()
    assert(rows.map(_._2).sum >= nDocs, "at least one URL per doc")
  }

  test("passage dedup: every doc chunks to ceil(tokens/20) passages; ratios bounded") {
    import spark.implicits._
    val out = Dedup.q76PassageDedup(spark, dir)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_passages", "n_dup_passages", "dup_ratio"))
    val got = out.as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val expected = Queries.t(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("nt"))
      .as[(Long, Int)].collect()
    assert(got.size == expected.length, "one row per document")
    expected.foreach { case (id, nt) =>
      val (_, np, nd, ratio) = got(id)
      assert(np == math.ceil(nt / 20.0).toLong, s"doc $id passage count")
      assert(nd >= 0 && nd <= np, s"doc $id dup count bounds")
      assert(ratio >= 0.0 && ratio <= 1.0, s"doc $id ratio bounds")
    }
  }

  test("dup spans: island merge splits at gap > k, merges at gap == k, spans cover blocks exactly") {
    import spark.implicits._
    def toks(parts: Seq[String]*): String = parts.flatten.mkString(" ")
    def blk(p: String, n: Int): Seq[String] = (1 to n).map(i => s"$p$i")
    val A = blk("a", 12); val B = blk("b", 12)
    val X = blk("x", 10); val Y = blk("y", 10)
    val Xp = blk("xp", 10); val Yp = blk("yp", 10)
    val docs = Seq(
      // A at offset 20, B at offset 62 in doc 1; both blocks recur in doc 2
      // at different offsets with different context -> two islands per doc
      1L -> toks(blk("u", 20), A, blk("m", 30), B, blk("t", 5)),
      2L -> toks(blk("v", 7), A, blk("n", 25), B),
      3L -> toks(blk("q", 40)),
      // X|Y adjacent in doc 4 (dup offsets 0 and 10, gap == k -> ONE span
      // of 20 tokens) -- X recurs only in doc 5, Y only in doc 6, so the
      // straddling windows 1..9 of doc 4 are corpus-unique
      4L -> toks(X, Y),
      5L -> toks(blk("r", 11), X),
      6L -> toks(blk("s", 13), Y),
      // X'|z|Y' in doc 7 (dup offsets 0 and 11, gap == k+1 -> TWO spans)
      7L -> toks(Xp, Seq("z0"), Yp),
      8L -> toks(blk("w", 11), Xp),
      9L -> toks(blk("e", 13), Yp))
    val tok = docs.toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
    val out = Dedup.dupSpanStats(tok, 10)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // (doc_id, n_toks, n_spans, dup_tokens, max_span, dup_ratio)
    def check(id: Long, want: (Long, Long, Long, Long), label: String): Unit = {
      val (_, nt, ns, dt, ms, ratio) = out(id)
      assert((nt, ns, dt, ms) == want, label)
      assert(math.abs(ratio - dt.toDouble / nt) < 1e-6, s"$label ratio")
    }
    check(1L, (79L, 2L, 24L, 12L), "doc 1 two islands")
    check(2L, (56L, 2L, 24L, 12L), "doc 2 two islands")
    assert(!out.contains(3L), "fully unique doc emits no row")
    check(4L, (20L, 1L, 20L, 20L),
      "gap == k merges adjacent shared blocks into one span")
    check(7L, (21L, 2L, 20L, 10L),
      "gap == k+1 keeps the blocks as two spans")
    // recurrence sites in docs 5/6/8/9: one span covering exactly the block
    Seq(5L, 6L, 8L, 9L).foreach { id =>
      assert(out(id)._3 == 1L && out(id)._4 == 10L && out(id)._5 == 10L,
        s"doc $id single 10-token span")
    }
  }

  private def md560(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val d = tmpDir("ops-docs")
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("md5_prefix64 == CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT) on fuzzed strings") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val alphabets = Seq(
      "abcdefghijklmnopqrstuvwxyz 0123456789",
      "äöüßéèêñçπλΩ中文日本語한국어",  // multibyte UTF-8
      " \t\n\"'\\|")         // control + escape chars
    val fuzz = (1 to 2000).map { _ =>
      val a = alphabets(rnd.nextInt(alphabets.length))
      (0 until rnd.nextInt(80)).map(_ => a(rnd.nextInt(a.length))).mkString
    } ++ Seq("", " ", "a", "0" * 10000)
    val out = fuzz.toDF("s")
      .select(
        expr("md5_prefix64(s)").as("fast"),
        expr("CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)").as("ref"),
        col("s"))
      .filter(col("fast") =!= col("ref"))
      .collect()
    assert(out.isEmpty, s"divergence on: ${out.take(5).mkString(", ")}")
    // null flows through as null, like the composed form
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(expr("md5_prefix64(s)")).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("minhash calibration: identical docs estimate 1.0 with zero error; estimate stays within sketch bounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val base = (1 to 60).map(_ => s"w${rnd.nextInt(40)}").mkString(" ")
    val near = base.split(" ").drop(6).mkString(" ") // high-overlap variant
    val dir = writeDocs(Seq(
      (1L, base, "synth"), (2L, base, "synth"), (3L, near, "synth")))
    val out = Dedup.q112MinhashCalibration(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val (_, _, est, exact, err) = out((1L, 2L))
    assert(est == 1.0 && exact == 1.0 && err == 0.0,
      "identical shingle sets must match on every component")
    out.values.foreach { case (i, j, e, x, a) =>
      assert(e >= 0.0 && e <= 1.0 && math.abs(a - math.abs(e - x)) < 1e-6,
        s"($i,$j) est/err out of contract")
    }
  }

  test("ngram growth: novelty counts at first occurrence only; repeated docs add nothing") {
    import spark.implicits._
    // docs 5..9 are verbatim copies of 0..4 — with ndocs = 10 each doc is
    // its own decile, so the curve must stop growing at decile 4
    val uniq = (0 until 5).map(i => s"a$i b$i c$i d$i e$i")
    val dir = writeDocs((uniq ++ uniq).zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "synth")
    })
    val out = Dedup.q111NgramGrowth(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == (0 until 5).map(d => (d.toLong, 3L, 3L * (d + 1))),
      s"each unique doc contributes its 3 shingles once, copies none: $out")
  }

  test("passage clean: first occurrence survives, repeats are cut, text rebuilds in order") {
    import spark.implicits._
    def blk(p: String): String = (1 to 20).map(i => s"$p$i").mkString(" ")
    val A = blk("a"); val B = blk("b"); val C = blk("c")
    val tail = "t1 t2 t3" // short remainder passage, unique
    val dir = writeDocs(Seq(
      0L -> s"$A $B",        // first carrier of A and B: keeps both
      1L -> s"$A $C $tail",  // loses A, keeps C + its remainder tail
      2L -> s"$B $A"         // repeats only: cleaned to empty
    ).map { case (id, t) => (id, t, "synth") })
    val out = Dedup.q108PassageClean(spark, dir)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 2L, 0L, s"$A $B"),
      (1L, 3L, 2L, 1L, s"$C $tail"),
      (2L, 2L, 0L, 2L, "")), out.toString)
  }

  test("incremental spans: only against-index duplication counts; intra-batch repeats do not") {
    import spark.implicits._
    def blk(p: String, n: Int): String = (1 to n).map(i => s"$p$i").mkString(" ")
    val F = blk("f", 12); val G = blk("g", 12)
    val dir = writeDocs(Seq(
      3L -> s"${blk("i3u", 5)} $F ${blk("i3v", 5)}",   // index doc carrying F
      7L -> blk("i7", 30),                              // unique index doc
      10L -> s"${blk("n10", 6)} $F ${blk("n10b", 4)}",  // new: F hits the index
      20L -> s"${blk("n20", 5)} $G",                    // new: G only intra-batch
      40L -> s"$G ${blk("n40", 5)}",                    // new: G only intra-batch
      50L -> blk("n50", 15)                             // new: unique
    ).map { case (id, t) => (id, t, "synth") })
    val out = Dedup.q107IncrementalSpans(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((10L, 22L, 1L, 12L, 12L, 0.545455)),
      s"only the new doc whose block exists in the INDEX is flagged: ${out.toSeq}")
  }

  test("quality classifier: logit matches a hand-rolled md5 reference; kept is the sign of the nano sum") {
    import spark.implicits._
    def wnano(b: Long): Long = md560(s"w:$b") % 2000000001L - 1000000000L
    val texts = Seq("alpha beta gamma delta", "zq zq zq zq zq",
      "one two three four five six seven", "alpha beta gamma delta")
    val dir = writeDocs(texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "synth")
    })
    val out = TextAnalysis.q105QualityClassifier(spark, dir)
      .as[(Long, String, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.size == texts.length)
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split(" ")
      val nano = toks.map(tok => wnano(md560(tok) % 1024)).sum
      val (_, _, nToks, logit, kept) = out(i.toLong)
      assert(nToks == toks.length.toLong, s"doc $i token count")
      assert(math.abs(logit - nano.toDouble / toks.length / 1e9) < 1e-6,
        s"doc $i logit vs reference")
      assert(kept == (if (nano > 0) 1L else 0L), s"doc $i keep decision")
    }
    // identical texts score identically (docs 0 and 3)
    assert(out(0L)._4 == out(3L)._4 && out(0L)._5 == out(3L)._5)
  }

  test("sample quantiles: exact on small groups; k-smallest-hash subset on large ones") {
    import spark.implicits._
    // 'big' exceeds the k=64 sample cap; 'small' fits entirely
    val big = (0L until 300L).map(i =>
      (i, s"doc$i " + ("x " * ((i % 7) + 1).toInt).trim, "big"))
    val small = (300L until 340L).map(i =>
      (i, s"doc$i " + ("y " * ((i % 5) + 1).toInt).trim, "small"))
    val dir = writeDocs(big ++ small)
    val nChars = (big ++ small).map(r => r._1 -> r._2.length.toLong).toMap
    def expected(ids: Seq[Long], k: Int): (Long, Seq[Long]) = {
      val sampled = ids.sortBy(id => (md560(id.toString), nChars(id).toString))
        .take(k).map(nChars).sorted
      def pick(q: Double) = sampled(
        math.max(1, math.ceil(q * sampled.size).toInt) - 1)
      (sampled.size.toLong, Seq(pick(0.5), pick(0.9), pick(0.99)))
    }
    val out = graft.operators.ScaleOps.q106SampleQuantiles(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (bn, bq) = expected(big.map(_._1), 64)
    val (sn, sq) = expected(small.map(_._1), 64)
    assert(out("big") == (("big", 300L, bn, bq(0), bq(1), bq(2))),
      "big source: quantiles of the 64 smallest-hash docs")
    assert(bn == 64L, "big source sample is capped at k")
    assert(out("small") == (("small", 40L, sn, sq(0), sq(1), sq(2))),
      "small source: sample is the whole group, quantiles exact")
  }

  test("bigram LM: scores are non-positive; bigram counts reconcile with token counts") {
    import spark.implicits._
    val out = TextAnalysis.q77BigramLm(spark, dir)
    assert(out.columns.toSeq == Seq("doc_id", "n_bigrams", "avg_logprob"))
    val got = out.as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    // conditional probability c(w1 w2) <= c(w1 ·) => every log-prob <= 0
    got.foreach { case (id, nb, lp) =>
      assert(lp <= 0.0, s"doc $id avg_logprob must be <= 0, got $lp")
      assert(nb >= 1, s"doc $id bigram count")
    }
    val tokCounts = Queries.t(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("nt"))
      .as[(Long, Int)].collect().toMap
    got.foreach { case (id, nb, _) =>
      assert(nb == tokCounts(id) - 1L, s"doc $id: n_bigrams == n_tokens - 1")
    }
  }

  test("mix allocation: weights are a rank permutation; allocations respect caps and budget") {
    import spark.implicits._
    val out = graft.operators.Curation.q78MixAllocation(spark, dir)
    assert(out.columns.toSeq ==
      Seq("source", "n_docs", "n_tokens", "weight", "alloc_tokens", "rate"))
    val rows = out.as[(String, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    // sources sort ascending; weights descend n..1 in that order
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    assert(rows.map(_._4).toSeq == (n to 1L by -1L).toSeq)
    val tot = rows.map(_._3).sum
    rows.foreach { case (s, _, nt, _, alloc, rate) =>
      assert(alloc <= nt, s"source $s allocation exceeds its corpus")
      assert(rate >= 0.0 && rate <= 1.0, s"source $s rate bounds")
    }
    assert(rows.map(_._5).sum <= tot / 2, "total allocation within the budget")
  }

  test("heavy_hitters: exact when under capacity regardless of partitioning; MG bound when over") {
    import spark.implicits._
    // exact regime: 4 distinct <= m, counts independent of partition layout
    val data = (1 to 100).flatMap(i =>
      Seq.fill(4)("alpha") ++ Seq.fill(3)("beta") ++ Seq.fill(2)("gamma") ++ Seq("delta"))
    for (parts <- Seq(1, 3, 7)) {
      val out = data.toDF("t").repartition(parts)
        .agg(expr("heavy_hitters(t, 8)").as("hh"))
        .selectExpr("transform(hh, e -> concat(e.item, ':', e.cnt)) AS s")
        .collect()(0).getSeq[String](0)
      assert(out == Seq("alpha:400", "beta:300", "gamma:200", "delta:100"),
        s"parts=$parts: $out")
    }
    // approx regime: 1000 distinct singletons + one heavy item, m = 16.
    // MG guarantee: the heavy item survives with count >= true - n/(m+1)
    val n = 1000 + 500
    val skewed = ((1 to 1000).map(i => s"junk$i") ++ Seq.fill(500)("heavy"))
    val hh = skewed.toDF("t").repartition(4)
      .agg(expr("heavy_hitters(t, 16)").as("hh"))
      .selectExpr("explode(hh) AS e").selectExpr("e.item", "e.cnt")
      .as[(String, Long)].collect().toMap
    assert(hh.contains("heavy"), s"true heavy hitter evicted: $hh")
    assert(hh("heavy") <= 500L, "MG counts never overestimate")
    assert(hh("heavy") >= 500L - n / 17L,
      s"undercount exceeds n/(m+1): ${hh("heavy")}")
  }

  test("heavy_hitters buffer: randomized partition/merge trees are exact under capacity, MG-bounded over") {
    import graft.functions.HeavyHittersBuffer
    val rnd = new scala.util.Random(7)
    def foldRandom(bufs: Seq[HeavyHittersBuffer], m: Int): HeavyHittersBuffer = {
      // merge in a random tree order, as a shuffle's partial-merge would
      var live = bufs.toBuffer
      while (live.size > 1) {
        val i = rnd.nextInt(live.size)
        val a = live.remove(i)
        val j = rnd.nextInt(live.size)
        live(j).merge(a, m)
      }
      live.head
    }
    import scala.jdk.CollectionConverters._
    for (_ <- 1 to 30) {
      val n = 200 + rnd.nextInt(400)
      val distinct = 5 + rnd.nextInt(20)
      val items = Vector.fill(n)(s"t${rnd.nextInt(distinct)}")
      val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      // random chunking stands in for arbitrary partitioning
      val chunks = items.grouped(1 + rnd.nextInt(80)).toSeq
      // under capacity (m >= distinct): any merge tree must be exact
      val mBig = distinct + rnd.nextInt(10)
      val bufsBig = chunks.map { c =>
        val b = new HeavyHittersBuffer; c.foreach(b.add(_, mBig)); b
      }
      val mergedBig = foldRandom(bufsBig, mBig)
      assert(mergedBig.counts.asScala.map { case (k, v) => k -> v.toLong }.toMap == exact)
      // over capacity: every count within [exact - n/(m+1), exact], and
      // every item above the error bound survives (the MG guarantee,
      // preserved by the mergeable-summaries merge)
      val mSmall = 2 + rnd.nextInt(math.max(1, distinct - 3))
      val bufsSmall = chunks.map { c =>
        val b = new HeavyHittersBuffer; c.foreach(b.add(_, mSmall)); b
      }
      val merged = foldRandom(bufsSmall, mSmall)
      val err = n.toLong / (mSmall + 1)
      merged.counts.asScala.foreach { case (k, c) =>
        assert(c <= exact(k), s"$k overcounted: $c > ${exact(k)}")
        assert(c >= exact(k) - err, s"$k undercount beyond n/(m+1): $c vs ${exact(k)}")
      }
      exact.foreach { case (k, c) =>
        if (c > err) assert(merged.counts.containsKey(k),
          s"$k with count $c > $err must survive")
      }
    }
  }

  test("source overlap: symmetric-free pairs, shared counts bounded by the smaller census") {
    import spark.implicits._
    val out = Dedup.q80SourceOverlap(spark, dir)
    assert(out.columns.toSeq ==
      Seq("src_a", "src_b", "shared_passages", "n_a", "n_b", "jaccard"))
    val rows = out.as[(String, String, Long, Long, Long, Double)].collect()
    rows.foreach { case (a, b, shared, na, nb, j) =>
      assert(a < b, "pairs must be ordered (no symmetric duplicates)")
      assert(shared >= 1 && shared <= math.min(na, nb), s"($a,$b) shared bounds")
      assert(j > 0.0 && j <= 1.0, s"($a,$b) jaccard bounds")
    }
  }

  test("KMV sketches survive a parquet round-trip: persisted per-day sketches merge to the direct answer") {
    import graft.operators.Kmv
    GraftFunctions.register(spark)
    val ev = Queries.events(spark, dir)
      .select(to_date(timestamp_micros(col("ts_us"))).as("day"),
        Kmv.hash60(col("user_id")).as("h"))
    // job 1: per-day sketches, persisted (the reusable rollup artifact)
    val sketchDir = tmpDir("kmv-sketches")
    ev.groupBy(col("day")).agg(Kmv.sketch(col("h")).as("sk"))
      .write.mode("overwrite").parquet(sketchDir)
    // job 2 (fresh lineage): merge the persisted sketches to a range
    // estimate — union + re-take k minima == kmv_sketch over the elements
    val merged = spark.read.parquet(sketchDir)
      .select(explode(col("sk")).as("h"))
      .agg(Kmv.sketch(col("h")).as("sk"))
      .select(Kmv.estimate(size(col("sk")).cast("long"), Kmv.kth(col("sk"))).as("est"))
      .collect()(0).getDouble(0)
    val direct = ev.agg(Kmv.sketch(col("h")).as("sk"))
      .select(Kmv.estimate(size(col("sk")).cast("long"), Kmv.kth(col("sk"))).as("est"))
      .collect()(0).getDouble(0)
    assert(merged == direct, s"persisted-merge $merged != direct $direct")
    val exact = ev.select(col("h")).distinct().count()
    assert(math.abs(merged - exact) / exact < 0.5,
      s"estimate $merged implausible vs exact $exact")
  }

  test("multi-probe IVF recall dominates nprobe=1 rank-for-rank") {
    import spark.implicits._
    val one = Similarity.q38AnnIvf(spark, dir)
      .select("cos").as[Double].collect()
    val multi = Similarity.q82AnnIvfMultiprobe(spark, dir)
      .select("cos").as[Double].collect()
    // probing a superset of cells can only add candidates and improve
    // each ranked position (nprobe=1 may return fewer than k rows when
    // the query's own cell is small)
    assert(multi.length >= one.length)
    one.zip(multi).zipWithIndex.foreach { case ((c1, cm), r) =>
      assert(cm >= c1, s"rank $r: multiprobe $cm < nprobe1 $c1")
    }
  }

  test("driver contract: entry() returns rows and every query has an oracle") {
    assert(SparkEntry.entry(spark).count() > 0, "flagship query must return rows")
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"queries/oracles must pair up; only-query=${q -- o}, only-oracle=${o -- q}")
  }

  test("gap fill: contiguous spine, zero-count gaps, forward-filled values") {
    import spark.implicits._
    val out = graft.operators.ScaleOps.q85GapFill(spark, dir)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out.nonEmpty)
    val days = out.map(_._1)
    assert(days.toSeq == (days.head to days.last).toSeq, "spine must be contiguous")
    out.foreach { case (d, n, filled, gap) =>
      assert(gap == (n == 0L), s"day $d: gap flag must match the zero count")
      assert(!filled.isNaN, s"day $d: forward fill must always produce a value")
    }
    // forward fill: a gap day repeats the previous day's filled value
    out.sliding(2).foreach { case Array((_, _, prevV, _), (d, _, v, gap)) =>
      if (gap) assert(v == prevV, s"gap day $d must carry the last value forward")
    }
  }

  test("cumulative users: monotone, ends at the total distinct count, bounds actives") {
    import spark.implicits._
    val out = graft.operators.ScaleOps.q86CumulativeUsers(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.sliding(2).foreach { case Array((_, _, _, c1), (d, _, _, c2)) =>
      assert(c2 >= c1, s"day $d: cumulative users decreased")
    }
    val total = Queries.events(spark, dir).select("user_id").distinct().count()
    assert(out.last._4 == total, "final cumulative == corpus distinct users")
    out.foreach { case (d, active, newU, cum) =>
      assert(active <= cum, s"day $d: actives exceed cumulative")
      assert(newU <= active, s"day $d: new users exceed actives")
    }
  }

  test("histogram: bins contiguous and exhaustive, counts reconcile with the corpus") {
    import spark.implicits._
    val out = graft.operators.ScaleOps.q89Histogram(spark, dir)
      .as[(Long, Double, Double, Long, Double)].collect()
    assert(out.length == 20, "one row per bin, empty bins included")
    assert(out.map(_._1).toSeq == (0L until 20L).toSeq)
    out.sliding(2).foreach { case Array((_, _, hi1, _, _), (b, lo2, _, _, _)) =>
      assert(math.abs(hi1 - lo2) < 1e-9, s"bin $b: edges must be contiguous")
    }
    val total = Queries.events(spark, dir).count()
    assert(out.map(_._4).sum == total, "bin counts must cover every event")
  }

  test("corr from moments: coefficients bounded, counts reconcile") {
    import spark.implicits._
    val out = graft.operators.ScaleOps.q90CorrMoments(spark, dir)
      .as[(String, Long, Double, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (t, n, _, _, c) =>
      assert(n > 0, s"$t count")
      assert(c.isNaN || (c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9),
        s"$t: correlation $c out of [-1, 1]")
    }
    val total = Queries.events(spark, dir).count()
    assert(out.map(_._2).sum == total, "per-type counts must cover every event")
  }

  test("salted join is row-identical to the plain join and keys on (key, salt)") {
    val fact = Queries.events(spark, dir).select(col("user_id"), col("value"))
    val dim = Queries.t(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_nationkey"))
    val salted = graft.operators.Skew.saltedJoin(fact, dim, "user_id", 8)
      .select("user_id", "value", "c_nationkey")
    val plain = fact.join(dim, Seq("user_id"))
      .select("user_id", "value", "c_nationkey")
    assert(salted.count() == plain.count(), "row multiplicity must be preserved")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join must be multiset-identical to the plain join")
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("_salt"), s"join must key on the salt:\n${p.take(1500)}")
  }

  test("quantized cosine is exact: matches BigDecimal reference on a sample") {
    import spark.implicits._
    val e = Queries.t(spark, dir, "embeddings").limit(3)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    val Seq((_, a), (_, b), _) = e.toSeq.take(3): @unchecked
    def q(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 10000 + 0.5).toLong)
    val (qa, qb) = (q(a), q(b))
    val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
    val na = qa.map(x => x * x).sum; val nb = qb.map(x => x * x).sum
    val want = dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    GraftFunctions.register(spark)
    val got = Similarity.q34EmbeddingNeardup(spark, dir) // exercises same path
    assert(got.columns.toSeq == Seq("label", "i", "j", "cos"))
    assert(!want.isNaN)
  }

  test("q99 custom as-of exec == q19 window composition on testdata") {
    val composed = Queries.q19AsofJoin(spark, dir).collect().map(_.toSeq).toSeq
    val custom = Queries.q99AsofCustom(spark, dir).collect().map(_.toSeq).toSeq
    assert(custom.nonEmpty, "expected matched purchases in testdata")
    assert(custom == composed,
      s"custom exec diverges from the composition: " +
        s"first diff=${custom.zip(composed).find(p => p._1 != p._2)}")
  }

  test("as-of exec == in-memory reference on random corpora incl. string payloads (fuzz)") {
    import spark.implicits._
    val rnd = new scala.util.Random(57)
    for (trial <- 1 to 3) {
      // string payload: a retained-row bug (missing copy() of a reused
      // unsafe buffer) corrupts variable-length fields, not longs
      val leftRows = (0L until 200L).map { i =>
        (i, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong)
      } // (id, key, ts)
      val rightRows = (0L until 150L).map { i =>
        (rnd.nextInt(14).toLong, rnd.nextInt(1000).toLong, s"p${i}_${rnd.nextInt(99)}")
      } // (key, ts, payload) — keys 12/13 never match a left key
      val expected = leftRows.flatMap { case (id, k, ts) =>
        val ms = rightRows.filter(r => r._1 == k && r._2 <= ts)
        if (ms.isEmpty) None
        else {
          val best = ms.maxBy(_._2)
          // mirror the exec's tie rule: latest in (ts, payload-free sort
          // order) — make ties impossible instead (dedupe right on ts)
          Some((id, k, ts, best._2))
        }
      }.sortBy(x => (x._1, x._2))
      // dedupe right (key, ts) so ties cannot make the reference ambiguous
      val rightDedup = rightRows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val expectedD = leftRows.flatMap { case (id, k, ts) =>
        val ms = rightDedup.filter(r => r._1 == k && r._2 <= ts)
        if (ms.isEmpty) None else {
          val best = ms.maxBy(_._2)
          Some((id, k, ts, best._2, best._3))
        }
      }.sortBy(x => (x._1, x._2))
      val l = leftRows.toDF("id", "k", "ts")
      val r = rightDedup.toDF("rk", "rts", "payload")
      val got = graft.plans.AsOf.join(l, r, "k", "rk", "ts", "rts")
        .select("id", "k", "ts", "rts", "payload")
        .orderBy("id", "k")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getLong(3), x.getString(4))).toSeq
      assert(got == expectedD,
        s"trial $trial: first diff=${got.zip(expectedD).find(p => p._1 != p._2)} " +
          s"sizes=${got.size}/${expectedD.size}")
      assert(expected.nonEmpty) // the corpus genuinely exercises matching

      // forward direction + tolerance against the same reference corpus
      val tol = 100L
      val expectedF = leftRows.flatMap { case (id, k, ts) =>
        val ms = rightDedup.filter(r => r._1 == k && r._2 >= ts)
        if (ms.isEmpty) None else {
          val best = ms.minBy(_._2)
          if (best._2 - ts <= tol) Some((id, k, ts, best._2, best._3)) else None
        }
      }.sortBy(x => (x._1, x._2))
      val gotF = graft.plans.AsOf.join(l, r, "k", "rk", "ts", "rts",
          forward = true, tolerance = Some(tol))
        .select("id", "k", "ts", "rts", "payload")
        .orderBy("id", "k")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getLong(3), x.getString(4))).toSeq
      assert(gotF == expectedF,
        s"trial $trial forward: first diff=${gotF.zip(expectedF).find(p => p._1 != p._2)} " +
          s"sizes=${gotF.size}/${expectedF.size}")
    }
    // extreme skew: EVERY row on one key — the whole corpus lands in one
    // co-partition and the merge must stay a single linear pass with the
    // candidate chain advancing correctly over a long same-key run
    val lHot = (0L until 500L).map(i => (i, 1L, i * 3)).toDF("id", "k", "ts")
    val rHot = (0L until 300L).map(i => (1L, i * 5, s"h$i")).toDF("rk", "rts", "payload")
    val gotHot = graft.plans.AsOf.join(lHot, rHot, "k", "rk", "ts", "rts")
      .select("id", "rts").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val wantHot = (0L until 500L).flatMap { i =>
      val ts = i * 3
      val cands = (0L until 300L).map(_ * 5).filter(_ <= ts)
      if (cands.isEmpty) None else Some((i, cands.max))
    }
    assert(gotHot == wantHot, "single-hot-key merge must stay exact")
  }

  test("as-of outer/null-key/composite-key semantics == in-memory reference (fuzz)") {
    import spark.implicits._
    val rnd = new scala.util.Random(91)
    for (trial <- 1 to 3) {
      // ~10% null keys and null timestamps on BOTH sides: SQL semantics say
      // NULL never matches, so null-keyed/null-ts left rows must surface
      // null-extended under outer and vanish under inner
      def mayNull(v: Long): Option[Long] = if (rnd.nextInt(10) == 0) None else Some(v)
      val leftRows = (0L until 200L).map { i =>
        (i, mayNull(rnd.nextInt(12).toLong), mayNull(rnd.nextInt(1000).toLong))
      }
      val rightRows = (0L until 150L).map { i =>
        (mayNull(rnd.nextInt(14).toLong), mayNull(rnd.nextInt(1000).toLong), s"p$i")
      }
      // dedupe right on (key, ts) so ties cannot make the reference ambiguous
      val rightDedup = rightRows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val expected = leftRows.map { case (id, k, ts) =>
        val best = for {
          kk <- k; tt <- ts
          m <- rightDedup
            .filter(r => r._1.contains(kk) && r._2.exists(_ <= tt))
            .maxByOption(_._2.get)
        } yield m
        (id, best.flatMap(_._2), best.map(_._3))
      }.sortBy(_._1)
      val l = leftRows.toDF("id", "k", "ts")
      val r = rightDedup.toDF("rk", "rts", "payload")
      val got = graft.plans.AsOf.join(l, r, "k", "rk", "ts", "rts", outer = true)
        .select("id", "rts", "payload").orderBy("id")
        .collect().map(x => (x.getLong(0),
          if (x.isNullAt(1)) None else Some(x.getLong(1)),
          Option(x.getString(2)))).toSeq
      assert(got.size == leftRows.size,
        s"trial $trial: outer must emit every left row (${got.size}/${leftRows.size})")
      assert(got == expected,
        s"trial $trial outer: first diff=${got.zip(expected).find(p => p._1 != p._2)}")
      // inner over the same corpus = the outer result minus the null-extended rows
      val innerCount = graft.plans.AsOf.join(l, r, "k", "rk", "ts", "rts").count()
      assert(innerCount == expected.count(_._2.nonEmpty),
        s"trial $trial: inner row count must equal outer's matched count")
    }
    // composite (k1, k2) key through the Seq[String] API, fuzzed against
    // the same reference shape
    for (trial <- 1 to 2) {
      val leftRows = (0L until 300L).map { i =>
        (i, rnd.nextInt(5).toLong, rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong)
      }
      val rightRows = (0L until 200L).map { i =>
        (rnd.nextInt(6).toLong, rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong, s"c$i")
      }
      val rightDedup = rightRows.groupBy(r => (r._1, r._2, r._3)).map(_._2.head).toSeq
      val expected = leftRows.flatMap { case (id, k1, k2, ts) =>
        rightDedup.filter(r => r._1 == k1 && r._2 == k2 && r._3 <= ts)
          .maxByOption(_._3).map(m => (id, m._3, m._4))
      }.sortBy(_._1)
      val l = leftRows.toDF("id", "k1", "k2", "ts")
      val r = rightDedup.toDF("rk1", "rk2", "rts", "payload")
      val got = graft.plans.AsOf.join(l, r,
          Seq("k1", "k2"), Seq("rk1", "rk2"), "ts", "rts",
          forward = false, tolerance = None, outer = false)
        .select("id", "rts", "payload").orderBy("id")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSeq
      assert(got == expected,
        s"composite trial $trial: first diff=${got.zip(expected).find(p => p._1 != p._2)} " +
          s"sizes=${got.size}/${expected.size}")
      assert(expected.nonEmpty)
    }
  }

  test("IVF index persists to parquet and probes identically from a fresh lineage") {
    // the index LIFECYCLE a production ANN deployment needs: train once,
    // persist (centroids + assignment), probe later from a cold start —
    // same claim the KMV sketches prove for distinct counts
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("q", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"))
      .withColumn("nq", expr("long_dot(q, q)"))
      .select("vec_id", "label", "q", "nq").localCheckpoint(true)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("q").as("csum"), col("nq").as("nc"))
    val centroids = Similarity.ivfCentroids(e, seeds)
    val assignment = Similarity.assign(e, centroids)
    val idx = tmpDir("ivf-index")
    centroids.write.parquet(s"$idx/centroids")
    assignment.write.parquet(s"$idx/assignment")

    // cold start: everything read back from parquet, no shared lineage
    val assignBack = spark.read.parquet(s"$idx/assignment")
    def probe(assign: org.apache.spark.sql.DataFrame) = {
      val withCid = e.join(assign, Seq("vec_id"))
      val query = withCid.filter(col("vec_id") === 0)
        .select(col("q").as("qq"), col("nq").as("qn"), col("cid").as("qcid"))
      withCid.join(broadcast(query), col("cid") === col("qcid") && col("vec_id") =!= 0)
        .select(col("vec_id"), col("cid"),
          expr("long_dot(q, qq)").as("dot"), col("nq"), col("qn"))
        .withColumn("cos", expr(
          """CASE WHEN nq = 0 OR qn = 0 THEN CAST(0.0 AS DOUBLE)
            |ELSE CAST(dot AS DOUBLE) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(qn AS DOUBLE))) END""".stripMargin))
        .select("vec_id", "cid", "cos")
        .orderBy(col("cos").desc, col("vec_id")).limit(5)
        .collect().map(_.toSeq).toSeq
    }
    assert(probe(assignBack) == probe(assignment),
      "persisted index must probe identically to the in-session index")
    assert(probe(assignBack).nonEmpty)
  }

  test("q100 PSI: identical weeks score exactly 0, a shifted week flags drift") {
    import spark.implicits._
    val weekNs = 7L * 86400L * 1000000000L
    // modern-era instants (≈2025), not weeks 0-2 of 1970: the events
    // loader classifies unannotated INT64 by magnitude, and epoch-adjacent
    // nanos are genuinely indistinguishable from 2008-era micros — real
    // generator data is modern, so the fixture must be too
    val baseWeek = 2869L
    def rows(week: Long, vals: Seq[Double]) = vals.zipWithIndex.map { case (v, i) =>
      (week * 10000 + i, (baseWeek + week) * weekNs + i * 1000000L, 1L, "a", v, "{}")
    }
    val flat = (1 to 100).map(_.toDouble)
    val shifted = (1 to 100).map(i => 90.0 + (i % 10)) // mass into the top bin
    val d = tmpDir("psi-events")
    (rows(0, flat) ++ rows(1, flat) ++ rows(2, shifted))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val out = graft.operators.ScaleOps.q100DriftPsi(spark, d).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(out(baseWeek + 1L) == 0.0,
      s"identical binned distributions must score exactly 0 (smoothing cancels): $out")
    assert(out(baseWeek + 2L) > 0.25,
      s"a mass shift into one bin must flag drift: $out")
  }

  test("q97 semdedup audit matches a brute-force within-bucket removal set") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("q", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"))
      .withColumn("nq", expr("long_dot(q, q)"))
    val e = emb.join(
      Similarity.lshBuckets(spark, dir).select("vec_id", "bucket"), Seq("vec_id"))
    val removed = e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", expr(
        """CASE WHEN a.nq = 0 OR b.nq = 0 THEN CAST(0.0 AS DOUBLE)
          |ELSE CAST(long_dot(a.q, b.q) AS DOUBLE)
          |  / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) END""".stripMargin))
      .filter(col("cos") >= 0.3)
      .select(col("b.vec_id")).distinct().collect().map(_.getLong(0)).toSet
    val out = Similarity.q97SemdedupPrune(spark, dir).collect()
    assert(out.map(_.getLong(2)).sum == removed.size.toLong,
      s"audit n_removed must equal the brute-force removal set (${removed.size})")
    out.foreach(r => assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
      s"kept + removed != total for label ${r.get(0)}"))
    assert(out.map(_.getLong(1)).sum == emb.count(), "audit must cover the corpus")
  }

  test("KMV sketch merge property: sketch of a union == merged part sketches") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // two overlapping halves of a deterministic id stream, hashed like q119
    val ids = (0L until 5000L).toDF("id")
      .withColumn("h", graft.operators.Kmv.hash60(col("id")))
    val partA = ids.filter(col("id") < 3000L)
    val partB = ids.filter(col("id") >= 2000L)
    def sk(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(graft.operators.Kmv.sketch(col("h")).as("sk"))
        .collect()(0).getSeq[Long](0)
    val whole = sk(ids)
    // merge = re-sketch the concatenated part sketches (union + re-take K,
    // exactly how per-day sketches roll up to a date range)
    val merged = sk(
      partA.agg(graft.operators.Kmv.sketch(col("h")).as("sk"))
        .unionByName(partB.agg(graft.operators.Kmv.sketch(col("h")).as("sk")))
        .select(explode(col("sk")).as("h")))
    assert(whole == merged,
      "bottom-K of the union must equal bottom-K of merged part sketches")
    assert(whole.size == graft.operators.Kmv.K && whole == whole.sorted,
      "sketch is the ascending bottom-K")
  }
}
