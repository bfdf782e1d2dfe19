package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-pipeline operators on top of [[Similarity]]'s exact
  * integer-cosine machinery: IVF index health profiling (q114),
  * embedding-space train/eval decontamination (q115), MMR diverse
  * retrieval (q116), product quantization with ADC (q120), the composed
  * IVF+PQ index (q122), and hard-negative mining (q125).
  *
  * Shares [[Similarity]]'s determinism contract: quantized integer vectors,
  * exact integer dots/norms, one IEEE-rounded division per cosine, and
  * nano-int (floor(cos*1e9+0.5)) BIGINT space wherever doubles would be
  * summed — a double sum is partial-order-dependent, a BIGINT sum is not.
  */
object EmbedOps {

  private def dot(a: String, b: String): String = s"long_dot($a, $b)"

  /** Cells for the q114 profile — same K as the q38 IVF index. */
  private val CellK = 8

  /** IVF index health profile (q114): train the q38 index (deterministic
    * integer k-means, seeds = vec_id < [[CellK]], 2 update rounds), assign
    * the corpus, and report per-cell occupancy and centroid-cosine stats —
    * the monitoring query a deployment runs BEFORE trusting partition
    * pruning: a skewed cell breaks the "query scans 1/K of the corpus"
    * bound (one hot cell = one hot partition), and a low mean centroid
    * cosine marks a cell whose members drifted from its centroid (the
    * retrain trigger q88 watches per-vector, aggregated per-cell).
    *
    * Scale shape: k-means is [[Similarity.ivfCentroids]]'s broadcast loop;
    * the profile itself is ONE hash agg over the assignment (K rows out).
    * Mean cosine is summed in nano-int BIGINT space (q100's PSI precedent)
    * — never a double sum whose value depends on partial-agg order.
    */
  def q114IvfCells(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.qvecs(spark, dir).localCheckpoint(true)
    val seeds = e.filter(col("vec_id") < CellK)
      .select(col("vec_id").as("cid"), col("q").as("csum"), col("nq").as("nc"))
    val centroids = Similarity.ivfCentroids(e, seeds)
    Similarity.assignScored(e, centroids)
      .withColumn("nano", expr("CAST(floor(ccos * 1e9 + 0.5) AS BIGINT)"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("nano")).as("snano"), min(col("nano")).as("mnano"))
      .withColumn("avg_ccos",
        round(col("snano").cast("double") / col("n_vecs") / 1e9, 6))
      .withColumn("min_ccos", col("mnano").cast("double") / 1e9)
      .select("cid", "n_vecs", "avg_ccos", "min_ccos")
      .orderBy(col("cid"))
  }

  /** Cosine threshold for the q115 prune — sits inside the synthetic
    * corpus's observed similarity range (q97's rationale: the knob, not the
    * constant, is the operator; CurationStress sweeps q97's identically-
    * shaped τ).
    */
  private val DecontamTau = 0.3

  /** Absolute id ceiling for the q115 synthetic eval split: at most
    * [[EvalIdCap]]/50 = 200 eval vectors at ANY corpus size.
    */
  private val EvalIdCap = 10000L

  /** Embedding-space decontamination (q115): remove from the TRAINING
    * corpus every vector whose cosine to ANY held-out eval vector reaches
    * [[DecontamTau]] — the semantic analog of q52's n-gram decontamination
    * (which only catches verbatim leakage; a paraphrased eval item needs
    * the embedding test). Eval set = vec_id % 50 == 0 AND vec_id <
    * [[EvalIdCap]] — the id ceiling makes the split's size an ABSOLUTE
    * constant (<= 200 rows), not a corpus fraction; a %-only split grows
    * linearly and would eventually overflow the broadcast this operator's
    * scale story depends on (round-7 advice).
    *
    * Scale shape: an eval benchmark is small and FIXED-size (thousands of
    * items) regardless of corpus scale — the fixture now holds that by
    * construction — so the eval side broadcasts and the train side
    * streams through ONE BroadcastNestedLoopJoin LeftSemi — per-row work
    * is |eval| integer dots with early-exit on first match, and nothing
    * corpus-sized shuffles (contrast q97, whose within-corpus pairing
    * needs LSH bucketing because BOTH sides are the corpus). The audit
    * agg mirrors q97's: per label, how much of the train split the prune
    * removes.
    */
  def q115SemanticDecontam(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.qvecs(spark, dir).localCheckpoint(true)
    val isEval = col("vec_id") % 50 === 0 && col("vec_id") < EvalIdCap
    val eval = e.filter(isEval)
      .select(col("q").as("qq"), col("nq").as("qn"))
    val train = e.filter(!isEval)
    val removed = train
      .join(broadcast(eval),
        Similarity.cosCol(dot("q", "qq"), "nq", "qn") >= DecontamTau, "left_semi")
      .select(col("vec_id")).withColumn("rem", lit(1L))
    train.join(removed, Seq("vec_id"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_train"),
        sum(coalesce(col("rem"), lit(0L))).as("n_removed"))
      .withColumn("n_kept", col("n_train") - col("n_removed"))
      .select("label", "n_train", "n_removed", "n_kept")
      .orderBy(col("label"))
  }

  /** Candidate pool / selected-set sizes for q116. */
  private val MmrPool = 20
  private val MmrK = 5

  /** nano-int cosine: floor(cos*1e9 + 0.5) as BIGINT — the summable /
    * comparable integer form of a bit-identical double (q109's idiom).
    */
  private def nanoCos(d: String, na: String, nb: String) =
    expr(s"""CAST(floor((CASE WHEN $na = 0 OR $nb = 0 THEN CAST(0.0 AS DOUBLE)
            |ELSE CAST($d AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE))) END)
            |* 1e9 + 0.5) AS BIGINT)""".stripMargin)

  /** MMR diverse retrieval (q116): maximal-marginal-relevance re-ranking
    * (Carbonell & Goldstein 1998) — greedily pick [[MmrK]] results that
    * balance relevance to the query against redundancy with what's already
    * picked: argmax(rel(c) - max_{s in selected} sim(c, s)), i.e. λ = 1/2
    * up to the monotone 2x scaling, which keeps the WHOLE score in exact
    * nano-int BIGINT space — no float comparison can disagree across
    * engines. A plain top-k returns 5 copies of the same near-duplicate
    * answer; retrieval for RAG and hard-negative mining wants coverage.
    *
    * Scale shape: the corpus-sized work is exactly q35's — one broadcast
    * of the query, one codegen scan, a TakeOrdered for the [[MmrPool]]
    * candidate pool. Everything after operates on the POOL (pool self-join
    * for pairwise sims, then [[MmrK]] greedy rounds of
    * anti-join + max-agg + top-1 on <= pool-sized frames) — cost O(k·M²)
    * on M = pool rows, independent of corpus size. The greedy loop is
    * driver-side control flow over distributed ops, the
    * [[Similarity.ivfCentroids]] precedent; nothing collects.
    */
  def q116MmrDiverse(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.qvecs(spark, dir).localCheckpoint(true)
    val query = e.filter(col("vec_id") === 0)
      .select(col("q").as("qq"), col("nq").as("qn"))
    val cands = e.filter(col("vec_id") =!= 0)
      .join(broadcast(query))
      .withColumn("rel", nanoCos(s"long_dot(q, qq)", "nq", "qn"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(MmrPool)
      .select("vec_id", "q", "nq", "rel")
      .localCheckpoint(true)
    val sims = cands.as("a").join(cands.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        nanoCos("long_dot(a.q, b.q)", "a.nq", "b.nq").as("s"))
      .localCheckpoint(true)
    // greedy: first pick is pure relevance (empty selected set -> maxsim 0)
    var selected = cands.orderBy(col("rel").desc, col("vec_id")).limit(1)
      .select(lit(1).as("step"), col("vec_id"), col("rel"), lit(0L).as("ms"))
      .localCheckpoint(true)
    for (step <- 2 to MmrK) {
      val selIds = selected.select(col("vec_id").as("sid"))
      val msAgg = sims.join(selIds, col("j") === col("sid"))
        .groupBy(col("i")).agg(max(col("s")).as("msv"))
      val pick = cands
        .join(selIds, cands("vec_id") === selIds("sid"), "left_anti")
        .join(msAgg, cands("vec_id") === msAgg("i"), "left")
        .withColumn("ms", coalesce(col("msv"), lit(0L)))
        .withColumn("score", col("rel") - col("ms"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(1)
        .select(lit(step).as("step"), col("vec_id"), col("rel"), col("ms"))
      selected = selected.unionByName(pick).localCheckpoint(true)
    }
    selected
      .select(col("step"), col("vec_id"),
        (col("rel").cast("double") / 1e9).as("rel_cos"),
        (col("ms").cast("double") / 1e9).as("max_sim"))
      .orderBy(col("step"))
  }

  // ------------------------------------------------------------------
  // q120: product quantization + asymmetric distance computation
  // ------------------------------------------------------------------

  /** PQ geometry: 64 dims = [[PqSub]] subspaces x [[PqDim]] dims,
    * [[PqCodes]] codes per subspace -> an 8-byte code per vector (32x
    * smaller than float32, 8x smaller than q69's int8).
    */
  private val PqSub = 8
  private val PqDim = 8
  private val PqCodes = 8

  /** Product-quantized ANN with ADC (q120) — Jégou et al. 2011, the
    * production ANN compression beyond q69's scalar int8: train a
    * per-subspace codebook (integer k-means on L2, seeds = vectors
    * 0..[[PqCodes]]-1's subvectors, one update round), encode every vector
    * as [[PqSub]] one-byte codes, and answer the query through a lookup
    * table of [[PqSub]] x [[PqCodes]] partial dots — per-vector query cost
    * is [[PqSub]] table lookups instead of a 64-dim dot. Output: the ADC
    * top-10 with the exact cosine and absolute error alongside (q69's
    * report shape) — the measurement a pipeline runs before switching its
    * index to PQ codes.
    *
    * Determinism: EVERYTHING through the ADC dot is integer — the L2
    * argmin is ncs - 2·dot (integers; the vector's own norm cancels),
    * centroid means are per-element integer divisions that TRUNCATE
    * toward zero in BOTH engines (Spark's `div` and DuckDB's integer `//`
    * share that semantic — measured, not assumed: -7 // 2 = -3 in DuckDB,
    * not the floored -4), reconstruction norms are Σ|c_s|² by subspace
    * orthogonality, and the ONE float step is the final cosine from
    * identical integers.
    *
    * Scale shape: codebooks are [[PqSub]] x [[PqCodes]] rows (broadcast
    * everywhere — at production 8x256 they still are); training/encoding
    * scans the subvector frame (corpus x [[PqSub]] narrow rows) with
    * map-side-combined aggs; the ADC scan carries (vec_id, 8 codes) — the
    * 32x storage cut IS the 100 TB story, it turns a memory-overflow
    * index into a RAM-resident one.
    */
  /** The corpus as PQ subvector rows: (vec_id, s, qs, nqs) — [[PqSub]]
    * narrow rows per vector, each an [[PqDim]]-dim slice with its integer
    * squared norm. Checkpointed once; codebook training, encoding, and
    * LUT construction all reuse it.
    */
  private[graft] def pqSubvectors(e: DataFrame): DataFrame = e
    .select(col("vec_id"), explode(expr(s"sequence(0, ${PqSub - 1})")).as("s"),
      col("q"))
    .withColumn("qs", expr(s"slice(q, s * $PqDim + 1, $PqDim)"))
    .withColumn("nqs", expr("long_dot(qs, qs)"))
    .select("vec_id", "s", "qs", "nqs")
    .localCheckpoint(true)

  /** Per-subspace argmin-L2 assignment of subvectors to codebook `cb`:
    * |x-c|^2 = nx - 2<x,c> + nc and nx is constant per (vec, s), so the
    * key is ncs - 2*dot, tie -> smallest code — packed into ONE BIGINT
    * (d2 * pack + code, exact while |d2| * pack < 2^63 and code < pack;
    * quantized embeddings keep d2 under ~2^32) so the argmin is a
    * codegen'd `min(BIGINT)` HashAggregate. The struct-min formulation
    * computes the identical winner but min-of-struct is not
    * hash-aggregable — Spark falls back to SortAggregate, a full sort of
    * the |subvectors| x |codes| joined frame (measured 3x the whole
    * training time at the stress SF). floorMod recovers the code for
    * negative d2. The packing factor DERIVES from the caller's code
    * count (next power of two >= codes, floor 512) — a hard-coded 512
    * would silently corrupt both the argmin and the pmod recovery the
    * moment a codebook grows past 512 codes (round-8 advice).
    */
  private[graft] def pqAssign(
      subs: DataFrame, cb: DataFrame, codes: Int = PqCodes): DataFrame = {
    require(codes >= 1 && codes <= (1 << 20),
      s"pqAssign: code count $codes outside [1, 2^20] — the BIGINT packing" +
        " (|d2| * pack + code) would overflow or lose the code bits")
    val pack = math.max(512L, java.lang.Long.highestOneBit(2L * codes - 1))
    subs.join(broadcast(cb), Seq("s"))
      .withColumn("key",
        (col("ncs") - lit(2L) * expr("long_dot(qs, cs)")) * lit(pack) + col("code"))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(col("key")).as("best"))
      .select(col("vec_id"), col("s"), pmod(col("best"), lit(pack)).as("code"))
  }

  /** Train the per-subspace codebook: seeds = vectors 0..[[PqCodes]]-1's
    * subvectors, one integer k-means update round (per-element integer
    * division truncating toward zero — the semantic Spark's `div` and
    * DuckDB's `//` share).
    */
  private[graft] def pqCodebook(
      subs: DataFrame, codes: Int = PqCodes, rounds: Int = 1): DataFrame = {
    var cb = subs.filter(col("vec_id") < codes)
      .select(col("s"), col("vec_id").as("code"), col("qs").as("cs"),
        col("nqs").as("ncs"))
    for (_ <- 1 to rounds)
      cb = subs.join(pqAssign(subs, cb, codes), Seq("vec_id", "s"))
        .select(col("s"), col("code"), posexplode(col("qs")).as(Seq("i", "xi")))
        .groupBy(col("s"), col("code"), col("i"))
        .agg(sum(col("xi")).as("si"), count(lit(1)).as("cnt"))
        .groupBy(col("s"), col("code"))
        .agg(sort_array(collect_list(struct(col("i"), col("si"), col("cnt")))).as("ps"))
        .withColumn("cs",
          expr("transform(ps, p -> p.si div p.cnt)"))
        .withColumn("ncs", expr("long_dot(cs, cs)"))
        .select("s", "code", "cs", "ncs")
        .localCheckpoint(true)
    cb
  }

  /** The query's ADC lookup table: partial dot of query subvector s against
    * every code of subspace s, plus the code's reconstruction norm —
    * [[PqSub]] x [[PqCodes]] rows, broadcast to the code scan.
    */
  private[graft] def pqLut(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.filter(col("vec_id") === 0)
      .select(col("s"), col("qs").as("q0s"))
      .join(cb, Seq("s"))
      .select(col("s"), col("code"), expr("long_dot(q0s, cs)").as("ldot"),
        col("ncs"))

  def q120PqAdc(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.qvecs(spark, dir).localCheckpoint(true)
    val subs = pqSubvectors(e)
    val cb1 = pqCodebook(subs)
    val a1 = pqAssign(subs, cb1)
    val lut = pqLut(subs, cb1)
    val adc = a1.filter(col("vec_id") =!= 0)
      .join(broadcast(lut), Seq("s", "code"))
      .groupBy(col("vec_id"))
      .agg(sum(col("ldot")).as("adot"), sum(col("ncs")).as("nrec"))
    val query = e.filter(col("vec_id") === 0)
      .select(col("q").as("qq"), col("nq").as("qn"))
    adc.join(e.select("vec_id", "q", "nq"), Seq("vec_id"))
      .join(broadcast(query))
      .withColumn("cos_pq", Similarity.cosCol("adot", "qn", "nrec"))
      .withColumn("cos_exact",
        Similarity.cosCol("long_dot(q, qq)", "nq", "qn"))
      .withColumn("abs_err", abs(col("cos_pq") - col("cos_exact")))
      .select("vec_id", "cos_pq", "cos_exact", "abs_err")
      .orderBy(col("cos_pq").desc, col("vec_id"))
      .limit(10)
  }

  /** Cells the composed q122 query probes — q82's multi-probe knob. */
  private val PqProbes = 2

  /** Composed IVF+PQ ANN (q122) — the index a production 100 TB vector
    * store actually serves (Jégou et al. 2011's IVFADC): q38/q82's IVF
    * cell pruning composed with q120's PQ compression. The query (a) ranks
    * the K cell centroids and keeps its [[PqProbes]] nearest (a K-row
    * computation), (b) scans ONLY vectors assigned to those cells —
    * nprobe/K of the corpus via partition pruning when the codes are
    * stored partitioned by cell — and (c) scores each survivor through
    * the ADC lookup table over its [[PqSub]] one-byte codes, never
    * touching the raw vectors. Output: the composed top-10 with the exact
    * cosine and absolute error alongside (q120's report shape), so recall
    * loss from cell pruning and code quantization is measured together.
    *
    * Scale shape: the pruned-scan cost is nprobe/K of the corpus AND each
    * touched row is an 8-byte code instead of a 256-byte vector — the two
    * savings MULTIPLY (probe 2/8 cells x 32x smaller rows = ~128x less
    * data moved than brute force). Per-query joins are all broadcasts
    * ([[PqProbes]] probe rows, [[PqSub]] x [[PqCodes]] LUT rows, one query
    * row); the only corpus-sized work is the one-time index build (IVF
    * k-means + codebook training + encoding), amortized across every
    * query the index serves. Determinism: identical to q120 — everything
    * through the ADC dot is integer; the IVF side is q38's exact integer
    * k-means.
    *
    * Deliberately NON-residual codes (x quantized directly, q120's
    * recipe) to keep the cross-engine oracle exact and single-codebook;
    * the production refinement — residual encoding r = x - mean(cell),
    * which re-spends the code space on within-cell detail, plus an
    * ADC-shortlist exact re-rank sized to probed occupancy — is
    * implemented and MEASURED in `AnnStress pq` (recall@10 1.0 at 1M
    * vectors, 10x smaller stored index; SCALE.md round-8).
    */
  def q122IvfPq(spark: SparkSession, dir: String): DataFrame = {
    val (adc, e, query) = ivfPqAdc(spark, dir)
    adc.join(e.select("vec_id", "q", "nq"), Seq("vec_id"))
      .join(broadcast(query))
      .withColumn("cos_pq", Similarity.cosCol("adot", "qn", "nrec"))
      .withColumn("cos_exact",
        Similarity.cosCol("long_dot(q, qq)", "nq", "qn"))
      .withColumn("abs_err", abs(col("cos_pq") - col("cos_exact")))
      .select("vec_id", "cid", "cos_pq", "cos_exact", "abs_err")
      .orderBy(col("cos_pq").desc, col("vec_id"))
      .limit(10)
  }

  /** The composed index build + pruned ADC scan shared by q122 and q126:
    * returns (adc frame (vec_id, cid, adot, nrec) over the probed cells,
    * the quantized corpus, the one-row query frame).
    */
  private def ivfPqAdc(
      spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val e = Similarity.qvecs(spark, dir).localCheckpoint(true)
    // IVF index: q38's recipe (seeds = vec_id < CellK, 2 integer rounds)
    val seeds = e.filter(col("vec_id") < CellK)
      .select(col("vec_id").as("cid"), col("q").as("csum"), col("nq").as("nc"))
    val centroids = Similarity.ivfCentroids(e, seeds)
    val cells = Similarity.assign(e, centroids)
    // PQ index: q120's codebook + per-vector codes
    val subs = pqSubvectors(e)
    val cb1 = pqCodebook(subs)
    val codes = pqAssign(subs, cb1)
    // query side: probe ranking over K centroids, ADC LUT over the codebook
    val probes = e.filter(col("vec_id") === 0)
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", Similarity.cosCol(dot("q", "csum"), "nq", "nc"))
      .select(col("cid").as("pcid"), col("ccos"))
      .orderBy(col("ccos").desc, col("pcid"))
      .limit(PqProbes)
    val lut = pqLut(subs, cb1)
    // the pruned scan: cell assignment filtered to the probed cells (the
    // partition prune at scale), then codes of the survivors through the
    // broadcast LUT — raw vectors never enter the scored scan
    val probedVecs = cells
      .join(broadcast(probes.select("pcid")), col("cid") === col("pcid"))
      .filter(col("vec_id") =!= 0)
      .select("vec_id", "cid")
    val adc = codes.join(probedVecs, Seq("vec_id"))
      .join(broadcast(lut), Seq("s", "code"))
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum(col("ldot")).as("adot"), sum(col("ncs")).as("nrec"))
    val query = e.filter(col("vec_id") === 0)
      .select(col("q").as("qq"), col("nq").as("qn"))
    (adc, e, query)
  }

  // ------------------------------------------------------------------
  // q128: the MATERIALIZED index — write once partitioned by cell,
  // serve probes from the store with real partition pruning
  // ------------------------------------------------------------------

  /** Per-corpus scratch root for the stored index (q128): keyed by a hash
    * of the corpus dir so sf0.001/sf0.01/sf0.1 runs never collide;
    * overwritten per build. Stands in for the warehouse path a deployment
    * would use — the layout (parquet partitioned by `cid`) is the real
    * thing, only the root is scratch.
    */
  private[graft] def indexRoot(dir: String): String = {
    // the key hashes (corpus dir, layout version): bumping the version
    // when the stored schema changes (v2 added the label attribute)
    // orphans any stale store instead of serving it
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir#v2".getBytes("UTF-8")).take(6)
      .map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_ann_index_$key"
  }

  /** Build q122's IVF+PQ index and PERSIST it in the serving layout:
    * `centroids` (K rows), `codebook` ([[PqSub]] x [[PqCodes]] rows), and
    * `codes` — one row per (vector, subspace) — written `partitionBy("cid")`
    * so each IVF cell is its own directory. That write IS the scale
    * contract q122's scaladoc only described: a probe query filters on
    * `cid` and the scan plans `PartitionFilters`, touching nprobe/K of
    * the directories (and each touched row is a one-byte code, not a
    * 256-byte vector — the two savings multiply). The code-cell join is
    * corpus-sized but one-time: index-build cost, amortized over every
    * query served from the store.
    *
    * Build-once / serve-many: the completed store carries a marker, and
    * later builds for the same (corpus, layout) return the existing root
    * (the `bpeTrained` artifact recipe) — q128 and q133 share one build,
    * as a deployment would. The build is deterministic, so a hit is
    * byte-identical to a rebuild; the lock keeps concurrent first-demands
    * single-writer; [[indexRoot]]'s layout-versioned key orphans stale
    * schemas. Corpus dirs are assumed immutable (testdata contract) —
    * a mutating corpus needs a content-fingerprint key instead.
    */
  private val indexBuildLock = new Object
  private[graft] def buildStoredIndex(spark: SparkSession, dir: String): String =
    indexBuildLock.synchronized {
      val root = indexRoot(dir)
      ArtifactCache.ensure(root, "_BUILT") { staging =>
        buildStoredIndexInto(spark, dir, staging)
      }
    }

  private def buildStoredIndexInto(
      spark: SparkSession, dir: String, root: String): Unit = {
    val e = Similarity.qvecs(spark, dir).localCheckpoint(true)
    val seeds = e.filter(col("vec_id") < CellK)
      .select(col("vec_id").as("cid"), col("q").as("csum"), col("nq").as("nc"))
    val centroids = Similarity.ivfCentroids(e, seeds)
    val cells = Similarity.assign(e, centroids)
    val subs = pqSubvectors(e)
    val cb1 = pqCodebook(subs)
    val codes = pqAssign(subs, cb1)
    centroids.write.mode("overwrite").parquet(s"$root/centroids")
    cb1.write.mode("overwrite").parquet(s"$root/codebook")
    // attribute columns ride the stored codes (here: `label`) — the
    // filtered-search contract (q133): a metadata predicate lands in the
    // SAME scan the cid pruning already narrowed, so the two prunings
    // compose without a join back to the vector store
    codes.join(cells, Seq("vec_id"))
      .join(e.select("vec_id", "label"), Seq("vec_id"))
      .write.partitionBy("cid").mode("overwrite").parquet(s"$root/codes")
  }

  /** Serve a probe query from a stored index root: rank the K stored
    * centroids, collect the [[PqProbes]] winning cids (nprobe literals —
    * bounded driver-side control flow, the PartitionedMirror bounded-
    * listing precedent; the literals are what make the scan prune
    * STATICALLY, before execution), then scan ONLY those cell directories
    * of the code store through the broadcast ADC LUT. Raw vectors are
    * touched solely for the 10-row exact-cosine report column.
    */
  private[graft] def serveFromIndex(
      spark: SparkSession, dir: String, root: String,
      labelFilter: Option[Int] = None): DataFrame = {
    val e = Similarity.qvecs(spark, dir).localCheckpoint(true)
    val query = e.filter(col("vec_id") === 0)
      .select(col("q").as("qq"), col("nq").as("qn"))
    val centroids = spark.read.parquet(s"$root/centroids")
    val probedCids = centroids.crossJoin(broadcast(query))
      .withColumn("ccos", Similarity.cosCol(dot("csum", "qq"), "nc", "qn"))
      .orderBy(col("ccos").desc, col("cid"))
      .limit(PqProbes)
      .select("cid").collect().map(_.getLong(0)).toSeq.sorted
    val codes0 = spark.read.parquet(s"$root/codes")
      .filter(col("cid").isin(probedCids: _*))
      .filter(col("vec_id") =!= 0)
      .withColumn("cid", col("cid").cast("long"))
    // metadata predicate INSIDE the pruned scan: directory pruning (cid)
    // and row-group pushdown (label) compose in one FileSourceScan
    val codes = labelFilter.fold(codes0)(l => codes0.filter(col("label") === l))
    val lut = pqLut(pqSubvectors(e.filter(col("vec_id") === 0)),
      spark.read.parquet(s"$root/codebook"))
    val adc = codes.join(broadcast(lut), Seq("s", "code"))
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum(col("ldot")).as("adot"), sum(col("ncs")).as("nrec"))
    adc.join(e.select("vec_id", "q", "nq"), Seq("vec_id"))
      .join(broadcast(query))
      .withColumn("cos_pq", Similarity.cosCol("adot", "qn", "nrec"))
      .withColumn("cos_exact",
        Similarity.cosCol("long_dot(q, qq)", "nq", "qn"))
      .withColumn("abs_err", abs(col("cos_pq") - col("cos_exact")))
      .select("vec_id", "cid", "cos_pq", "cos_exact", "abs_err")
      .orderBy(col("cos_pq").desc, col("vec_id"))
      .limit(10)
  }

  /** Materialized, partition-pruned ANN index serving (q128): build the
    * q122 index ONCE into the stored layout ([[buildStoredIndex]]), then
    * answer the probe entirely from the store ([[serveFromIndex]]) — the
    * same top-10 as q122 (same oracle), but with the "scan nprobe/K of
    * the corpus" claim enforced by the PLANNER: the codes scan carries
    * `PartitionFilters: [cid IN (...)]` and reads nprobe directories
    * (plan-asserted in PlanContractSpec). This is the shape a 100 TB
    * deployment runs — the index is a table on disk serving many
    * queries, not a per-query in-flight build; q128 pays the build in
    * the same run only because the bench contract is self-contained.
    */
  def q128IvfPqServed(spark: SparkSession, dir: String): DataFrame =
    serveFromIndex(spark, dir, buildStoredIndex(spark, dir))

  /** The q133 metadata predicate: serve the top-k among vectors whose
    * stored `label` equals this value.
    */
  private val FilterLabel = 1

  /** Filtered (hybrid) vector search (q133): the production query shape
    * "nearest neighbors WHERE label = X" — a metadata predicate composed
    * with the ANN probe. Served from the same stored index as q128, with
    * the label column riding the codes table, so the predicate evaluates
    * INSIDE the cid-pruned scan: PartitionFilters narrows to nprobe
    * directories, PushedFilters narrows to matching row groups, and only
    * surviving code rows reach the ADC aggregation (plan-asserted in
    * PlanContractSpec).
    *
    * The alternative — post-filtering an unfiltered top-k — is WRONG at
    * low selectivity (a top-10 of the whole corpus may contain zero
    * label-X rows even when thousands exist); pre-filtering inside the
    * probe keeps recall governed by nprobe alone, independent of the
    * predicate's selectivity. Scale shape identical to q128: per-query
    * cost is nprobe directories of 1-byte codes (now further cut by the
    * predicate), all joins broadcast.
    */
  def q133FilteredAnn(spark: SparkSession, dir: String): DataFrame =
    serveFromIndex(spark, dir, buildStoredIndex(spark, dir),
      labelFilter = Some(FilterLabel))

  /** Queries in the q145 served batch (vec_id < this); the corpus is the
    * rest.
    */
  private val ServeBatch = 5L

  /** Per-query result depth for q145. */
  private val ServeK = 5

  /** Batch serving from the stored index (q145): q109's throughput story
    * composed with q128's materialized store — B queries answered in ONE
    * pass over the stored IVF+PQ index. Per query the centroid ranking
    * keeps [[PqProbes]] cells (a B x K computation); the scan then prunes
    * to the UNION of all probed cells, so directory reads the queries
    * share are paid once — batching amortizes exactly the IO that
    * dominates serving (with B queries and heavy probe overlap the
    * per-query cost approaches (union size)/B directories). Scoring is
    * code-only ADC through a broadcast B x [[PqSub]] x [[PqCodes]]-row
    * LUT; per-query ranking is the mergeable `top_k_by` (nano-int cosine,
    * ties vec_id) — no corpus-sized sort or window, raw vectors never
    * read. This is the offline-retrieval shape (hard-negative mining,
    * RAG indexing) run the way a deployment runs it: against the stored
    * index, not an in-flight build.
    */
  def q145BatchServedAnn(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val root = buildStoredIndex(spark, dir)
    val e = Similarity.qvecs(spark, dir).localCheckpoint(true)
    val queries = e.filter(col("vec_id") < ServeBatch)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("nq").as("qn"))
      .localCheckpoint(true)
    val centroids = spark.read.parquet(s"$root/centroids")
    val probes = centroids.crossJoin(broadcast(queries))
      .withColumn("ccos", Similarity.cosCol(dot("csum", "qq"), "nc", "qn"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("ccos").desc, col("cid"))))
      .filter(col("rn") <= PqProbes)
      .select(col("qid"), col("cid").as("pcid"))
      .localCheckpoint(true)
    // nprobe x B literals -> the scan prunes STATICALLY to the union of
    // probed directories (the q128 bounded-action precedent)
    val probedCids = probes.select("pcid").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    val codes = spark.read.parquet(s"$root/codes")
      .filter(col("cid").isin(probedCids: _*))
      .filter(col("vec_id") >= ServeBatch)
      .withColumn("cid", col("cid").cast("long"))
    val lut = pqSubvectors(e.filter(col("vec_id") < ServeBatch))
      .select(col("vec_id").as("qid"), col("s"), col("qs").as("q0s"))
      .join(spark.read.parquet(s"$root/codebook"), Seq("s"))
      .select(col("qid"), col("s"), col("code"),
        expr("long_dot(q0s, cs)").as("ldot"), col("ncs"))
    codes.join(broadcast(probes), col("cid") === col("pcid"))
      .join(broadcast(lut), Seq("qid", "s", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("ldot")).as("adot"), sum(col("ncs")).as("nrec"))
      .join(broadcast(queries.select("qid", "qn")), Seq("qid"))
      .withColumn("cos_pq", Similarity.cosCol("adot", "qn", "nrec"))
      .withColumn("ncos", expr("CAST(floor(cos_pq * 1e9 + 0.5) AS BIGINT)"))
      .groupBy(col("qid"))
      .agg(expr(s"top_k_by(vec_id, ncos, $ServeK)").as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rnk"),
        col("hit.v").as("vec_id"),
        (col("hit.c").cast("double") / 1e9).as("cos_pq"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Embedding dimension count used by the q153 footprint model (the
    * 4/1/1 byte widths per float32 / int8 / PQ code are the literals in
    * the footprint expression itself).
    */
  private val Dim = 64

  /** ANN storage footprint model (q153): logical bytes per index
    * representation at the CURRENT corpus size — float32 raw vectors,
    * per-vector-scaled int8 (q69), and PQ codes (q120/q122) with their
    * [[CellK]]-centroid + [[PqSub]]x[[PqCodes]] codebook overheads —
    * each with its compression ratio vs raw. This is the capacity-
    * planning arithmetic behind every storage decision this engine's
    * ANN family encodes: at 100 TB of raw float32, int8 is 25 TB and PQ
    * codes are ~3 TB + constant overheads, which decides what fits in
    * executor storage memory. Counts come from the corpus (one count
    * plus constants), so the model re-prices itself per corpus snapshot.
    */
  def q153IndexFootprint(spark: SparkSession, dir: String): DataFrame = {
    val n = Queries.t(spark, dir, "embeddings").agg(count(lit(1)).as("n"))
    n.select(
      expr(s"""stack(5,
        |  'raw_f32',   n, n * ${Dim}L * 4L,
        |  'int8',      n, n * ${Dim}L * 1L,
        |  'pq_codes',  n, n * ${PqSub}L * 1L,
        |  'centroids', ${CellK}L, ${CellK}L * ${Dim}L * 8L,
        |  'codebook',  ${PqSub}L * ${PqCodes}L,
        |    ${PqSub}L * ${PqCodes}L * ${PqDim}L * 8L)
        |AS (component, n_rows, bytes_logical)""".stripMargin))
      .crossJoin(broadcast(n.select(col("n").as("nn"))))
      .withColumn("ratio_vs_raw",
        round(col("bytes_logical").cast("double") /
          (col("nn") * Dim * 4L).cast("double"), 6))
      .select("component", "n_rows", "bytes_logical", "ratio_vs_raw")
      .orderBy(col("component"))
  }

  /** q141 split trigger, as a percentage of mean occupancy: a cell holding
    * more than [[SplitPct]]% of the mean is split. A deployment tunes this
    * against its probe-latency SLO (the knob is the operator; 110 makes
    * the fixture exercise the split path — at 2x mean the synthetic
    * corpus's near-uniform cells never split and the query would only
    * ever demonstrate the no-op branch).
    */
  private val SplitPct = 110

  /** IVF cell-split maintenance (q141): the rebalancing half of the index
    * lifecycle — q114 DETECTS the hot cell that breaks the "probe scans
    * nprobe/K of the corpus" bound; this query FIXES it. Each cell whose
    * occupancy exceeds [[SplitPct]]% of the mean is split by a
    * deterministic 2-means step (seeds = the cell's min/max vec_id
    * members; each member routes to its higher-cosine seed, ties to part
    * 0), and the report is the resulting cell table: per surviving cell
    * its parent, part, occupancy, and whether it came from a split — the
    * exact table a deployment turns into the next index version's
    * partition layout (the `AnnStream` v2-swap precedent consumes it).
    *
    * Scale shape (100 TB): occupancy census and oversized detection are
    * K-row aggregates; split seeds are one min/max agg over the oversized
    * cells' members; the re-assignment touches ONLY oversized cells'
    * rows (partition-pruned reads when the codes are stored by cid —
    * q128's layout), each against a broadcast 2-row seed table. Cost is
    * proportional to the hot cells being fixed, not the corpus.
    */
  def q141CellSplit(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.qvecs(spark, dir).localCheckpoint(true)
    val seeds = e.filter(col("vec_id") < CellK)
      .select(col("vec_id").as("cid"), col("q").as("csum"), col("nq").as("nc"))
    val centroids = Similarity.ivfCentroids(e, seeds)
    val cells = Similarity.assign(e, centroids).localCheckpoint(true)
    val occ = cells.groupBy(col("cid")).agg(count(lit(1)).as("occ"))
      .localCheckpoint(true)
    val tot = cells.agg(count(lit(1)).as("n"))
    val oversized = occ.crossJoin(broadcast(tot))
      .filter(col("occ") * CellK * 100 > col("n") * SplitPct)
      .select("cid")
    val splitSeeds = cells.join(broadcast(oversized), Seq("cid"))
      .groupBy(col("cid"))
      .agg(min(col("vec_id")).as("s0"), max(col("vec_id")).as("s1"))
    val seedVecs = splitSeeds
      .join(e.select(col("vec_id").as("s0"), col("q").as("q0"),
        col("nq").as("n0")), Seq("s0"))
      .join(e.select(col("vec_id").as("s1"), col("q").as("q1"),
        col("nq").as("n1")), Seq("s1"))
      .select("cid", "q0", "n0", "q1", "n1")
    val splitParts = e.join(cells, Seq("vec_id"))
      .join(broadcast(seedVecs), Seq("cid"))
      .withColumn("cos0", Similarity.cosCol(dot("q", "q0"), "nq", "n0"))
      .withColumn("cos1", Similarity.cosCol(dot("q", "q1"), "nq", "n1"))
      .withColumn("part",
        when(col("cos0") >= col("cos1"), 0L).otherwise(1L))
      .groupBy(col("cid"), col("part"))
      .agg(count(lit(1)).as("occupancy"))
      .withColumn("was_split", lit(1L))
    val unsplit = occ.join(oversized, Seq("cid"), "left_anti")
      .select(col("cid"), lit(0L).as("part"), col("occ").as("occupancy"),
        lit(0L).as("was_split"))
    splitParts.select("cid", "part", "occupancy", "was_split")
      .unionByName(unsplit)
      .orderBy(col("cid"), col("part"))
  }

  /** Floor of the q126 re-rank shortlist — the depth a near-empty probe
    * still re-ranks.
    */
  private val RerankFloor = 20L

  /** Occupancy fraction of the probed cells kept in the shortlist:
    * R = max(floor, probed / [[RerankDiv]]).
    */
  private val RerankDiv = 8L

  /** The re-rank depth rule, ONE copy shared by the engine query (q126)
    * and the AnnStress harness: R scales with probed-cell occupancy
    * because ADC error is a constant-width band around the true cosine —
    * a FIXED R keeps a constant-count shortlist while the number of
    * within-band impostors grows linearly with occupancy. Measured
    * (AnnStress pq, SCALE.md round-8): fixed R=500 gave recall@10 1.0 at
    * 100k vectors but 0.5 at 1M; R = probed/8 restored 1.0 at both.
    */
  private[graft] def rerankDepth(probed: Long, floor: Long = RerankFloor): Int =
    math.max(floor, probed / RerankDiv).toInt

  /** IVF+PQ with exact re-rank (q126) — the COMPLETE production serving
    * path: q122's cell-pruned code-only ADC scan produces an R-row
    * shortlist, and only those R rows read their raw vectors back for an
    * exact-cosine re-rank of the final top-10. This is the step that
    * makes PQ deployable when code quantization error approaches the
    * within-cell similarity spread — measured in `AnnStress pq`: ADC-only
    * recall@10 was 0.1 at 1M vectors, shortlist + re-rank restored 1.0
    * while reading raw vectors for only the shortlist. Output ranks by
    * the EXACT cosine (ties vec_id), with the ADC estimate alongside.
    *
    * R is NOT a constant: it follows [[rerankDepth]]'s occupancy scaling
    * (probed rows / [[RerankDiv]], floor [[RerankFloor]]) — the AnnStress
    * 1M-vector finding promoted into the engine path. The probed count is
    * one COUNT action over the already-pruned ADC frame (one BIGINT to
    * the driver at plan time — Spark's `limit` takes a literal; the
    * bounded-action precedent is the PartitionedMirror bucket listing),
    * and the frame is checkpointed so count and shortlist share one
    * computation.
    *
    * Scale shape: everything through the shortlist is q122's (broadcast
    * probes + LUT, code-only rows); the re-rank joins the R-row shortlist
    * against the vector store — R is nprobe/K x corpus / [[RerankDiv]]
    * rows, the same fraction the probe itself already scans, never the
    * corpus.
    */
  def q126IvfPqRerank(spark: SparkSession, dir: String): DataFrame = {
    val (adc0, e, query) = ivfPqAdc(spark, dir)
    val adc = adc0.localCheckpoint(true)
    val r = rerankDepth(adc.count())
    val shortlist = adc
      .join(broadcast(query.select("qn")))
      .withColumn("cos_pq", Similarity.cosCol("adot", "qn", "nrec"))
      .orderBy(col("cos_pq").desc, col("vec_id"))
      .limit(r)
      .select("vec_id", "cid", "cos_pq")
    shortlist.join(e.select("vec_id", "q", "nq"), Seq("vec_id"))
      .join(broadcast(query))
      .withColumn("cos_exact",
        Similarity.cosCol("long_dot(q, qq)", "nq", "qn"))
      .select("vec_id", "cid", "cos_pq", "cos_exact")
      .orderBy(col("cos_exact").desc, col("vec_id"))
      .limit(10)
  }

  // ------------------------------------------------------------------
  // q129: RESIDUAL product quantization — the production encoding
  // ------------------------------------------------------------------

  /** Residual IVF+PQ with ADC (q129) — the encoding a deployed IVFADC
    * index actually ships (Jégou et al. 2011 §III): codes quantize the
    * RESIDUAL r = x − mean(cell) instead of x itself, re-spending the
    * whole code space on within-cell detail. q122 deliberately encodes x
    * directly and documents why; `AnnStress pq` then measured what that
    * costs at scale — non-residual ADC ranking collapses inside a cell
    * once quantization error reaches the within-cell similarity spread
    * (recall@10 0.6 at 100k vectors), while residual encoding restores
    * 1.0 at a 10x smaller stored index. This query promotes the measured
    * winner from the stress harness into the oracle-checked engine path.
    *
    * The reconstruction is x̂ = cm(cell) + r̂, so the ADC cosine needs
    * three integer tables instead of q120's one:
    * dot(q, x̂) = dot(q, cm) + Σ_s dot(q_s, ĉ_s)          (qcm + LUT)
    * |x̂|²     = |cm|² + 2·Σ_s dot(cm_s, ĉ_s) + Σ_s |ĉ_s|²  (cdot table)
    * — every term exact integer arithmetic (cell means are truncating
    * integer divisions, the semantic Spark's `div` and DuckDB's `//`
    * share), one IEEE division at the end, so the oracle reproduces the
    * doubles bit-for-bit.
    *
    * Scale shape: identical to q122 — the residual subtraction is one
    * zip_with against a BROADCAST K-row mean table inside the (one-time,
    * amortized) encode pass; at query time the extra cdot/qcm tables are
    * nprobe x [[PqSub]] x [[PqCodes]] and nprobe rows, broadcast like the
    * LUT. The scored scan still touches only probed-cell code rows.
    */
  def q129IvfPqResidual(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.qvecs(spark, dir).localCheckpoint(true)
    val seeds = e.filter(col("vec_id") < CellK)
      .select(col("vec_id").as("cid"), col("q").as("csum"), col("nq").as("nc"))
    val centroids = Similarity.ivfCentroids(e, seeds)
    val cells = Similarity.assign(e, centroids).localCheckpoint(true)
    // integer cell means from the SUM centroids + occupancy counts
    val cmean = centroids
      .join(cells.groupBy(col("cid")).agg(count(lit(1)).as("cn")), Seq("cid"))
      .withColumn("cm", expr("transform(csum, x -> x div cn)"))
      .withColumn("ncm", expr("long_dot(cm, cm)"))
      .select("cid", "cm", "ncm")
      .localCheckpoint(true)
    val resid = e.join(cells, Seq("vec_id")).join(broadcast(cmean), Seq("cid"))
      .withColumn("q", expr("zip_with(q, cm, (a, b) -> a - b)"))
      .select("vec_id", "q")
    val rsubs = pqSubvectors(resid)
    val rcb = pqCodebook(rsubs)
    val rcodes = pqAssign(rsubs, rcb)
    val probes = centroids.crossJoin(broadcast(
        e.filter(col("vec_id") === 0).select(col("q").as("qq"), col("nq").as("qn"))))
      .withColumn("ccos", Similarity.cosCol(dot("csum", "qq"), "nc", "qn"))
      .orderBy(col("ccos").desc, col("cid"))
      .limit(PqProbes)
      .select("cid")
    // the three broadcast ADC tables
    val lut = pqLut(pqSubvectors(e.filter(col("vec_id") === 0)), rcb)
    val cms = cmean.join(broadcast(probes), Seq("cid"))
      .select(col("cid"), explode(expr(s"sequence(0, ${PqSub - 1})")).as("s"),
        col("cm"))
      .withColumn("cms", expr(s"slice(cm, s * $PqDim + 1, $PqDim)"))
    val cdot = cms.join(rcb, Seq("s"))
      .select(col("cid"), col("s"), col("code"),
        expr("long_dot(cms, cs)").as("cdot"))
    val qcm = cmean.join(broadcast(probes), Seq("cid"))
      .crossJoin(broadcast(
        e.filter(col("vec_id") === 0).select(col("q").as("qq"))))
      .select(col("cid"), col("ncm"), expr("long_dot(qq, cm)").as("qdotcm"))
    val probedVecs = cells.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= 0)
      .select("vec_id", "cid")
    val adc = rcodes.join(probedVecs, Seq("vec_id"))
      .join(broadcast(lut), Seq("s", "code"))
      .join(broadcast(cdot), Seq("cid", "s", "code"))
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum(col("ldot")).as("rdot"), sum(col("cdot")).as("crec"),
        sum(col("ncs")).as("nrs"))
    adc.join(broadcast(qcm), Seq("cid"))
      .withColumn("adot", col("qdotcm") + col("rdot"))
      .withColumn("nrec", col("ncm") + lit(2L) * col("crec") + col("nrs"))
      .join(e.select("vec_id", "q", "nq"), Seq("vec_id"))
      .join(broadcast(
        e.filter(col("vec_id") === 0).select(col("q").as("qq"), col("nq").as("qn"))))
      .withColumn("cos_pq", Similarity.cosCol("adot", "qn", "nrec"))
      .withColumn("cos_exact", Similarity.cosCol("long_dot(q, qq)", "nq", "qn"))
      .withColumn("abs_err", abs(col("cos_pq") - col("cos_exact")))
      .select("vec_id", "cid", "cos_pq", "cos_exact", "abs_err")
      .orderBy(col("cos_pq").desc, col("vec_id"))
      .limit(10)
  }

  /** Anchor batch size / negatives per anchor / false-negative ceiling
    * for q125.
    */
  private val NegAnchors = 10
  private val NegK = 5
  private val FnTau = 0.35

  /** Hard-negative mining (q125): for each anchor in a batch, the [[NegK]]
    * most-similar vectors with a DIFFERENT label — the negatives that
    * actually teach a contrastive embedding model (random negatives are
    * too easy; the loss gradient lives near the decision boundary). The
    * standard false-negative guard is part of the operator: a cross-label
    * candidate at cosine >= [[FnTau]] is more likely a MISLABELED
    * near-duplicate than a hard negative (SimCSE/DPR mining practice) and
    * is excluded in-scan, so the miner never ships poison pairs to the
    * trainer.
    *
    * Scale shape: q109's retrieval frame with the label-mismatch predicate
    * pushed into the broadcast join and the FN ceiling into the scan
    * filter — one broadcast of [[NegAnchors]] anchor rows, one codegen
    * pass over the corpus, per-anchor ranking via the mergeable BIGINT
    * `top_k_by` (<= k entries per anchor per partition before the one
    * exchange). No window, no product, nothing corpus-sized moves.
    */
  def q125HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.qvecs(spark, dir).localCheckpoint(true)
    val anchors = e.filter(col("vec_id") < NegAnchors)
      .select(col("vec_id").as("aid"), col("label").as("alabel"),
        col("q").as("aq"), col("nq").as("an"))
    e.filter(col("vec_id") >= NegAnchors)
      .join(broadcast(anchors), col("label") =!= col("alabel"))
      .withColumn("cos", Similarity.cosCol(dot("q", "aq"), "nq", "an"))
      .filter(col("cos") < FnTau)
      .withColumn("ncos", expr("CAST(floor(cos * 1e9 + 0.5) AS BIGINT)"))
      .groupBy(col("aid"))
      .agg(expr(s"top_k_by(vec_id, ncos, $NegK)").as("top"))
      .select(col("aid"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("aid"), (col("pos") + 1).cast("long").as("rnk"),
        col("hit.v").as("neg_id"),
        (col("hit.c").cast("double") / 1e9).as("cos"))
      .orderBy(col("aid"), col("rnk"))
  }

  // ------------------------------------------------------------------
  // Oracles
  // ------------------------------------------------------------------

  import Similarity.{qCte, cosSql, assignCte, updateCte}

  val oracles: Map[String, String] = Map(
    "q114_ivf_cells" ->
      s"""WITH $qCte,
        |pos AS (
        |  SELECT vec_id, g.i AS i, q[g.i] AS qi
        |  FROM e, generate_series(1, 64) AS g(i)),
        |cent0 AS (SELECT vec_id AS cid, q AS csum, CAST(nq AS BIGINT) AS nc
        |          FROM e WHERE vec_id < $CellK),
        |${assignCte("a1", "cent0")},
        |${updateCte("s1", "cent1", "a1")},
        |${assignCte("a2", "cent1")},
        |${updateCte("s2", "cent2", "a2")},
        |scored AS (
        |  SELECT vec_id, cid, ccos FROM (
        |    SELECT e.vec_id, c.cid,
        |      ${cosSql("list_dot_product(e.q, c.csum)", "e.nq", "c.nc")} AS ccos,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        ${cosSql("list_dot_product(e.q, c.csum)", "e.nq", "c.nc")} DESC,
        |        c.cid) AS rn
        |    FROM e, cent2 c) WHERE rn = 1),
        |nano AS (SELECT cid, CAST(floor(ccos * 1e9 + 0.5) AS BIGINT) AS nano
        |         FROM scored),
        |agg AS (SELECT cid, count(*) AS n_vecs, sum(nano) AS snano,
        |               min(nano) AS mnano
        |        FROM nano GROUP BY cid)
        |SELECT cid, n_vecs,
        |  round(CAST(snano AS DOUBLE) / n_vecs / 1e9, 6) AS avg_ccos,
        |  CAST(mnano AS DOUBLE) / 1e9 AS min_ccos
        |FROM agg ORDER BY cid""".stripMargin,

    "q153_index_footprint" ->
      s"""WITH n AS (SELECT count(*) AS n FROM embeddings),
        |c AS (
        |  SELECT 'raw_f32' AS component, n AS n_rows,
        |         CAST(n * ${Dim}::BIGINT * 4 AS BIGINT) AS bytes_logical FROM n
        |  UNION ALL SELECT 'int8', n, CAST(n * ${Dim}::BIGINT AS BIGINT) FROM n
        |  UNION ALL SELECT 'pq_codes', n, CAST(n * ${PqSub}::BIGINT AS BIGINT) FROM n
        |  UNION ALL SELECT 'centroids', ${CellK}::BIGINT,
        |    CAST(${CellK}::BIGINT * ${Dim} * 8 AS BIGINT) FROM n
        |  UNION ALL SELECT 'codebook', ${PqSub}::BIGINT * ${PqCodes},
        |    CAST(${PqSub}::BIGINT * ${PqCodes} * ${PqDim} * 8 AS BIGINT) FROM n)
        |SELECT c.component, CAST(c.n_rows AS BIGINT) AS n_rows, c.bytes_logical,
        |  round(CAST(c.bytes_logical AS DOUBLE)
        |    / CAST(n.n * ${Dim}::BIGINT * 4 AS DOUBLE), 6) AS ratio_vs_raw
        |FROM c, n ORDER BY component""".stripMargin,

    "q145_batch_served_ann" ->
      s"""WITH $qCte,
        |pos AS (
        |  SELECT vec_id, g.i AS i, q[g.i] AS qi
        |  FROM e, generate_series(1, 64) AS g(i)),
        |cent0 AS (SELECT vec_id AS cid, q AS csum, CAST(nq AS BIGINT) AS nc
        |          FROM e WHERE vec_id < $CellK),
        |${assignCte("a1", "cent0")},
        |${updateCte("s1", "cent1", "a1")},
        |${assignCte("a2", "cent1")},
        |${updateCte("s2", "cent2", "a2")},
        |${assignCte("af", "cent2")},
        |qs5 AS (SELECT vec_id AS qid, q AS qq, CAST(nq AS BIGINT) AS qn
        |        FROM e WHERE vec_id < $ServeBatch),
        |pr AS (
        |  SELECT qs5.qid, c.cid,
        |    row_number() OVER (PARTITION BY qs5.qid ORDER BY
        |      ${cosSql("list_dot_product(qs5.qq, c.csum)", "qs5.qn", "c.nc")} DESC,
        |      c.cid) AS rn
        |  FROM qs5, cent2 c),
        |probes AS (SELECT qid, cid FROM pr WHERE rn <= $PqProbes),
        |sub2 AS (SELECT vec_id, s, qs,
        |    CAST(list_dot_product(qs, qs) AS BIGINT) AS nqs
        |  FROM (SELECT vec_id, g.s AS s,
        |          q[g.s * $PqDim + 1 : g.s * $PqDim + $PqDim] AS qs
        |        FROM e, generate_series(0, ${PqSub - 1}) AS g(s))),
        |pcb0 AS (SELECT s, vec_id AS code, qs AS cs, nqs AS ncs
        |         FROM sub2 WHERE vec_id < $PqCodes),
        |pa0 AS (SELECT vec_id, s, code FROM (
        |  SELECT sub2.vec_id, sub2.s, c.code,
        |    row_number() OVER (PARTITION BY sub2.vec_id, sub2.s
        |      ORDER BY c.ncs - 2 * list_dot_product(sub2.qs, c.cs), c.code) AS rn
        |  FROM sub2 JOIN pcb0 c ON sub2.s = c.s) WHERE rn = 1),
        |ppos AS (SELECT vec_id, s, g.i AS i, qs[g.i] AS xi
        |         FROM sub2, generate_series(1, $PqDim) AS g(i)),
        |ps1 AS (SELECT pa0.s, pa0.code, ppos.i, CAST(sum(ppos.xi) AS BIGINT) AS si,
        |          count(*) AS cnt
        |        FROM ppos JOIN pa0 ON ppos.vec_id = pa0.vec_id AND ppos.s = pa0.s
        |        GROUP BY 1, 2, 3),
        |pcb1 AS (SELECT s, code, list(si // cnt ORDER BY i) AS cs,
        |           CAST(sum((si // cnt) * (si // cnt)) AS BIGINT) AS ncs
        |         FROM ps1 GROUP BY s, code),
        |pa1 AS (SELECT vec_id, s, code FROM (
        |  SELECT sub2.vec_id, sub2.s, c.code,
        |    row_number() OVER (PARTITION BY sub2.vec_id, sub2.s
        |      ORDER BY c.ncs - 2 * list_dot_product(sub2.qs, c.cs), c.code) AS rn
        |  FROM sub2 JOIN pcb1 c ON sub2.s = c.s) WHERE rn = 1),
        |lut AS (SELECT q.vec_id AS qid, c.s, c.code,
        |          CAST(list_dot_product(q.qs, c.cs) AS BIGINT) AS ldot, c.ncs
        |        FROM pcb1 c JOIN sub2 q ON c.s = q.s
        |        WHERE q.vec_id < $ServeBatch),
        |adc AS (SELECT p.qid, pa1.vec_id, CAST(sum(l.ldot) AS BIGINT) AS adot,
        |          CAST(sum(l.ncs) AS BIGINT) AS nrec
        |        FROM pa1 JOIN af ON pa1.vec_id = af.vec_id
        |             JOIN probes p ON af.cid = p.cid
        |             JOIN lut l ON l.qid = p.qid AND pa1.s = l.s
        |                      AND pa1.code = l.code
        |        WHERE pa1.vec_id >= $ServeBatch
        |        GROUP BY p.qid, pa1.vec_id),
        |res AS (SELECT adc.qid, adc.vec_id,
        |    CAST(floor((${cosSql("adc.adot", "q.qn", "adc.nrec")}) * 1e9 + 0.5)
        |      AS BIGINT) AS ncos
        |  FROM adc JOIN qs5 q ON adc.qid = q.qid),
        |ranked AS (SELECT qid, vec_id, ncos,
        |    row_number() OVER (PARTITION BY qid ORDER BY ncos DESC, vec_id) AS rnk
        |  FROM res)
        |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id,
        |  CAST(ncos AS DOUBLE) / 1e9 AS cos_pq
        |FROM ranked WHERE rnk <= $ServeK ORDER BY qid, rnk""".stripMargin,

    "q141_cell_split" ->
      s"""WITH $qCte,
        |pos AS (
        |  SELECT vec_id, g.i AS i, q[g.i] AS qi
        |  FROM e, generate_series(1, 64) AS g(i)),
        |cent0 AS (SELECT vec_id AS cid, q AS csum, CAST(nq AS BIGINT) AS nc
        |          FROM e WHERE vec_id < $CellK),
        |${assignCte("a1", "cent0")},
        |${updateCte("s1", "cent1", "a1")},
        |${assignCte("a2", "cent1")},
        |${updateCte("s2", "cent2", "a2")},
        |${assignCte("af", "cent2")},
        |occ AS (SELECT cid, count(*) AS occ FROM af GROUP BY cid),
        |tot AS (SELECT count(*) AS n FROM af),
        |osz AS (SELECT occ.cid FROM occ, tot
        |        WHERE occ.occ * $CellK * 100 > tot.n * $SplitPct),
        |ss AS (SELECT af.cid, min(af.vec_id) AS s0, max(af.vec_id) AS s1
        |       FROM af JOIN osz ON af.cid = osz.cid GROUP BY af.cid),
        |sv AS (SELECT ss.cid, e0.q AS q0, e0.nq AS n0, e1.q AS q1, e1.nq AS n1
        |       FROM ss JOIN e e0 ON e0.vec_id = ss.s0
        |            JOIN e e1 ON e1.vec_id = ss.s1),
        |parts AS (
        |  SELECT af.cid,
        |    CASE WHEN ${cosSql("list_dot_product(e.q, sv.q0)", "e.nq", "sv.n0")}
        |      >= ${cosSql("list_dot_product(e.q, sv.q1)", "e.nq", "sv.n1")}
        |    THEN 0 ELSE 1 END AS part
        |  FROM e JOIN af ON e.vec_id = af.vec_id JOIN sv ON af.cid = sv.cid),
        |sp AS (SELECT cid, CAST(part AS BIGINT) AS part,
        |         count(*) AS occupancy, CAST(1 AS BIGINT) AS was_split
        |       FROM parts GROUP BY cid, part),
        |un AS (SELECT occ.cid, CAST(0 AS BIGINT) AS part,
        |         occ.occ AS occupancy, CAST(0 AS BIGINT) AS was_split
        |       FROM occ WHERE occ.cid NOT IN (SELECT cid FROM osz))
        |SELECT cid, part, occupancy, was_split
        |FROM (SELECT * FROM sp UNION ALL SELECT * FROM un)
        |ORDER BY cid, part""".stripMargin,

    "q115_semantic_decontam" ->
      s"""WITH $qCte,
        |ev AS (SELECT q AS qq, nq AS qn FROM e
        |       WHERE vec_id % 50 = 0 AND vec_id < $EvalIdCap),
        |tr AS (SELECT * FROM e
        |       WHERE NOT (vec_id % 50 = 0 AND vec_id < $EvalIdCap)),
        |removed AS (
        |  SELECT DISTINCT tr.vec_id
        |  FROM tr, ev
        |  WHERE ${cosSql("list_dot_product(tr.q, ev.qq)", "tr.nq", "ev.qn")}
        |    >= $DecontamTau)
        |SELECT tr.label AS label, count(*) AS n_train,
        |  CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  count(*) - CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM tr LEFT JOIN removed r ON tr.vec_id = r.vec_id
        |GROUP BY tr.label ORDER BY label""".stripMargin,

    "q120_pq_adc" ->
      s"""WITH $qCte,
        |sub AS (
        |  SELECT vec_id, g.s AS s, q[g.s * $PqDim + 1 : g.s * $PqDim + $PqDim] AS qs
        |  FROM e, generate_series(0, ${PqSub - 1}) AS g(s)),
        |sub2 AS (SELECT vec_id, s, qs,
        |  CAST(list_dot_product(qs, qs) AS BIGINT) AS nqs FROM sub),
        |cb0 AS (SELECT s, vec_id AS code, qs AS cs, nqs AS ncs
        |        FROM sub2 WHERE vec_id < $PqCodes),
        |a0 AS (SELECT vec_id, s, code FROM (
        |  SELECT sub2.vec_id, sub2.s, c.code,
        |    row_number() OVER (PARTITION BY sub2.vec_id, sub2.s
        |      ORDER BY c.ncs - 2 * list_dot_product(sub2.qs, c.cs), c.code) AS rn
        |  FROM sub2 JOIN cb0 c ON sub2.s = c.s) WHERE rn = 1),
        |pos AS (SELECT vec_id, s, g.i AS i, qs[g.i] AS xi
        |        FROM sub2, generate_series(1, $PqDim) AS g(i)),
        |s1 AS (SELECT a0.s, a0.code, pos.i, CAST(sum(pos.xi) AS BIGINT) AS si,
        |         count(*) AS cnt
        |       FROM pos JOIN a0 ON pos.vec_id = a0.vec_id AND pos.s = a0.s
        |       GROUP BY 1, 2, 3),
        |cb1 AS (SELECT s, code, list(si // cnt ORDER BY i) AS cs,
        |          CAST(sum((si // cnt) * (si // cnt)) AS BIGINT) AS ncs
        |        FROM s1 GROUP BY s, code),
        |a1 AS (SELECT vec_id, s, code FROM (
        |  SELECT sub2.vec_id, sub2.s, c.code,
        |    row_number() OVER (PARTITION BY sub2.vec_id, sub2.s
        |      ORDER BY c.ncs - 2 * list_dot_product(sub2.qs, c.cs), c.code) AS rn
        |  FROM sub2 JOIN cb1 c ON sub2.s = c.s) WHERE rn = 1),
        |q0 AS (SELECT s, qs FROM sub2 WHERE vec_id = 0),
        |lut AS (SELECT c.s, c.code,
        |          CAST(list_dot_product(q0.qs, c.cs) AS BIGINT) AS ldot, c.ncs
        |        FROM cb1 c JOIN q0 ON c.s = q0.s),
        |adc AS (SELECT a1.vec_id, CAST(sum(l.ldot) AS BIGINT) AS adot,
        |          CAST(sum(l.ncs) AS BIGINT) AS nrec
        |        FROM a1 JOIN lut l ON a1.s = l.s AND a1.code = l.code
        |        WHERE a1.vec_id <> 0 GROUP BY a1.vec_id),
        |qv AS (SELECT q AS qq, nq AS qn FROM e WHERE vec_id = 0),
        |res AS (
        |  SELECT adc.vec_id,
        |    ${cosSql("adc.adot", "qv.qn", "adc.nrec")} AS cos_pq,
        |    ${cosSql("list_dot_product(e.q, qv.qq)", "e.nq", "qv.qn")} AS cos_exact
        |  FROM adc JOIN e ON adc.vec_id = e.vec_id, qv)
        |SELECT vec_id, cos_pq, cos_exact, abs(cos_pq - cos_exact) AS abs_err
        |FROM res ORDER BY cos_pq DESC, vec_id LIMIT 10""".stripMargin,

    "q125_hard_negatives" ->
      s"""WITH $qCte,
        |anchors AS (SELECT vec_id AS aid, label AS alabel, q AS aq,
        |              nq AS an
        |            FROM e WHERE vec_id < $NegAnchors),
        |scored AS (
        |  SELECT a.aid, e.vec_id,
        |    ${cosSql("list_dot_product(e.q, a.aq)", "e.nq", "a.an")} AS cos
        |  FROM e JOIN anchors a ON e.label <> a.alabel
        |  WHERE e.vec_id >= $NegAnchors),
        |kept AS (SELECT aid, vec_id,
        |           CAST(floor(cos * 1e9 + 0.5) AS BIGINT) AS ncos
        |         FROM scored WHERE cos < $FnTau),
        |ranked AS (
        |  SELECT aid, vec_id, ncos,
        |    row_number() OVER (PARTITION BY aid ORDER BY ncos DESC, vec_id)
        |      AS rnk
        |  FROM kept)
        |SELECT aid, rnk, vec_id AS neg_id, CAST(ncos AS DOUBLE) / 1e9 AS cos
        |FROM ranked WHERE rnk <= $NegK ORDER BY aid, rnk""".stripMargin,

    "q122_ivf_pq" -> ivfPqOracleSql,

    // q128 serves the SAME answer as q122 from the materialized index —
    // one oracle, two engine paths (in-flight build vs stored serving)
    "q128_ivf_pq_served" -> ivfPqOracleSql,

    // same composed index, restricted to the label predicate — the
    // filtered-search semantics: rank among matching vectors, then top-10
    "q133_filtered_ann" -> ivfPqOracle(s"WHERE label = $FilterLabel"),

    "q126_ivf_pq_rerank" -> rerankOracleSql,

    "q129_ivf_pq_residual" ->
      s"""WITH $qCte,
        |pos AS (
        |  SELECT vec_id, g.i AS i, q[g.i] AS qi
        |  FROM e, generate_series(1, 64) AS g(i)),
        |cent0 AS (SELECT vec_id AS cid, q AS csum, CAST(nq AS BIGINT) AS nc
        |          FROM e WHERE vec_id < $CellK),
        |${assignCte("a1", "cent0")},
        |${updateCte("s1", "cent1", "a1")},
        |${assignCte("a2", "cent1")},
        |${updateCte("s2", "cent2", "a2")},
        |${assignCte("af", "cent2")},
        |cnt AS (SELECT cid, count(*) AS cn FROM af GROUP BY cid),
        |cmean AS (SELECT c.cid, [x // n.cn FOR x IN c.csum] AS cm
        |          FROM cent2 c JOIN cnt n ON c.cid = n.cid),
        |cmean2 AS (SELECT cid, cm,
        |             CAST(list_dot_product(cm, cm) AS BIGINT) AS ncm
        |           FROM cmean),
        |rv AS (SELECT e.vec_id,
        |         [e.q[i] - m.cm[i] FOR i IN generate_series(1, 64)] AS rq
        |       FROM e JOIN af USING (vec_id) JOIN cmean2 m ON af.cid = m.cid),
        |rsub2 AS (SELECT vec_id, s, qs,
        |    CAST(list_dot_product(qs, qs) AS BIGINT) AS nqs
        |  FROM (SELECT vec_id, g.s AS s,
        |          rq[g.s * $PqDim + 1 : g.s * $PqDim + $PqDim] AS qs
        |        FROM rv, generate_series(0, ${PqSub - 1}) AS g(s))),
        |rcb0 AS (SELECT s, vec_id AS code, qs AS cs, nqs AS ncs
        |         FROM rsub2 WHERE vec_id < $PqCodes),
        |ra0 AS (SELECT vec_id, s, code FROM (
        |  SELECT rsub2.vec_id, rsub2.s, c.code,
        |    row_number() OVER (PARTITION BY rsub2.vec_id, rsub2.s
        |      ORDER BY c.ncs - 2 * list_dot_product(rsub2.qs, c.cs), c.code) AS rn
        |  FROM rsub2 JOIN rcb0 c ON rsub2.s = c.s) WHERE rn = 1),
        |rpos AS (SELECT vec_id, s, g.i AS i, qs[g.i] AS xi
        |         FROM rsub2, generate_series(1, $PqDim) AS g(i)),
        |rs1 AS (SELECT ra0.s, ra0.code, rpos.i, CAST(sum(rpos.xi) AS BIGINT) AS si,
        |          count(*) AS cnt
        |        FROM rpos JOIN ra0 ON rpos.vec_id = ra0.vec_id AND rpos.s = ra0.s
        |        GROUP BY 1, 2, 3),
        |rcb1 AS (SELECT s, code, list(si // cnt ORDER BY i) AS cs,
        |           CAST(sum((si // cnt) * (si // cnt)) AS BIGINT) AS ncs
        |         FROM rs1 GROUP BY s, code),
        |ra1 AS (SELECT vec_id, s, code FROM (
        |  SELECT rsub2.vec_id, rsub2.s, c.code,
        |    row_number() OVER (PARTITION BY rsub2.vec_id, rsub2.s
        |      ORDER BY c.ncs - 2 * list_dot_product(rsub2.qs, c.cs), c.code) AS rn
        |  FROM rsub2 JOIN rcb1 c ON rsub2.s = c.s) WHERE rn = 1),
        |qv AS (SELECT q AS qq, nq AS qn FROM e WHERE vec_id = 0),
        |pr AS (
        |  SELECT c.cid,
        |    row_number() OVER (ORDER BY
        |      ${cosSql("list_dot_product(qv.qq, c.csum)", "qv.qn", "c.nc")} DESC,
        |      c.cid) AS rn
        |  FROM qv, cent2 c),
        |qsub AS (SELECT g.s AS s, q[g.s * $PqDim + 1 : g.s * $PqDim + $PqDim] AS qs
        |         FROM e, generate_series(0, ${PqSub - 1}) AS g(s)
        |         WHERE vec_id = 0),
        |lut AS (SELECT c.s, c.code,
        |          CAST(list_dot_product(q0.qs, c.cs) AS BIGINT) AS ldot, c.ncs
        |        FROM rcb1 c JOIN qsub q0 ON c.s = q0.s),
        |cms AS (SELECT m.cid, g.s AS s,
        |          m.cm[g.s * $PqDim + 1 : g.s * $PqDim + $PqDim] AS cms
        |        FROM cmean2 m, generate_series(0, ${PqSub - 1}) AS g(s)
        |        WHERE m.cid IN (SELECT cid FROM pr WHERE rn <= $PqProbes)),
        |cd AS (SELECT cms.cid, cms.s, c.code,
        |         CAST(list_dot_product(cms.cms, c.cs) AS BIGINT) AS cdot
        |       FROM cms JOIN rcb1 c ON cms.s = c.s),
        |qcm AS (SELECT m.cid, m.ncm,
        |          CAST(list_dot_product(qv.qq, m.cm) AS BIGINT) AS qdotcm
        |        FROM cmean2 m, qv
        |        WHERE m.cid IN (SELECT cid FROM pr WHERE rn <= $PqProbes)),
        |adc AS (SELECT ra1.vec_id, af.cid,
        |          CAST(sum(l.ldot) AS BIGINT) AS rdot,
        |          CAST(sum(cd.cdot) AS BIGINT) AS crec,
        |          CAST(sum(l.ncs) AS BIGINT) AS nrs
        |        FROM ra1 JOIN lut l ON ra1.s = l.s AND ra1.code = l.code
        |             JOIN af ON ra1.vec_id = af.vec_id
        |             JOIN cd ON cd.cid = af.cid AND cd.s = ra1.s
        |                    AND cd.code = ra1.code
        |        WHERE ra1.vec_id <> 0
        |          AND af.cid IN (SELECT cid FROM pr WHERE rn <= $PqProbes)
        |        GROUP BY ra1.vec_id, af.cid),
        |res AS (
        |  SELECT adc.vec_id, adc.cid,
        |    ${cosSql("(qc.qdotcm + adc.rdot)", "qv.qn",
                      "(qc.ncm + 2 * adc.crec + adc.nrs)")} AS cos_pq,
        |    ${cosSql("list_dot_product(e.q, qv.qq)", "e.nq", "qv.qn")} AS cos_exact
        |  FROM adc JOIN qcm qc ON adc.cid = qc.cid
        |       JOIN e ON adc.vec_id = e.vec_id, qv)
        |SELECT vec_id, cid, cos_pq, cos_exact,
        |  abs(cos_pq - cos_exact) AS abs_err
        |FROM res ORDER BY cos_pq DESC, vec_id LIMIT 10""".stripMargin,
  ) ++ mmrOracle

  /** q122/q128's shared oracle: the composed IVF+PQ top-10. */
  private lazy val ivfPqOracleSql: String = ivfPqOracle("")

  /** The composed IVF+PQ oracle, optionally restricted by a final WHERE
    * over `res` (q133 injects the label predicate; q122/q128 pass none).
    */
  private def ivfPqOracle(labelWhere: String): String =
      s"""WITH $qCte,
        |pos AS (
        |  SELECT vec_id, g.i AS i, q[g.i] AS qi
        |  FROM e, generate_series(1, 64) AS g(i)),
        |cent0 AS (SELECT vec_id AS cid, q AS csum, CAST(nq AS BIGINT) AS nc
        |          FROM e WHERE vec_id < $CellK),
        |${assignCte("a1", "cent0")},
        |${updateCte("s1", "cent1", "a1")},
        |${assignCte("a2", "cent1")},
        |${updateCte("s2", "cent2", "a2")},
        |${assignCte("af", "cent2")},
        |qv AS (SELECT q AS qq, nq AS qn FROM e WHERE vec_id = 0),
        |pr AS (
        |  SELECT c.cid,
        |    row_number() OVER (ORDER BY
        |      ${cosSql("list_dot_product(qv.qq, c.csum)", "qv.qn", "c.nc")} DESC,
        |      c.cid) AS rn
        |  FROM qv, cent2 c),
        |sub2 AS (SELECT vec_id, s, qs,
        |    CAST(list_dot_product(qs, qs) AS BIGINT) AS nqs
        |  FROM (SELECT vec_id, g.s AS s,
        |          q[g.s * $PqDim + 1 : g.s * $PqDim + $PqDim] AS qs
        |        FROM e, generate_series(0, ${PqSub - 1}) AS g(s))),
        |pcb0 AS (SELECT s, vec_id AS code, qs AS cs, nqs AS ncs
        |         FROM sub2 WHERE vec_id < $PqCodes),
        |pa0 AS (SELECT vec_id, s, code FROM (
        |  SELECT sub2.vec_id, sub2.s, c.code,
        |    row_number() OVER (PARTITION BY sub2.vec_id, sub2.s
        |      ORDER BY c.ncs - 2 * list_dot_product(sub2.qs, c.cs), c.code) AS rn
        |  FROM sub2 JOIN pcb0 c ON sub2.s = c.s) WHERE rn = 1),
        |ppos AS (SELECT vec_id, s, g.i AS i, qs[g.i] AS xi
        |         FROM sub2, generate_series(1, $PqDim) AS g(i)),
        |ps1 AS (SELECT pa0.s, pa0.code, ppos.i, CAST(sum(ppos.xi) AS BIGINT) AS si,
        |          count(*) AS cnt
        |        FROM ppos JOIN pa0 ON ppos.vec_id = pa0.vec_id AND ppos.s = pa0.s
        |        GROUP BY 1, 2, 3),
        |pcb1 AS (SELECT s, code, list(si // cnt ORDER BY i) AS cs,
        |           CAST(sum((si // cnt) * (si // cnt)) AS BIGINT) AS ncs
        |         FROM ps1 GROUP BY s, code),
        |pa1 AS (SELECT vec_id, s, code FROM (
        |  SELECT sub2.vec_id, sub2.s, c.code,
        |    row_number() OVER (PARTITION BY sub2.vec_id, sub2.s
        |      ORDER BY c.ncs - 2 * list_dot_product(sub2.qs, c.cs), c.code) AS rn
        |  FROM sub2 JOIN pcb1 c ON sub2.s = c.s) WHERE rn = 1),
        |q0 AS (SELECT s, qs FROM sub2 WHERE vec_id = 0),
        |lut AS (SELECT c.s, c.code,
        |          CAST(list_dot_product(q0.qs, c.cs) AS BIGINT) AS ldot, c.ncs
        |        FROM pcb1 c JOIN q0 ON c.s = q0.s),
        |adc AS (SELECT pa1.vec_id, af.cid, CAST(sum(l.ldot) AS BIGINT) AS adot,
        |          CAST(sum(l.ncs) AS BIGINT) AS nrec
        |        FROM pa1 JOIN lut l ON pa1.s = l.s AND pa1.code = l.code
        |             JOIN af ON pa1.vec_id = af.vec_id
        |        WHERE pa1.vec_id <> 0
        |          AND af.cid IN (SELECT cid FROM pr WHERE rn <= $PqProbes)
        |        GROUP BY pa1.vec_id, af.cid),
        |res AS (
        |  SELECT adc.vec_id, adc.cid, e.label,
        |    ${cosSql("adc.adot", "qv.qn", "adc.nrec")} AS cos_pq,
        |    ${cosSql("list_dot_product(e.q, qv.qq)", "e.nq", "qv.qn")} AS cos_exact
        |  FROM adc JOIN e ON adc.vec_id = e.vec_id, qv)
        |SELECT vec_id, cid, cos_pq, cos_exact,
        |  abs(cos_pq - cos_exact) AS abs_err
        |FROM res $labelWhere ORDER BY cos_pq DESC, vec_id LIMIT 10""".stripMargin

  /** q126's oracle: the shortlist + exact re-rank. */
  private lazy val rerankOracleSql: String =
      s"""WITH $qCte,
        |pos AS (
        |  SELECT vec_id, g.i AS i, q[g.i] AS qi
        |  FROM e, generate_series(1, 64) AS g(i)),
        |cent0 AS (SELECT vec_id AS cid, q AS csum, CAST(nq AS BIGINT) AS nc
        |          FROM e WHERE vec_id < $CellK),
        |${assignCte("a1", "cent0")},
        |${updateCte("s1", "cent1", "a1")},
        |${assignCte("a2", "cent1")},
        |${updateCte("s2", "cent2", "a2")},
        |${assignCte("af", "cent2")},
        |qv AS (SELECT q AS qq, nq AS qn FROM e WHERE vec_id = 0),
        |pr AS (
        |  SELECT c.cid,
        |    row_number() OVER (ORDER BY
        |      ${cosSql("list_dot_product(qv.qq, c.csum)", "qv.qn", "c.nc")} DESC,
        |      c.cid) AS rn
        |  FROM qv, cent2 c),
        |sub2 AS (SELECT vec_id, s, qs,
        |    CAST(list_dot_product(qs, qs) AS BIGINT) AS nqs
        |  FROM (SELECT vec_id, g.s AS s,
        |          q[g.s * $PqDim + 1 : g.s * $PqDim + $PqDim] AS qs
        |        FROM e, generate_series(0, ${PqSub - 1}) AS g(s))),
        |pcb0 AS (SELECT s, vec_id AS code, qs AS cs, nqs AS ncs
        |         FROM sub2 WHERE vec_id < $PqCodes),
        |pa0 AS (SELECT vec_id, s, code FROM (
        |  SELECT sub2.vec_id, sub2.s, c.code,
        |    row_number() OVER (PARTITION BY sub2.vec_id, sub2.s
        |      ORDER BY c.ncs - 2 * list_dot_product(sub2.qs, c.cs), c.code) AS rn
        |  FROM sub2 JOIN pcb0 c ON sub2.s = c.s) WHERE rn = 1),
        |ppos AS (SELECT vec_id, s, g.i AS i, qs[g.i] AS xi
        |         FROM sub2, generate_series(1, $PqDim) AS g(i)),
        |ps1 AS (SELECT pa0.s, pa0.code, ppos.i, CAST(sum(ppos.xi) AS BIGINT) AS si,
        |          count(*) AS cnt
        |        FROM ppos JOIN pa0 ON ppos.vec_id = pa0.vec_id AND ppos.s = pa0.s
        |        GROUP BY 1, 2, 3),
        |pcb1 AS (SELECT s, code, list(si // cnt ORDER BY i) AS cs,
        |           CAST(sum((si // cnt) * (si // cnt)) AS BIGINT) AS ncs
        |         FROM ps1 GROUP BY s, code),
        |pa1 AS (SELECT vec_id, s, code FROM (
        |  SELECT sub2.vec_id, sub2.s, c.code,
        |    row_number() OVER (PARTITION BY sub2.vec_id, sub2.s
        |      ORDER BY c.ncs - 2 * list_dot_product(sub2.qs, c.cs), c.code) AS rn
        |  FROM sub2 JOIN pcb1 c ON sub2.s = c.s) WHERE rn = 1),
        |q0 AS (SELECT s, qs FROM sub2 WHERE vec_id = 0),
        |lut AS (SELECT c.s, c.code,
        |          CAST(list_dot_product(q0.qs, c.cs) AS BIGINT) AS ldot, c.ncs
        |        FROM pcb1 c JOIN q0 ON c.s = q0.s),
        |adc AS (SELECT pa1.vec_id, af.cid, CAST(sum(l.ldot) AS BIGINT) AS adot,
        |          CAST(sum(l.ncs) AS BIGINT) AS nrec
        |        FROM pa1 JOIN lut l ON pa1.s = l.s AND pa1.code = l.code
        |             JOIN af ON pa1.vec_id = af.vec_id
        |        WHERE pa1.vec_id <> 0
        |          AND af.cid IN (SELECT cid FROM pr WHERE rn <= $PqProbes)
        |        GROUP BY pa1.vec_id, af.cid),
        |rr AS (SELECT greatest($RerankFloor, count(*) // $RerankDiv) AS r
        |       FROM adc),
        |sl AS (
        |  SELECT vec_id, cid, cos_pq FROM (
        |    SELECT adc.vec_id, adc.cid,
        |      ${cosSql("adc.adot", "qv.qn", "adc.nrec")} AS cos_pq,
        |      row_number() OVER (ORDER BY
        |        ${cosSql("adc.adot", "qv.qn", "adc.nrec")} DESC,
        |        adc.vec_id) AS rn
        |    FROM adc, qv), rr WHERE rn <= rr.r)
        |SELECT sl.vec_id, sl.cid, sl.cos_pq,
        |  ${cosSql("list_dot_product(e.q, qv.qq)", "e.nq", "qv.qn")} AS cos_exact
        |FROM sl JOIN e ON sl.vec_id = e.vec_id, qv
        |ORDER BY cos_exact DESC, sl.vec_id LIMIT 10""".stripMargin

  // the greedy selection is a recursive CTE over the candidate pool;
  // sims are a per-candidate list indexed by candidate RANK so the
  // recursive term needs only list lookups (DuckDB disallows aggregates
  // in the recursive part; list_max over a lambda is the workaround)
  private lazy val mmrOracle: Map[String, String] = Map(
    "q116_mmr_diverse" ->
      s"""WITH RECURSIVE $qCte,
        |query AS (SELECT q AS qq, nq AS qn FROM e WHERE vec_id = 0),
        |scored AS (
        |  SELECT e.vec_id, e.q, e.nq,
        |    CAST(floor((${cosSql("list_dot_product(e.q, query.qq)", "e.nq", "query.qn")})
        |      * 1e9 + 0.5) AS BIGINT) AS rel
        |  FROM e, query WHERE e.vec_id <> 0),
        |cands AS (
        |  SELECT row_number() OVER (ORDER BY rel DESC, vec_id) AS r,
        |    vec_id, q, nq, rel
        |  FROM scored ORDER BY rel DESC, vec_id LIMIT $MmrPool),
        |cs AS (
        |  SELECT a.r, a.vec_id, a.rel,
        |    list(CAST(floor((${cosSql("list_dot_product(a.q, b.q)", "a.nq", "b.nq")})
        |      * 1e9 + 0.5) AS BIGINT) ORDER BY b.r) AS sims
        |  FROM cands a JOIN cands b ON true GROUP BY a.r, a.vec_id, a.rel),
        |sel AS (
        |  SELECT 0 AS step, CAST([] AS BIGINT[]) AS ids,
        |    CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS BIGINT) AS rel,
        |    CAST(NULL AS BIGINT) AS ms
        |  UNION ALL
        |  SELECT sel.step + 1, list_append(sel.ids, p.r), p.vec_id, p.rel, p.ms
        |  FROM sel, LATERAL (
        |    SELECT c.r, c.vec_id, c.rel,
        |      coalesce(list_max(list_transform(sel.ids, s -> c.sims[s])), 0) AS ms
        |    FROM cs c
        |    WHERE NOT list_contains(sel.ids, c.r)
        |    ORDER BY c.rel - coalesce(list_max(list_transform(sel.ids, s -> c.sims[s])), 0) DESC,
        |      c.vec_id
        |    LIMIT 1) p
        |  WHERE sel.step < $MmrK)
        |SELECT step, vec_id, CAST(rel AS DOUBLE) / 1e9 AS rel_cos,
        |  CAST(ms AS DOUBLE) / 1e9 AS max_sim
        |FROM sel WHERE step >= 1 ORDER BY step""".stripMargin,
  )

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q114_ivf_cells" -> (q114IvfCells _),
    "q141_cell_split" -> (q141CellSplit _),
    "q145_batch_served_ann" -> (q145BatchServedAnn _),
    "q153_index_footprint" -> (q153IndexFootprint _),
    "q115_semantic_decontam" -> (q115SemanticDecontam _),
    "q116_mmr_diverse" -> (q116MmrDiverse _),
    "q120_pq_adc" -> (q120PqAdc _),
    "q122_ivf_pq" -> (q122IvfPq _),
    "q125_hard_negatives" -> (q125HardNegatives _),
    "q126_ivf_pq_rerank" -> (q126IvfPqRerank _),
    "q128_ivf_pq_served" -> (q128IvfPqServed _),
    "q129_ivf_pq_residual" -> (q129IvfPqResidual _),
    "q133_filtered_ann" -> (q133FilteredAnn _),
  )
}
