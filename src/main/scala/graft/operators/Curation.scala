package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators over the `documents` table — the
  * pipeline stages a 100 TB pretraining-data build runs after dedup
  * ([[Dedup]]) and quality scoring ([[TextAnalysis]]): near-duplicate
  * CLUSTERING (not just pairs), stratified sampling, benchmark
  * decontamination, sequence packing, chunking, vocabulary extraction, and
  * intra-document repetition scoring.
  *
  * Same determinism contract as the rest of the surface: md5 for all
  * hashing (identical hex in Spark and DuckDB), integer arithmetic for all
  * thresholds, exact double division of integer counts, total ORDER BY.
  */
object Curation {

  /** Positional word n-grams from the `toks` column (empty when the doc has
    * fewer than `n` tokens) — the codegen [[graft.functions.WordNgrams]]
    * expression, same rationale as [[Dedup.shingleExpr]].
    */
  private def wordNgramExpr(n: Int): Column = expr(s"word_ngrams(toks, $n)")

  /** DuckDB equivalent of [[wordNgramExpr]] (expects `text` in scope;
    * DuckDB lists are 1-indexed).
    */
  private def wordNgramSql(n: Int): String = {
    val parts = (0 until n).map(k => s"string_split(text,' ')[i+$k]")
      .mkString(" || ' ' || ")
    s"[$parts for i in generate_series(1, len(string_split(text,' ')) - ${n - 1})]"
  }

  private def docs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // word_ngrams
    Queries.t(spark, dir, "documents")
  }

  // ------------------------------------------------------------------
  // q50: near-duplicate CLUSTERS (connected components over the pair graph)
  // ------------------------------------------------------------------

  /** Connected components over the Jaccard>=0.8 near-dup pair graph (q31),
    * one row per cluster with its canonical keep (= min doc_id), size, and
    * member list. Pair lists alone under-serve a dedup pipeline: A~B and
    * B~C must collapse to ONE survivor even when A~C was never emitted.
    *
    * Algorithm: min-label propagation — every node starts labeled with its
    * own id; each round takes the min over its neighborhood; fixpoint =
    * components. Rounds = graph diameter, and near-dup clusters are
    * near-cliques (every member overlaps most others), so 2-3 rounds close
    * in practice. The per-round work is one equi-join + hash-agg on the
    * EDGE list only — at 100 TB that is the standard shape (alternating
    * large-star/small-star contraction would cut worst-case rounds to
    * O(log n) for chain-shaped graphs; near-dup graphs are not
    * chain-shaped). Convergence is tested on sum(label), which is
    * monotonically non-increasing and cheap.
    */
  def q50DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // kmv_sketch member sample
    clusterSummary(clusterLabelsCached(spark, dir))
  }

  /** Min-label propagation over an (i, j) pair list — the (doc_id, lbl)
    * component labeling shared by q50's rollup and q92's survivor
    * selection.
    */
  private def clusterLabels(pairs: DataFrame): DataFrame =
    clusterLabelsWithRounds(pairs)._1

  /** Compute-once / consume-many component labels for a corpus dir: the
    * Jaccard>=0.8 near-dup components over `documents`, persisted to a
    * corpus-keyed parquet scratch on first demand (the [[graft.operators
    * .TextAnalysis.bpeTrained]] artifact recipe applied to dedup
    * clustering). q50's rollup, q92's survivor selection, and q131's
    * split assignment all consume the SAME labeling — the production
    * shape: clustering runs once per corpus snapshot, every downstream
    * curation step reads the labels table. Labeling is deterministic, so
    * a cache hit is byte-identical to a recompute; the lock + marker keep
    * concurrent first-demands single-writer, and the key hashes the
    * corpus dir (assumed immutable, as with the BPE artifact — mutable
    * corpora must key on a content fingerprint instead).
    */
  private val clusterLabelLock = new Object
  private[graft] def clusterLabelsCached(
      spark: SparkSession, dir: String): DataFrame =
    clusterLabelLock.synchronized {
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$dir#jaccard08".getBytes("UTF-8")).take(6)
        .map("%02x".format(_)).mkString
      val root = s"${sys.props("java.io.tmpdir")}/graft_clusters_$key"
      ArtifactCache.ensure(root, "_LABELED") { staging =>
        // edges come from the kernel-level pairs artifact (one capped-
        // kernel run per corpus feeds labels AND q139's transfer matrix)
        clusterLabels(
          Dedup.jaccardPairsCached(spark, dir).select(col("i"), col("j")))
          .write.mode("overwrite").parquet(s"$staging/labels")
      }
      spark.read.parquet(s"$root/labels")
    }

  /** [[clusterLabels]] plus the number of propagation rounds to fixpoint —
    * the observable DedupStress `giant` measures against the "near-cliques
    * close in 2-3 rounds" claim above.
    */
  private[graft] def clusterLabelsWithRounds(pairs: DataFrame): (DataFrame, Int) = {
    val edges = pairs
      .unionByName(pairs.select(col("j").as("i"), col("i").as("j")))
      .localCheckpoint(true)
    // lazy checkpoints: the per-round sum() action materializes the new
    // label table AND truncates its lineage in the same job, so each
    // propagation round costs exactly one job (eager checkpointing doubles
    // the job count for no added parallelism)
    var labels = edges.select(col("i").as("doc_id")).distinct()
      .withColumn("lbl", col("doc_id")).localCheckpoint(false)
    // sum over an EMPTY label table is null (no pairs at the threshold):
    // converge immediately and emit the empty cluster table
    def labelSum(): Long = {
      val r = labels.agg(sum(col("lbl"))).first()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var prev = Long.MinValue
    var cur = labelSum()
    var rounds = 0
    while (cur != prev) {
      val nbrMin = edges.join(labels, edges("j") === labels("doc_id"))
        .groupBy(edges("i").as("doc_id")).agg(min(col("lbl")).as("nmin"))
      labels = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        .localCheckpoint(false)
      prev = cur
      cur = labelSum()
      rounds += 1
    }
    (labels, rounds)
  }

  /** Best-quality survivor per near-dup cluster (q92): production dedup
    * keeps the HIGHEST-QUALITY member of each cluster, not the lowest id —
    * a mirror site's cleaner copy should win over a truncated scrape. One
    * [[graft.functions.LatestRow]] ObjectHashAggregate argmax (ordering
    * struct(score, -doc_id): highest score, tie to lowest id, map-side
    * combined) over the component labeling joined with the q22 quality
    * scores. No windows, nothing unbounded per group.
    */
  def q92ClusterSurvivors(spark: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabelsCached(spark, dir)
    val scores = TextAnalysis.qualityScored(
      docs(spark, dir).withColumn("toks", split(col("text"), " ")))
      .select(col("doc_id"), col("score"))
    labels.join(scores, Seq("doc_id"))
      .groupBy(col("lbl").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        // latest_row, not max(struct(...)): a struct buffer is not
        // hash-aggregable and silently degrades to SortAggregate
        call_function("latest_row",
          struct(col("doc_id"), col("score")),
          struct(col("score"), (-col("doc_id")).as("nid"))).as("best"))
      .select(col("cluster_id"), col("n_docs"),
        col("best.doc_id").as("keep_doc_id"), col("best.score").as("keep_score"))
      .orderBy(col("cluster_id"))
  }

  /** How many member ids a cluster row reports. */
  private[operators] val MemberSampleK = 20

  /** Cluster rollup with a BOUNDED member sample: the [[MemberSampleK]]
    * smallest doc_ids via the k-min aggregate ([[graft.functions.KmvSketch]]
    * — a bounded TreeSet buffer with map-side combine), never a full
    * `collect_list`. The dominant real dedup case is exactly one enormous
    * near-identical cluster; an unbounded member list makes that cluster's
    * row a single-task memory bomb (round-2 verdict #6), while the k-min
    * buffer holds <= 20 longs per cluster no matter how many members flow
    * in.
    */
  private[graft] def clusterSummary(labels: DataFrame): DataFrame =
    labels.groupBy(col("lbl").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        call_function("kmv_sketch", col("doc_id"), lit(MemberSampleK)).as("m"))
      .select(col("cluster_id"), col("n_docs"),
        concat_ws(",",
          transform(col("m"), d => d.cast("string"))).as("members_sample"))
      .orderBy(col("cluster_id"))

  // ------------------------------------------------------------------
  // q51: deterministic stratified sampling
  // ------------------------------------------------------------------

  /** Hash-deterministic stratified sample: keep a doc when the first 32
    * md5 bits of its id land under the per-language rate (en is
    * down-sampled to 40%, every other language kept at 80% — the classic
    * rebalance of an English-dominated crawl). Deterministic (same doc set
    * in ==> same sample out, no RNG state), embarrassingly parallel, and
    * the decision needs no shuffle at all — the filter runs inside the
    * scan.
    */
  def q51StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("bucket",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"))
      .filter(col("bucket") < when(col("lang") === "en", 40).otherwise(80))
      .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------------
  // q52: benchmark decontamination (n-gram overlap with an eval set)
  // ------------------------------------------------------------------

  /** Test-set decontamination: docs with doc_id % 20 == 0 stand in for the
    * benchmark/eval set; a training doc is CONTAMINATED when it shares any
    * word 8-gram with any eval doc. Reports per-language counts.
    *
    * Scale shape: eval sets are tiny relative to the corpus, so the
    * distinct eval-shingle set is broadcast and the contamination test is
    * a map-side semi-join against the shingle index — which is
    * materialized ONCE (localCheckpoint) and feeds both the eval and the
    * train branch; nothing corpus-sized shuffles, and only the (small)
    * contaminated-id set aggregates. The final per-language counts are a
    * second, column-pruned scan of (doc_id, lang) only — at 100 TB a
    * metadata-cheap read next to the shingling pass.
    */
  def q52Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("toks", split(col("text"), " "))
    val sh = d.select(col("doc_id"),
      explode(array_distinct(wordNgramExpr(8))).as("s"))
      .localCheckpoint(false)
    val evalSh = sh.filter(col("doc_id") % 20 === 0).select("s").distinct()
    val contaminated = sh.filter(col("doc_id") % 20 =!= 0)
      .join(broadcast(evalSh), Seq("s"), "left_semi")
      .select("doc_id").distinct()
    d.filter(col("doc_id") % 20 =!= 0)
      .join(contaminated.withColumn("c", lit(1L)), Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_train"),
        sum(coalesce(col("c"), lit(0L))).as("n_contaminated"))
      .withColumn("n_clean", col("n_train") - col("n_contaminated"))
      .orderBy(col("lang"))
  }

  // ------------------------------------------------------------------
  // q53: sequence packing (concatenate-and-chunk into context windows)
  // ------------------------------------------------------------------

  /** Context-window size for packing (tokens). */
  private val WindowTokens = 512L

  /** Sequence packing, LLM-training style: concatenate all documents in
    * doc_id order into one token stream and chunk it into fixed
    * [[WindowTokens]]-token context windows; each doc reports its global
    * token offset and the first/last window it lands in.
    *
    * The global ordered prefix-sum is computed DISTRIBUTED, not with a
    * single-task `Window.orderBy`: range-partition by doc_id, cumsum
    * within each partition, then add per-partition totals' exclusive
    * prefix (a tiny broadcast join). At 100 TB the heavy pass stays fully
    * parallel; only the per-partition totals (one row per partition)
    * serialize.
    */
  def q53PackWindows(spark: SparkSession, dir: String): DataFrame =
    packedOffsets(spark, dir)
      .withColumn("w_first", expr(s"offset div $WindowTokens"))
      .withColumn("w_last", expr(s"(offset + n_toks - 1) div $WindowTokens"))
      .select("doc_id", "lang", "n_toks", "offset", "w_first", "w_last")
      .orderBy(col("doc_id"))

  /** q53's distributed ordered prefix sum over doc token counts —
    * (doc_id, lang, n_toks, offset), shared with q148's context sweep.
    */
  private def packedOffsets(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    val parts = toks.repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("pid", spark_partition_id())
    val local = parts.withColumn("local_off",
      coalesce(sum(col("n_toks")).over(
        Window.partitionBy(col("pid")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // exclusive prefix of per-partition totals: one row per partition
    val prefixes = local.groupBy(col("pid")).agg(sum(col("n_toks")).as("tot"))
      .withColumn("prefix",
        coalesce(sum(col("tot")).over(
          Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("pid"), col("prefix"))
    local.join(broadcast(prefixes), "pid")
      .withColumn("offset", col("local_off") + col("prefix"))
      .select("doc_id", "lang", "n_toks", "offset")
  }

  /** Context sizes swept by q148. */
  private val CtxSweep = Seq(256L, 512L, 1024L)

  /** Context-length boundary-cost sweep (q148): the q136-style tuning
    * curve for sequence packing — at each candidate context size C, how
    * many windows the concat-and-chunk layout produces and how many
    * documents STRADDLE a window boundary (the rows whose attention is
    * split mid-document; the cost that shrinks as C grows, while
    * per-step compute grows with C). Read next to q53 (which commits to
    * one size), this is the table that picks the size: straddle_frac is
    * the packing-quality axis of the context-length decision.
    *
    * Scale shape: ONE distributed prefix-sum pass ([[packedOffsets]])
    * feeds every swept size; the sweep itself is a |C|-way broadcast
    * explode of a narrow (n_toks, offset) frame into a |C|-key hash agg
    * — the q136 recipe applied to packing.
    */
  def q148ContextSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val offs = packedOffsets(spark, dir).localCheckpoint(true)
    val sizes = CtxSweep.toDF("ctx")
    offs.crossJoin(broadcast(sizes))
      .withColumn("straddle",
        when(expr("offset div ctx") =!= expr("(offset + n_toks - 1) div ctx"), 1L)
          .otherwise(0L))
      .groupBy(col("ctx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("straddle")).as("straddle_docs"))
      .withColumn("n_windows",
        expr("CAST(ceil(CAST(n_tokens AS DOUBLE) / ctx) AS BIGINT)"))
      .withColumn("straddle_frac",
        round(col("straddle_docs").cast("double") / col("n_docs"), 6))
      .select("ctx", "n_docs", "n_tokens", "n_windows", "straddle_docs",
        "straddle_frac")
      .orderBy(col("ctx"))
  }

  // ------------------------------------------------------------------
  // q54: overlapping chunking
  // ------------------------------------------------------------------

  private val ChunkSize = 200
  private val ChunkStride = 150

  /** Overlapping character chunks (size 200, stride 150) for the first 100
    * docs — the RAG/embedding-prep primitive. One `posexplode(sequence(...))`
    * per doc: pure codegen row explosion, no shuffle; the chunk fingerprint
    * keeps the output narrow.
    */
  def q54ChunkOverlap(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .filter(col("doc_id") < 100 && length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        posexplode(expr(s"sequence(0, length(text) - 1, $ChunkStride)")))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumn("chunk_start", col("col").cast("long"))
      .withColumn("chunk_fp",
        md5(expr(s"substring(text, col + 1, $ChunkSize)")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_start"), col("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  // ------------------------------------------------------------------
  // q110: content-defined chunking (rolling-hash boundaries)
  // ------------------------------------------------------------------

  /** Rolling window width (tokens) for content-defined cut detection. */
  private[graft] val CdcWindowTokens = 8
  /** Boundary divisor: a cut fires when the window hash % this == 0, so
    * the expected chunk length is ~[[CdcDivisor]] tokens.
    */
  private[graft] val CdcDivisor = 64

  /** Content-defined chunking (q110): cut the token stream where the
    * rolling [[CdcWindowTokens]]-token window hash is 0 mod
    * [[CdcDivisor]] — the FastCDC/rsync recipe, applied token-wise. Where
    * q54's fixed-stride chunks shift wholesale when a single token is
    * inserted upstream (every downstream fingerprint changes), cut points
    * here depend only on local CONTENT: after an insertion, chunks realign
    * from the next surviving boundary on, so chunk-level dedup (the
    * passage census, the q88 incremental index) keeps matching everything
    * past the edit. The cut after window i lands at token offset
    * i + [[CdcWindowTokens]]; a document with no firing window (or fewer
    * than [[CdcWindowTokens]] tokens) is one chunk.
    *
    * Scale shape (100 TB): window hashing is the q104 census kernel
    * (codegen word_ngrams + md5_prefix64, per-row); the only shuffle is
    * the per-document cut-list rollup, whose state is bounded by document
    * length (same bound as q108's reconstruction). Chunk slicing and
    * fingerprinting are per-row codegen on the rebuilt intervals. No
    * corpus-wide sort, no window function at all.
    */
  def q110CdcChunks(spark: SparkSession, dir: String): DataFrame =
    cdcChunks(docs(spark, dir).withColumn("toks", split(col("text"), " ")))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** [[q110CdcChunks]]'s kernel over an arbitrary (doc_id, toks) frame —
    * shared with the spec's shift-robustness corpus.
    */
  private[graft] def cdcChunks(tok: DataFrame): DataFrame = {
    val k = CdcWindowTokens
    val cuts = Dedup.windowsOf(tok, k)
      .filter(pmod(col("wh"), lit(CdcDivisor.toLong)) === 0)
      .select(col("doc_id"), (col("i") + lit(k)).as("c"))
    // one cut-list row PER DOCUMENT — corpus-sized, so the join must
    // shuffle on doc_id; tiny-SF stats would otherwise broadcast a build
    // that is unbounded at 100 TB (the round-2 dedup contract)
    val perDoc = cuts.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
      .hint("shuffle_hash")
    tok.join(perDoc, Seq("doc_id"), "left")
      .withColumn("bounds", concat(
        array(lit(0)),
        coalesce(col("cs"), expr("CAST(array() AS ARRAY<INT>)")),
        array(size(col("toks")))))
      // only the LAST interval can be empty (a cut exactly at the end);
      // dropping it keeps chunk_id contiguous
      .select(col("doc_id"), col("toks"), posexplode(expr(
        "transform(sequence(0, size(bounds) - 2), j -> struct(bounds[j] AS s, bounds[j + 1] AS e))"))
        .as(Seq("chunk_id", "b")))
      .filter(col("b.e") > col("b.s"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("b.s").cast("long").as("start_tok"),
        (col("b.e") - col("b.s")).cast("long").as("n_toks"),
        md5(expr("concat_ws(' ', slice(toks, b.s + 1, b.e - b.s))")).as("chunk_fp"))
  }

  // ------------------------------------------------------------------
  // q55: per-language vocabulary top-k
  // ------------------------------------------------------------------

  /** Top-10 tokens per language by frequency (vocabulary extraction).
    * Explode -> two-level hash agg (map-side combine absorbs the token
    * explosion) -> bounded top-k AGGREGATE: a web-scale vocabulary is tens
    * of millions of (lang, token) rows per major language, so a single
    * per-language window would sort each language's whole vocab on one
    * reducer (round-2 verdict #7). Round 2 fixed that with a hand-rolled
    * two-phase salted window; [[graft.functions.TopKBy]] is that same move
    * as a mergeable ObjectHashAggregate — partials keep <= 10 entries per
    * language per partition, the shuffle carries 10-entry buffers, and no
    * window (hence no per-group sort) exists anywhere in the plan. Ties
    * break on token ASC, identical to the oracle's row_number order.
    */
  def q55VocabTopk(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    docs(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("lang"))
      .agg(expr("top_k_by(token, cnt, 10)").as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("lang"), col("e.v").as("token"), col("e.c").as("cnt"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("lang"), col("rnk"))
  }

  // ------------------------------------------------------------------
  // q68: token-budget selection (data mixing under a budget)
  // ------------------------------------------------------------------

  /** Per-language token budget for q68. */
  private val LangTokenBudget = 5000L

  /** Token-budget selection — the data-mixing primitive: per language, take
    * documents in quality order (type-token ratio DESC, doc_id ASC) until
    * the language's token budget is exhausted; a doc is kept iff the budget
    * was not already spent BEFORE it (greedy inclusion, so the boundary doc
    * may overflow the budget — the standard mixing rule).
    *
    * Scale shape: the per-language ordered prefix sum is computed
    * DISTRIBUTED, like q53 — range-partition on the selection order
    * (lang, score DESC, doc_id), cumsum within each partition under
    * (pid, lang), then add the per-(pid, lang) totals' exclusive per-lang
    * prefix (rows = partitions × languages, a broadcast join). No single
    * reducer ever sees one language's full corpus — a plain
    * `Window.partitionBy(lang).orderBy(...)` would (the q55 lesson).
    */
  def q68TokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val scored = docs(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .filter(col("n_toks") > 0)
      // type-token ratio: distinct/total — integer-derived, engine-exact
      .withColumn("score",
        size(array_distinct(col("toks"))).cast("double") / col("n_toks"))
      .select(col("doc_id"), col("lang"), col("n_toks"), col("score"))
    budgetSelect(scored, LangTokenBudget)
  }

  /** q68's greedy token-budget selection driven by the PREDICTED language
    * ([[TextAnalysis.withCharLangPred]]) instead of the stored metadata
    * label (q175) — the langid kernel as an actual pipeline stage: real
    * corpora have no trustworthy `lang` column, so the mixing budget must
    * run on the model's own output. One parameter swaps the column; the
    * selection machinery (distributed per-language ordered prefix sums,
    * no single-reducer window) is byte-identical to q68's. The oracle
    * recomputes lang_pred from the SAME marker profile
    * ([[TextAnalysis.langPredCte]]) and then the same greedy rule.
    */
  def q175BudgetPredLang(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.withCharLangPred(docs(spark, dir))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .filter(col("n_toks") > 0)
      .withColumn("score",
        size(array_distinct(col("toks"))).cast("double") / col("n_toks"))
      .select(col("doc_id"), col("lang_pred").as("lang"), col("n_toks"), col("score"))
    budgetSelect(scored, LangTokenBudget)
      .withColumnRenamed("lang", "lang_pred")
  }

  /** q140's temperature-mix weights per PREDICTED language (q176): the
    * sqrt-temperature sampling weights a multilingual pretraining mix
    * actually uses are computed over langid output, not metadata — same
    * integer-exact sqrt scaling as q140, grouping key swapped to
    * `lang_pred`. Bounded output (≤ |langs|+1 rows incl. `und`).
    */
  def q176TemperaturePredLang(spark: SparkSession, dir: String): DataFrame = {
    val s = TextAnalysis.withCharLangPred(docs(spark, dir))
      .select(col("lang_pred"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy(col("lang_pred")).agg(sum(col("nt")).as("n_tokens"))
      .withColumn("nsqrt",
        expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"))
    val tot = s.agg(sum(col("n_tokens")).as("totc"), sum(col("nsqrt")).as("tots"))
    s.crossJoin(broadcast(tot))
      .withColumn("w_prop", round(col("n_tokens").cast("double") / col("totc"), 6))
      .withColumn("w_temp", round(col("nsqrt").cast("double") / col("tots"), 6))
      .withColumn("epochs_temp",
        round(lit(TempBudget) * (col("nsqrt").cast("double") / col("tots")) /
          col("n_tokens").cast("double"), 6))
      .select("lang_pred", "n_tokens", "w_prop", "w_temp", "epochs_temp")
      .orderBy(col("lang_pred"))
  }

  /** The distributed greedy budget selection shared by q68 and q124:
    * per-language ordered prefix sums over a (doc_id, lang, n_toks, score)
    * frame, selection order (score DESC, doc_id), keep while
    * spent_before < budget.
    */
  private def budgetSelect(scored: DataFrame, budget: Long): DataFrame = {
    val parts = scored
      .repartitionByRange(col("lang"), col("score").desc, col("doc_id"))
      .sortWithinPartitions(col("lang"), col("score").desc, col("doc_id"))
      .withColumn("pid", spark_partition_id())
    val local = parts.withColumn("local_off",
      coalesce(sum(col("n_toks")).over(
        Window.partitionBy(col("pid"), col("lang"))
          .orderBy(col("score").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val prefixes = local.groupBy(col("pid"), col("lang"))
      .agg(sum(col("n_toks")).as("tot"))
      .withColumn("prefix",
        coalesce(sum(col("tot")).over(
          Window.partitionBy(col("lang")).orderBy(col("pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("lang"), col("prefix"))
    local.join(broadcast(prefixes), Seq("pid", "lang"))
      .withColumn("spent_before", col("local_off") + col("prefix"))
      .filter(col("spent_before") < budget)
      .select(col("doc_id"), col("lang"), col("n_toks"), col("score"),
        col("spent_before"))
      .orderBy(col("lang"), col("score").desc, col("doc_id"))
  }

  /** Subword-aware token budgeting (q124): q68's greedy per-language
    * selection re-costed in MERGED-vocab tokens — after q123's BPE rounds
    * each merged occurrence counts as ONE token, which is how a trained
    * tokenizer (and therefore a training-compute budget) actually counts.
    * A doc full of the merged collocations "costs" fewer budget units than
    * its whitespace count suggests, so the same 5000-token budget admits
    * MORE documents per language; quality order (raw-token TTR) is
    * unchanged — only the cost function moves.
    *
    * Scale shape: the BPE passes are q123's (linear, shuffle-free merges);
    * the join attaching merged counts to scores is doc_id-keyed; selection
    * is q68's distributed prefix-sum (no per-language full sort on one
    * reducer).
    */
  def q124SubwordBudget(spark: SparkSession, dir: String): DataFrame = {
    val merged = TextAnalysis.bpeTrained(spark, dir, TextAnalysis.BpeRounds)._2
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"))
    val scored = docs(spark, dir)
      .withColumn("rtoks", split(col("text"), " "))
      .filter(size(col("rtoks")) > 0)
      .withColumn("score",
        size(array_distinct(col("rtoks"))).cast("double") / size(col("rtoks")))
      .select(col("doc_id"), col("lang"), col("score"))
      .join(merged, Seq("doc_id"))
      .select("doc_id", "lang", "n_toks", "score")
    budgetSelect(scored, LangTokenBudget)
  }

  // ------------------------------------------------------------------
  // q56: intra-document repetition (Gopher/C4-style quality rule)
  // ------------------------------------------------------------------

  /** Intra-document 5-gram repetition ratio: 1 - distinct/total 5-gram
    * positions. The Gopher "repetition" quality signal — high ratio means
    * the doc repeats itself (boilerplate, keyword stuffing) and should be
    * filtered before training. Per-doc arithmetic only: no shuffle beyond
    * the final order.
    */
  def q56Repetition(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), col("lang"), explode(wordNgramExpr(5)).as("g"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n5"), countDistinct(col("g")).as("d5"))
      .withColumn("rep_ratio",
        lit(1.0) - col("d5").cast("double") / col("n5"))
      .select("doc_id", "lang", "n5", "d5", "rep_ratio")
      .orderBy(col("rep_ratio").desc, col("doc_id"))

  /** Data-mixing allocation (q78): given per-source corpus sizes and a
    * configured weight profile, compute each source's token allocation
    * under a global budget — the "mixture weights" step every pretraining
    * run executes after curation (upweight rare/high-quality sources,
    * downweight the dominant crawl). Weights here are the deterministic
    * arithmetic profile w_s = n_sources - rank(source) + 1 (a stand-in for
    * a configured table; the allocation algebra is what is under test);
    * budget = half the corpus tokens; alloc_s = min(own tokens,
    * floor(budget * w_s / Σw)) — a source too small to absorb its share is
    * capped (waterfilling's first iteration; leftover redistribution is a
    * driver-side loop over S rows, not a data-plane concern).
    *
    * Everything is BIGINT arithmetic (bit-exact across engines); the one
    * double, the sampling rate, is a 6-decimal round of an integer ratio.
    * Scale: one hash-agg over the corpus to S source rows; the window +
    * cross-join run on those S rows — sub-kilobyte at any corpus size.
    */
  def q78MixAllocation(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("source"))
    val stats = docs(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
    // S-row relation from here on: the unpartitioned window is fine
    val ranked = stats
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy()).cast("long"))
      .withColumn("weight", col("n_src") - col("rank") + 1)
    val totals = ranked.agg(sum(col("n_tokens")).as("tot"), sum(col("weight")).as("den"))
    ranked.crossJoin(totals)
      .withColumn("alloc_tokens",
        least(col("n_tokens"), expr("(tot DIV 2) * weight DIV den")))
      .withColumn("rate",
        round(col("alloc_tokens").cast("double") / col("n_tokens"), 6))
      .select("source", "n_docs", "n_tokens", "weight", "alloc_tokens", "rate")
      .orderBy(col("source"))
  }

  /** Quality threshold for the funnel's filter stage (the corpus median is
    * ~0.715, so this cuts a meaningful fraction at test SF).
    */
  private[graft] val FunnelQualityMin = 0.7
  /** Max tolerated corpus-duplicated passage fraction per doc. */
  private[graft] val FunnelDupMax = 0.5

  /** The curation funnel (q83): the full pre-training data pipeline run as
    * ONE composed query — raw corpus -> exact dedup (keep min doc_id per
    * content hash) -> quality filter ([[TextAnalysis.qualityScored]],
    * score >= [[FunnelQualityMin]]) -> passage-dup filter
    * ([[Dedup.passageDupStats]], dup fraction <= [[FunnelDupMax]]) — with
    * per-stage document/token attrition counts, the acceptance report
    * every corpus build publishes. The stages reuse the EXACT operator
    * kernels of q30/q22/q76 (shared code, shared oracle fragments), so the
    * funnel is also an integration test that the operators compose.
    *
    * Scale: each verdict (exact-keep, quality, passage-dup) is computed
    * ONCE and left-joined onto the corpus as a flag; survivor membership
    * is flag arithmetic and all four stage counts come out of a single
    * conditional aggregate over that one flag-annotated frame. The
    * earlier formulation aggregated each stage's survivor frame
    * separately, so stage k re-executed every verdict before it — the
    * funnel-stress harness measured the composed funnel at ~3x the sum of
    * its stage costs (42s vs 14.6s at 100k docs) before the rewrite.
    * Verdict relations are hash-aggs/joins already argued scale-safe for
    * their standalone queries; nothing corpus-sized is broadcast or
    * collected.
    */
  def q83CurationFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(docs(spark, dir))

  /** [[q83CurationFunnel]] over an arbitrary (doc_id, text) frame — the
    * spec drives it on corpora WITH exact duplicates (the testdata has
    * none, which is exactly the input shape that once hid a census-scope
    * bug here).
    */
  private[graft] def funnelFlagsOf(docsDf: DataFrame): DataFrame = {
    val base = docsDf
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("text"), col("toks"),
        size(col("toks")).cast("long").as("nt"))
    val keepExact = base.groupBy(md5(col("text")))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(1L).as("f_exact"))
    val passQuality = TextAnalysis.qualityScored(base)
      .filter(col("score") >= FunnelQualityMin)
      .select(col("doc_id"), lit(1L).as("f_quality"))
    // NARROW per-doc flag frame — a few longs per row, so materializing it
    // is safe at any corpus size. LAZY localCheckpoint, not persist():
    // registering the frame in the cache manager looks equivalent, but
    // cache substitution matches by plan identity and silently MISSES when
    // the cached subtree sits under a join that references the same source
    // relations (the analyzer's relation dedup rewrites attribute ids) —
    // measured here as the quality pass re-running per consumer. The
    // checkpoint truncates the plan to an RDD leaf, which both consumers
    // share by construction; eager=false keeps query construction job-free.
    val flags = base.select(col("doc_id"), col("nt"))
      .join(keepExact, Seq("doc_id"), "left")
      .join(passQuality, Seq("doc_id"), "left")
      .withColumn("s2", coalesce(col("f_exact"), lit(0L)))
      .withColumn("s3", col("s2") * coalesce(col("f_quality"), lit(0L)))
      .select(col("doc_id"), col("nt"), col("s2"), col("s3"))
      .localCheckpoint(false)
    // the passage census runs over the STAGE-3 SURVIVORS, not the raw
    // corpus: an exact-dup group's kept canonical would otherwise see its
    // own removed copies in the census (dup_ratio 1.0) and stage 4 would
    // drop the last copy of every duplicated document. The survivor TEXT
    // comes from a fresh (pushed-down) scan semi-joined on the persisted
    // flags — re-reading text is the cheap part; re-deriving verdicts was
    // not.
    val passDup = Dedup.passageDupStats(
        base.select("doc_id", "text").join(
          flags.filter(col("s3") === 1).select("doc_id"),
          Seq("doc_id"), "left_semi"))
      .filter(col("n_dup_passages").cast("double") <=
        col("n_passages") * FunnelDupMax)
      .select(col("doc_id"), lit(1L).as("f_dup"))
    flags.join(passDup, Seq("doc_id"), "left")
      .withColumn("s4", col("s3") * coalesce(col("f_dup"), lit(0L)))
      .select(col("doc_id"), col("nt"), col("s2"), col("s3"), col("s4"))
  }

  /** [[funnelFlagsOf]] rolled up to q83's corpus-level stage table. */
  private[graft] def funnelOf(docsDf: DataFrame): DataFrame =
    funnelFlagsOf(docsDf)
      .agg(
        count(lit(1)).as("n1"), sum(col("nt")).as("t1"),
        sum(col("s2")).as("n2"), sum(col("nt") * col("s2")).as("t2"),
        sum(col("s3")).as("n3"), sum(col("nt") * col("s3")).as("t3"),
        sum(col("s4")).as("n4"), sum(col("nt") * col("s4")).as("t4"))
      .selectExpr(
        """stack(4,
          |  CAST(1 AS BIGINT), 'raw',           n1, t1,
          |  CAST(2 AS BIGINT), 'exact_dedup',   n2, t2,
          |  CAST(3 AS BIGINT), 'quality',       n3, t3,
          |  CAST(4 AS BIGINT), 'passage_dedup', n4, t4)
          |AS (stage, name, n_docs, n_tokens)""".stripMargin)
      .orderBy(col("stage"))

  /** Per-source funnel attrition (q146): q83's curation funnel broken
    * out by source — which corpus loses how much volume at which stage.
    * Corpus-level stage counts (q83) say the pipeline is healthy; this
    * table says WHO pays: a source with low `retention` is dominated by
    * duplicates or junk, and its raw-count mixing weight (q78/q140)
    * overstates its contribution — the per-source number a curation
    * review reads next to q143's effective sizes.
    *
    * Scale shape: identical to q83 (the same [[funnelFlagsOf]] flag
    * frame — narrow per-doc longs, stage verdicts computed once), plus
    * one broadcast-able source lookup and a |sources|-key hash agg.
    */
  def q146SourceFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelFlagsOf(docs(spark, dir))
      .join(docs(spark, dir).select("doc_id", "source"), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_raw"),
        sum(col("nt")).as("t_raw"),
        sum(col("s2")).as("n_exact"),
        sum(col("s3")).as("n_quality"),
        sum(col("s4")).as("n_final"),
        sum(col("nt") * col("s4")).as("t_final"))
      .withColumn("retention",
        round(col("n_final").cast("double") / col("n_raw"), 6))
      .orderBy(col("source"))

  /** Sample size for the weighted draw (q87). */
  private val WeightedSampleK = 50

  /** Weighted sampling without replacement (q87) — Efraimidis-Spirakis:
    * each doc draws key = ln(u)/w with u a deterministic uniform from its
    * id hash and w its quality score ([[TextAnalysis.qualityScored]]);
    * the k largest keys are the sample, giving inclusion probability
    * proportional to weight without replacement — the quality-weighted
    * corpus draw a pretraining mix uses after scoring. Keys round to 9
    * decimals (the q29 precedent) so cross-engine ln() ulps cannot
    * reorder ranks; ties break on doc_id.
    *
    * Scale: the key is a scan-local projection; the only non-map step is
    * the global top-k, planned as TakeOrderedAndProject (per-partition
    * k then merge — never a full sort).
    */
  def q87WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qualityScored(
      docs(spark, dir).withColumn("toks", split(col("text"), " ")))
      .select(col("doc_id"), col("score"))
    scored
      // degenerate weights are ineligible, not ordered: ln(u)/0 would be
      // -Infinity (and NaN from pathological input), where Spark and
      // DuckDB null/NaN ordering semantics differ — same precedent as
      // q89/q90's degenerate-input handling; the oracle carries the
      // identical predicate
      .filter(col("score") > 0)
      .withColumn("h", graft.operators.Kmv.hash60(col("doc_id")))
      .withColumn("u", (col("h").cast("double") + 1.0) / lit(graft.operators.Kmv.Two60))
      .withColumn("key", round(log(col("u")) / col("score"), 9))
      .select(col("doc_id"), col("score"), col("key"))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(WeightedSampleK)
  }

  // ------------------------------------------------------------------
  // q95: DSIR importance selection (hashed-n-gram importance resampling)
  // ------------------------------------------------------------------

  /** Feature-space size for DSIR hashed bigram features. */
  private val DsirBuckets = 1024
  private val DsirTopK = 100

  /** Data Selection with Importance Resampling (Xie et al. 2023): score
    * every document by how target-like its hashed-bigram distribution is,
    * where the target is the corpus's `lang = 'en'` slice and the raw
    * distribution is the whole corpus. Weight of bucket b is the
    * Laplace-smoothed log-likelihood ratio ln(p_target(b) / p_raw(b));
    * a document's importance weight is the sum over its bigram
    * occurrences. Output: the top-100 most target-like documents.
    *
    * Scale shape: the bigram stream is materialized ONCE (localCheckpoint)
    * and feeds three consumers — raw bucket counts, target bucket counts,
    * and per-doc scoring. The bucket-weight table is exactly
    * [[DsirBuckets]] rows regardless of corpus size, so the scoring join
    * broadcasts it; both count passes are map-side-combined hash aggs on a
    * 1024-value key. Nothing but the bigram stream is corpus-sized, and
    * the final top-k plans as TakeOrderedAndProject (never a full sort).
    *
    * Determinism: per-bucket log-ratios are rounded to integer NANO units
    * before the per-doc bigint sum (q77's precedent) — double accumulation
    * order never reaches the result, and ln() 1-ulp differences are
    * absorbed by the nano round followed by the 6-decimal output round.
    *
    * (Like the dedup kernel, the materialization runs at CONSTRUCTION —
    * callers building-but-never-running the frame still pay the bigram
    * pass; the documented trade for one corpus scan feeding three
    * consumers.)
    */
  def q95DsirSelection(spark: SparkSession, dir: String): DataFrame =
    dsirScoresOf(docs(spark, dir))
      .orderBy(col("dsir_weight").desc, col("doc_id"))
      .limit(DsirTopK)

  /** [[q95DsirSelection]]'s scoring kernel over an arbitrary
    * (doc_id, lang, text) frame, WITHOUT the top-k — one scored row per
    * document. Shared with the beyond-bench harness
    * ([[graft.CurationStress]]), which asserts the planted-target
    * separation on corpora far larger than the testdata. Caller registers
    * `word_ngrams` on the frame's own session.
    */
  private[graft] def dsirScoresOf(docsDf: DataFrame): DataFrame = {
    val bk = docsDf
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(wordNgramExpr(2)).as("g"))
      .withColumn("b", expr("md5_prefix64(g)") % DsirBuckets)
      .select("doc_id", "lang", "b")
      .localCheckpoint(true)
    val raw = bk.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = bk.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val tots = bk.agg(count(lit(1)).as("tr"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tt"))
    val weights = raw.join(tgt, Seq("b"), "left").crossJoin(broadcast(tots))
      // literal `1.0` parses as DECIMAL in Spark (and the whole ratio
      // would compute in 6-digit decimal arithmetic) — every operand is
      // cast to DOUBLE explicitly, with the parenthesization mirrored
      // verbatim in the oracle so both engines run the same IEEE ops
      .withColumn("lw", expr(
        s"""CAST(round(ln(((coalesce(ct, 0) + CAST(1 AS DOUBLE)) / (tt + $DsirBuckets))
           |  * ((tr + CAST($DsirBuckets AS DOUBLE)) / (cr + 1))) * 1000000000) AS BIGINT)""".stripMargin))
      .select("b", "lw")
    bk.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lw")).as("nano"))
      .withColumn("dsir_weight",
        round(col("nano").cast("double") / 1e9, 6))
      .select("doc_id", "lang", "n_bigrams", "dsir_weight")
  }

  // ------------------------------------------------------------------
  // q96: per-source n-gram novelty (corpus-diversity audit)
  // ------------------------------------------------------------------

  /** Per-source n-gram novelty: for each source, the fraction of its
    * distinct 3-gram shingles that appear in NO other source — the
    * "does this provenance add anything new?" signal a data-acquisition
    * pipeline ranks candidate sources by.
    *
    * Scale shape: distinct (source, shingle-id) via hash agg on the 60-bit
    * md5-prefix id (same id space as the dedup family — narrow shuffle
    * keys, never shingle strings), then a per-shingle source count and one
    * equi-join back. No self-join exists: source multiplicity per shingle
    * is bounded by the number of sources, not the corpus.
    */
  def q96SourceNovelty(spark: SparkSession, dir: String): DataFrame =
    noveltyOf(docs(spark, dir))

  /** [[q96SourceNovelty]] over an arbitrary (source, text) frame — shared
    * with [[graft.CurationStress]]'s beyond-bench measurement. Caller
    * registers `word_ngrams`.
    */
  private[graft] def noveltyOf(docsDf: DataFrame): DataFrame = {
    val sh = docsDf
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("source"), explode(wordNgramExpr(3)).as("g"))
      .withColumn("s", expr("md5_prefix64(g)"))
      .select("source", "s").distinct()
      .localCheckpoint(true)
    val srcCnt = sh.groupBy(col("s")).agg(count(lit(1)).as("nsrc"))
    sh.join(srcCnt, Seq("s"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("nsrc") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_shingles"), 6))
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------------
  // q117: per-source unigram KL divergence vs the corpus (drift audit)
  // ------------------------------------------------------------------

  /** Feature-space size for the q117 hashed-unigram distributions. */
  private val KlBuckets = 512

  /** Per-source KL divergence (q117): D_KL(source ‖ corpus) over
    * Laplace-smoothed hashed-unigram distributions — the lexical drift
    * score that ranks provenances by how far their token mix sits from
    * the corpus blend. Complements q96 (novelty counts what's UNIQUE to a
    * source; KL measures how its whole DISTRIBUTION deviates — a source
    * of common words in weird proportions has low novelty but high KL)
    * and q100 (PSI monitors the same distribution across TIME; this
    * compares across PROVENANCE).
    *
    * Scale shape: the token stream collapses immediately into a
    * (source, bucket) census — one map-side-combined hash agg on a
    * [[KlBuckets]]-value key per source, the ONE corpus-sized pass
    * (localCheckpoint: three consumers). Everything downstream is
    * |sources| x [[KlBuckets]] rows: marginals, a bucket spine, and the
    * term sum. Determinism: each smoothed term rounds to integer NANO
    * units before the BIGINT sum (q100's precedent), expression text
    * mirrored verbatim in the oracle.
    */
  def q117SourceKl(spark: SparkSession, dir: String): DataFrame = {
    val bk = docs(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("b", expr("md5_prefix64(tok)") % KlBuckets)
      .groupBy(col("source"), col("b")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val ns = bk.groupBy(col("source")).agg(sum(col("c")).as("ns"))
    val cb = bk.groupBy(col("b")).agg(sum(col("c")).as("cb"))
    val tot = bk.agg(sum(col("c")).as("nt"))
    val spine = ns.select(col("source"), col("ns"),
      explode(expr(s"sequence(0L, ${KlBuckets - 1}L)")).as("b"))
    spine.join(bk, Seq("source", "b"), "left")
      .join(broadcast(cb), Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("nano", expr(
        s"""CAST(round(((coalesce(c, 0) + CAST(1 AS DOUBLE)) / (ns + $KlBuckets))
           |  * ln(((coalesce(c, 0) + CAST(1 AS DOUBLE)) / (ns + $KlBuckets))
           |       / ((coalesce(cb, 0) + CAST(1 AS DOUBLE)) / (nt + $KlBuckets)))
           |  * 1000000000) AS BIGINT)""".stripMargin))
      .groupBy(col("source"), col("ns"))
      .agg(sum(col("nano")).as("nano"))
      .withColumn("kl", round(col("nano").cast("double") / 1e9, 6))
      .select(col("source"), col("ns").as("n_tokens"), col("kl"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------------
  // q118: quality-ranked round-robin mix interleave
  // ------------------------------------------------------------------

  /** Mix size and per-source candidate depth for q118. */
  private val MixTotal = 100
  private val MixPerSource = 10

  /** Round-robin mix construction (q118): build a training mix by
    * interleaving each source's quality-ranked documents — every source's
    * rank-1 doc first (alphabetical by source), then every rank-2, and so
    * on to [[MixTotal]] rows. Where q78 ALLOCATES budgets per source and
    * q87 draws a weighted global sample, this produces the deterministic
    * ORDER a curriculum-style mix actually feeds the trainer: no single
    * high-scoring source can monopolize a prefix of the mix.
    *
    * Scale shape: per-source ranking is the mergeable `top_k_by` aggregate
    * (<= [[MixPerSource]] entries per source per partition before the
    * shuffle) — NEVER a per-source window over full membership, which
    * would sort a web-scale source on one reducer. The only window runs on
    * the post-agg frame, bounded at |sources| x [[MixPerSource]] rows
    * regardless of corpus size. Ranking key is the nano-int quality score
    * (ties -> lowest doc_id), matching the oracle's row_number order
    * exactly.
    */
  def q118InterleaveMix(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qualityScored(
        docs(spark, dir).withColumn("toks", split(col("text"), " ")))
      .select(col("doc_id"), col("score"))
    val d = docs(spark, dir).select("doc_id", "source")
      .join(scored, Seq("doc_id"))
      .withColumn("nscore", expr("CAST(floor(score * 1e9 + 0.5) AS BIGINT)"))
    val ranked = d.groupBy(col("source"))
      .agg(expr(s"top_k_by(doc_id, nscore, $MixPerSource)").as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rnk"),
        col("hit.v").as("doc_id"),
        (col("hit.c").cast("double") / 1e9).as("score"))
    ranked
      .withColumn("seq", row_number().over(
        Window.orderBy(col("rnk"), col("source"))).cast("long"))
      .filter(col("seq") <= MixTotal)
      .select("seq", "source", "rnk", "doc_id", "score")
      .orderBy(col("seq"))
  }

  // ------------------------------------------------------------------
  // q138: per-domain retention cap (Gopher/RefinedWeb-style)
  // ------------------------------------------------------------------

  /** Max documents retained per source under the q138 cap. */
  private val DomainCap = 15

  /** Per-domain retention cap audit (q138): the curation stage that stops
    * any single domain from dominating the corpus — RefinedWeb and Gopher
    * both cap per-host volume because crawl frequency, not quality, drives
    * raw per-domain counts. Each source keeps at most [[DomainCap]] docs,
    * chosen by quality score (q22's kernel, nano-int key, ties -> lowest
    * doc_id); the report shows what the cap costs each source in docs and
    * tokens — the number reviewed before the cap ships.
    *
    * Scale shape (100 TB): selection is the mergeable `top_k_by` per
    * source (<= cap entries per partition pre-shuffle, the q118 recipe —
    * NEVER a per-source window, which would sort a web-scale domain's
    * full membership on one reducer). The kept set is |sources| x cap
    * rows — broadcast back for the token accounting; totals are one
    * map-side-combined hash agg over the same checkpointed scored frame.
    */
  def q138DomainCap(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qualityScored(
        docs(spark, dir).withColumn("toks", split(col("text"), " ")))
      .select(col("doc_id"), col("n_tokens"), col("score"))
    val d = docs(spark, dir).select("doc_id", "source")
      .join(scored, Seq("doc_id"))
      .withColumn("nscore", expr("CAST(floor(score * 1e9 + 0.5) AS BIGINT)"))
      .localCheckpoint(true)
    val kept = d.groupBy(col("source"))
      .agg(expr(s"top_k_by(doc_id, nscore, $DomainCap)").as("top"))
      .select(col("source"), explode(expr("transform(top, x -> x.v)")).as("doc_id"))
    val keptStats = d.join(broadcast(kept), Seq("source", "doc_id"), "left_semi")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("n_tokens")).as("kept_tokens"))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("total_tokens"))
      .join(keptStats, Seq("source"))
      .withColumn("dropped_docs", col("docs") - col("kept_docs"))
      .select("source", "docs", "kept_docs", "dropped_docs", "kept_tokens",
        "total_tokens")
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------------
  // q140: temperature-scaled mixing weights (alpha sampling)
  // ------------------------------------------------------------------

  /** Token budget the q140 temperature weights re-price. */
  private val TempBudget = 1000000L

  /** Temperature-scaled mixing weights (q140): the multilingual/multi-
    * source sampling rule (mT5/XLM-R's alpha-sampling, alpha = 0.5 —
    * w_i proportional to c_i^0.5) next to the proportional baseline.
    * Flattening the source distribution upweights small sources; the
    * `epochs_temp` column is the honest cost — how many times a small
    * source repeats at the [[TempBudget]] token budget (repetition >
    * ~4 epochs is where memorization risk starts, the number this report
    * surfaces per source).
    *
    * Determinism: per-source sqrt is rounded to a micro-int BIGINT, the
    * normalizer is an INTEGER sum of those (order-independent — the q117
    * nano-int recipe), and the published doubles are round(-,6) of
    * identical float ops in both engines.
    *
    * Scale shape: one map-side-combined token census per source, a
    * |sources|-row scalar broadcast, and per-row float math — nothing
    * corpus-sized past the first agg.
    */
  def q140TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val s = docs(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("n_tokens"))
      .withColumn("nsqrt",
        expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"))
    val tot = s.agg(sum(col("n_tokens")).as("totc"), sum(col("nsqrt")).as("tots"))
    s.crossJoin(broadcast(tot))
      .withColumn("w_prop", round(col("n_tokens").cast("double") / col("totc"), 6))
      .withColumn("w_temp", round(col("nsqrt").cast("double") / col("tots"), 6))
      .withColumn("epochs_temp",
        round(lit(TempBudget) * (col("nsqrt").cast("double") / col("tots")) /
          col("n_tokens").cast("double"), 6))
      .select("source", "n_tokens", "w_prop", "w_temp", "epochs_temp")
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------------
  // q143: duplicate-discounted effective source sizes
  // ------------------------------------------------------------------

  /** Effective token counts per source (q143): raw per-source token mass
    * next to the mass that SURVIVES near-dup cluster dedup (one canonical
    * representative — the min-id member — per q50 component; singletons
    * keep themselves). Raw counts overstate what a source contributes to
    * training: a source that is 30% internal near-dups delivers 30% fewer
    * novel tokens than its census claims, and a mixing budget (q78/q140)
    * priced on raw counts over-samples it. `effective_ratio` is the
    * per-source discount — the correction factor applied before any
    * mixing decision, and the cross-source companion to q96's novelty.
    *
    * Scale shape: consumes the SAME labels artifact as q50/q92/q131 (one
    * clustering per corpus snapshot); the label table is pair-graph-
    * sized, broadcast into one left join against a single corpus scan,
    * then a |sources|-key hash agg with map-side combine.
    */
  def q143EffectiveTokens(spark: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabelsCached(spark, dir)
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .join(broadcast(labels), Seq("doc_id"), "left")
      .withColumn("kept", coalesce(col("doc_id") === col("lbl"), lit(true)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(col("nt")).as("raw_tokens"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("kept"), col("nt")).otherwise(0L)).as("effective_tokens"))
      .withColumn("effective_ratio",
        round(col("effective_tokens").cast("double") / col("raw_tokens"), 6))
      .select("source", "docs", "raw_tokens", "kept_docs",
        "effective_tokens", "effective_ratio")
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------------
  // q155: near-dup cluster size distribution
  // ------------------------------------------------------------------

  /** Cluster-size distribution (q155): the census of the near-dup
    * cluster table by power-of-two size bucket — the shape every dedup
    * review checks first, because the TAIL decides the strategy: a
    * heavy tail (few giant clusters holding most duplicate mass) means
    * template/mirror content that one targeted rule could remove before
    * the pairwise kernel ever runs; a flat head of 2-doc clusters means
    * organic near-dups that need the full pipeline. Singletons are
    * reported as bucket 0 (the complement the cluster table omits).
    *
    * Scale shape: consumes the shared labels artifact; two hash aggs
    * (per-cluster size, then per-bucket census) over pair-graph-sized
    * data, plus one corpus count for the singleton row.
    */
  def q155ClusterSizes(spark: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabelsCached(spark, dir)
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("sz"))
      .localCheckpoint(true)
    // coalesce: on a corpus with ZERO near-dup clusters sum over the empty
    // sizes frame is null, and the singleton row must be (0, n, n), not
    // (0, null, null) — mirroring the oracle's coalesce (round-9 advice)
    val clustered = sizes.agg(
      count(lit(1)).as("n_clusters"),
      coalesce(sum(col("sz")), lit(0L)).as("n_docs"))
    val total = docs(spark, dir).agg(count(lit(1)).as("n"))
    val buckets = sizes
      // integer bit-length, not float log2 (whose power-of-two outputs
      // can land an ULP below the integer in one engine): bucket =
      // len(bin(sz)) - 1 is exact in both
      .withColumn("bucket",
        expr("CAST(length(bin(sz)) - 1 AS BIGINT)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"))
    val singletons = total.crossJoin(broadcast(clustered))
      .select(lit(0L).as("bucket"),
        (col("n") - col("n_docs")).as("n_clusters"),
        (col("n") - col("n_docs")).as("n_docs"))
    buckets.unionByName(singletons)
      .groupBy(col("bucket"))
      .agg(sum(col("n_clusters")).as("n_clusters"), sum(col("n_docs")).as("n_docs"))
      .orderBy(col("bucket"))
  }

  // ------------------------------------------------------------------
  // q156: per-document funnel verdict trail
  // ------------------------------------------------------------------

  /** Per-document verdict trail (q156): q83's stage flags emitted per
    * DOCUMENT — the row a reviewer pulls to answer "why is doc X not in
    * the training set?" (dropped as an exact copy, below the quality
    * bar, or passage-duplicated — the first zero in the flag sequence
    * is the answer). q83 aggregates these flags corpus-wide, q146 by
    * source; this is the ungrouped trail the other two roll up, and the
    * export a curation UI indexes. Same [[funnelFlagsOf]] kernel — the
    * three views can never disagree.
    */
  def q156DocVerdicts(spark: SparkSession, dir: String): DataFrame =
    funnelFlagsOf(docs(spark, dir))
      .select(col("doc_id"), col("nt").as("n_tokens"),
        col("s2").as("pass_exact"), col("s3").as("pass_quality"),
        col("s4").as("pass_final"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------------
  // q154: data-constrained mix (epoch-capped waterfall allocation)
  // ------------------------------------------------------------------

  /** Fixpoint rounds unrolled in the q154 oracle and iterated by the
    * engine — strictly more than the source count, and extra rounds are
    * no-ops once the capped set stabilizes.
    */
  private val WaterfallRounds = 24

  /** Per-source epoch cap, in tenths: 21 -> no source repeats more than
    * 2.1x its own token mass.
    */
  private val EpochCapPct = 21

  /** Data-constrained mixing allocation (q154): the budget split a
    * repetition-aware pipeline actually ships — temperature weights
    * (alpha = 0.25, flattening harder than q140's 0.5) propose each
    * source's share of a 2x-total-tokens budget, but no source may
    * exceed [[EpochCapPct]]/10 epochs of its own mass (the
    * data-constrained-scaling rule: repetition beyond a few epochs stops
    * buying loss). Sources whose proposal exceeds the cap are frozen AT
    * the cap and their surplus re-flows to the uncapped remainder —
    * iterated to fixpoint (the classic waterfall / water-filling
    * allocation). All arithmetic is exact BIGINT (micro-int weights,
    * floor division), so the engine loop and the oracle's unrolled CTE
    * chain derive identical allocations; floor rounding under-allocates
    * by < |sources| tokens and never exceeds the budget (spec-pinned).
    *
    * Scale shape: the corpus-sized work is one token census; the
    * waterfall itself is an O(|sources|^2) computation on a
    * |sources|-row table, done driver-side (the bounded-action
    * precedent) exactly as a deployment computes its mix config.
    */
  def q154DataConstrainedMix(spark: SparkSession, dir: String): DataFrame = {
    val census = docs(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("c"))
      .withColumn("nw", expr(
        "CAST(floor(sqrt(sqrt(CAST(c AS DOUBLE))) * 1e6 + 0.5) AS BIGINT)"))
      .withColumn("cap", expr(s"(c * $EpochCapPct) div 10"))
      .localCheckpoint(true)
    val rows = census.select("source", "c", "nw", "cap").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val budget = 2L * rows.map(_._2).sum
    val (prov, capped) =
      waterfall(rows.map(t => (t._3, t._4)), budget, WaterfallRounds)
    import spark.implicits._
    val allocDf = rows.indices.map { ix =>
      (rows(ix)._1, prov(ix), if (capped(ix)) 1L else 0L)
    }.toDF("source", "alloc_tokens", "capped")
    census.join(broadcast(allocDf), Seq("source"))
      .withColumn("epochs",
        round(col("alloc_tokens").cast("double") / col("c"), 6))
      .select(col("source"), col("c").as("n_tokens"), col("cap").as("cap_tokens"),
        col("alloc_tokens"), col("capped"), col("epochs"))
      .orderBy(col("source"))
  }

  /** The q154 fixpoint as a pure function over (weight, cap) rows: the
    * exact-integer waterfall, `rounds` iterations (extra rounds past
    * convergence are identity). Returns (allocation, capped) aligned
    * with the input. Factored out so the randomized spec can fuzz the
    * allocation invariants (budget conservation, cap exactness, budget
    * monotonicity) without a SparkSession.
    */
  private[graft] def waterfall(
      rows: Seq[(Long, Long)], budget: Long,
      rounds: Int): (Seq[Long], Seq[Boolean]) = {
    // the micro-int weight x budget product must stay inside a signed 64:
    // fails loudly (the pqCodebook require precedent) instead of silently
    // wrapping — at corpus scales where this trips, drop the weight
    // precision a digit (1e5 micro-weights) and the allocation is
    // unchanged beyond that digit
    val maxW = rows.map(_._1).max
    require(maxW <= Long.MaxValue / math.max(budget, 1L),
      s"waterfall weight*budget would overflow 64 bits (maxW=$maxW, " +
        s"budget=$budget): reduce the micro-weight scale")
    var capped = rows.map(_ => false)
    var prov = {
      val sumW = rows.map(_._1).sum
      rows.map(t => Math.floorDiv(t._1 * budget, sumW))
    }
    for (_ <- 1 to rounds) {
      capped = capped.zip(rows.zip(prov)).map { case (cp, (t, p)) => cp || p > t._2 }
      val rem = budget - rows.zip(capped).collect { case (t, true) => t._2 }.sum
      val sumW = rows.zip(capped).collect { case (t, false) => t._1 }.sum
      prov = rows.zip(capped).map { case (t, cp) =>
        if (cp) t._2 else if (sumW == 0L) 0L else Math.floorDiv(t._1 * rem, sumW)
      }
    }
    (prov, capped)
  }

  /** The q154 oracle's unrolled waterfall: `rounds` chained
    * (capped-update, re-allocate) CTE pairs — the [[graft.operators
    * .TextAnalysis]] bpeChainCtes recipe applied to the allocation
    * fixpoint. Extra rounds past convergence are identity.
    */
  private def waterfallCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""base AS MATERIALIZED (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS c
        |  FROM documents GROUP BY source),
        |b AS MATERIALIZED (SELECT CAST(2 * sum(c) AS BIGINT) AS budget FROM base),
        |w AS MATERIALIZED (SELECT source, c,
        |    CAST(floor(sqrt(sqrt(CAST(c AS DOUBLE))) * 1e6 + 0.5) AS BIGINT) AS nw,
        |    CAST((c * $EpochCapPct) // 10 AS BIGINT) AS cap
        |  FROM base),
        |p0 AS MATERIALIZED (SELECT w.source, w.c, w.nw, w.cap, FALSE AS capped,
        |    CAST(w.nw * b.budget // (SELECT sum(nw) FROM w) AS BIGINT) AS prov
        |  FROM w, b)""".stripMargin)
    for (k <- 1 to rounds) {
      sb.append(s""",
        |a$k AS MATERIALIZED (SELECT source, c, nw, cap,
        |        capped OR prov > cap AS capped
        |        FROM p${k - 1}),
        |p$k AS MATERIALIZED (SELECT t.source, t.c, t.nw, t.cap, t.capped,
        |    CAST(CASE WHEN t.capped THEN t.cap
        |      ELSE t.nw *
        |        (SELECT (SELECT budget FROM b)
        |           - coalesce(sum(CASE WHEN capped THEN cap END), 0) FROM a$k)
        |        // nullif((SELECT sum(CASE WHEN NOT capped THEN nw END)
        |                   FROM a$k), 0)
        |      END AS BIGINT) AS prov
        |  FROM a$k t)""".stripMargin)
    }
    sb.toString
  }

  // ------------------------------------------------------------------
  // q150: balanced eval-set sampling (per-stratum quotas)
  // ------------------------------------------------------------------

  /** Docs drawn per (source, quality-bucket) stratum in q150. */
  private val EvalQuota = 3

  /** Balanced eval-set construction (q150): a fixed [[EvalQuota]]-doc
    * draw from EVERY (source, quality bucket) stratum — where q51
    * samples proportionally (strata keep their population shares), an
    * EVAL set wants equal representation so per-stratum metrics carry
    * equal statistical weight; rare strata are not allowed to vanish.
    * The draw is deterministic: rank by a 60-bit md5 prefix of the
    * doc_id (the q51 hash recipe), ties to the lower id — re-runs and
    * engines agree on the exact member list.
    *
    * Scale shape: per-stratum selection is the mergeable `top_k_by`
    * (quota entries per partition pre-shuffle), NEVER a per-stratum
    * window over full membership; output is |sources| x 3 x quota rows.
    */
  def q150BalancedEval(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qualityScored(
        docs(spark, dir).withColumn("toks", split(col("text"), " ")))
      .select(col("doc_id"), col("score"))
    docs(spark, dir).select("doc_id", "source")
      .join(scored, Seq("doc_id"))
      .withColumn("bucket",
        when(col("score") >= 0.8, "high")
          .when(col("score") >= 0.6, "medium").otherwise("low"))
      .withColumn("hkey", expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      .groupBy(col("source"), col("bucket"))
      .agg(expr(s"top_k_by(doc_id, hkey, $EvalQuota)").as("top"))
      .select(col("source"), col("bucket"),
        posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("source"), col("bucket"),
        (col("pos") + 1).cast("long").as("rnk"), col("hit.v").as("doc_id"))
      .orderBy(col("source"), col("bucket"), col("rnk"))
  }

  // ------------------------------------------------------------------
  // q142: quality-band x duplication calibration
  // ------------------------------------------------------------------

  /** Quality-band duplication calibration (q142): cross the q22 quality
    * score with q31 near-dup membership — the report that answers "does
    * the quality filter already catch the duplicates, or are the two
    * filters independent?" If dup_rate falls with quality, a quality
    * threshold silently double-acts as a weak dedup (and vice versa); if
    * flat, the pipeline genuinely needs both stages. Bands are FIXED
    * score bins (floor(score*10), capped at 9) — never ntile, whose
    * global sort is a corpus-sized single-reducer window.
    *
    * Scale shape: quality is a per-row map; dup membership is the ids of
    * the stored pair artifact ([[Dedup.jaccardPairsCached]]) — pair-graph-
    * sized, broadcast as a semi-join probe; the rollup is a <=10-key hash
    * agg with map-side combine.
    */
  def q142QualityDupCalibration(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qualityScored(
        docs(spark, dir).withColumn("toks", split(col("text"), " ")))
      .select(col("doc_id"), col("n_tokens"), col("score"))
    val pairs = Dedup.jaccardPairsCached(spark, dir)
    val dupIds = pairs.select(col("i").as("doc_id"))
      .unionByName(pairs.select(col("j").as("doc_id")))
      .distinct()
    scored
      .withColumn("band",
        least(floor(col("score") * 10).cast("long"), lit(9L)))
      .join(broadcast(dupIds.withColumn("is_dup", lit(1L))), Seq("doc_id"), "left")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_docs"))
      .withColumn("dup_rate",
        round(col("n_dup_docs").cast("double") / col("n_docs"), 6))
      .select("band", "n_docs", "n_tokens", "n_dup_docs", "dup_rate")
      .orderBy(col("band"))
  }

  // ------------------------------------------------------------------
  // q131: leakage-safe train/val/test splits (cluster-granular hashing)
  // ------------------------------------------------------------------

  /** Split-bucket boundaries: hash bucket < 90 -> train, < 95 -> val,
    * else test (90/5/5).
    */
  private val TrainBuckets = 90
  private val ValBuckets = 95

  /** Hash bucket 0..99 from a column's md5 prefix — the q51 determinism
    * recipe (identical hex and conv semantics in Spark and DuckDB).
    */
  private def hashBucket(c: String): Column =
    expr(s"CAST(conv(substr(md5(CAST($c AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100")

  private def splitOf(b: Column): Column =
    when(b < TrainBuckets, "train").when(b < ValBuckets, "val").otherwise("test")

  /** Leakage-safe train/val/test assignment (q131): the split every
    * pretraining/eval pipeline must get right — hashing DOCUMENTS into
    * splits leaks near-duplicates across the train/test boundary (a test
    * doc's near-identical twin trains, and the eval is contaminated by
    * construction). The unit of assignment must be the near-dup CLUSTER:
    * every member of a connected component lands in the same split.
    *
    * Clusters come from the q50 min-label components over the Jaccard>=0.8
    * pair graph; singletons (docs in no pair) are their own cluster. The
    * split is a deterministic md5-bucket of the CLUSTER id (90/5/5), so
    * assignment is reproducible run-over-run and portable across engines.
    * The report quantifies exactly the leakage the operator prevents:
    * `straddle_clusters` counts this split's clusters whose members a
    * naive doc-id hash would have scattered across >1 split — each one a
    * train/test contamination the cluster-granular hash closed.
    *
    * Scale shape (100 TB): the label table is pair-graph-sized (near-dup
    * docs only — tiny next to the corpus), so the left join is a
    * broadcast-able dimension against one corpus scan; both rollups are
    * map-side-combined hash aggs whose outputs are |clusters| and 3 rows.
    * No windows, no corpus-sized sort.
    */
  /** Doc-level split assignment feeding [[q131LeakageSplits]]'s rollup —
    * exposed for the spec's cluster-granularity and hash-arithmetic
    * assertions: (doc_id, n_toks, cluster_id, split, naive_split).
    */
  private[graft] def leakageSplitAssignments(
      spark: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabelsCached(spark, dir)
    docs(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("lbl"), col("doc_id")))
      .withColumn("split", splitOf(hashBucket("cluster_id")))
      .withColumn("naive_split", splitOf(hashBucket("doc_id")))
      .drop("lbl")
  }

  def q131LeakageSplits(spark: SparkSession, dir: String): DataFrame = {
    val perCluster = leakageSplitAssignments(spark, dir)
      .groupBy(col("cluster_id"), col("split"))
      .agg(count(lit(1)).as("nd"), sum(col("n_toks")).as("nt"),
        countDistinct(col("naive_split")).as("nns"))
    perCluster.groupBy(col("split"))
      .agg(sum(col("nd")).as("n_docs"),
        count(lit(1)).as("n_clusters"),
        sum(col("nt")).as("n_tokens"),
        sum(when(col("nns") > 1, 1L).otherwise(0L)).as("straddle_clusters"))
      .orderBy(col("split"))
  }

  // ------------------------------------------------------------------
  // q135: deterministic corpus shuffle + shard assignment
  // ------------------------------------------------------------------

  /** Number of training shards q135 deals the corpus into. */
  private val NShards = 16

  /** Deterministic global shuffle + shard assignment (q135): the step
    * between curation and training — documents must reach the trainer in
    * a reproducible pseudo-random order (adjacent-doc correlation from
    * crawl/source locality poisons SGD), dealt into fixed shards whose
    * sizes are balanced enough that data-parallel workers finish
    * together. The shuffle key is md5(doc_id) (the q51 determinism
    * recipe): order by hash = a seeded permutation any engine
    * reproduces; shard = hash-bucket, so assignment is stable under
    * corpus growth (a new doc changes one shard, never a reshuffle).
    *
    * Output is the per-shard manifest: sizes for the balance check plus
    * each shard's first/last documents in shuffle order (struct-min/max
    * argmaxes — hash ties broken by doc_id, no windows). The actual
    * export is [[writeTrainShards]]: one directory per shard, rows in
    * shuffle order.
    *
    * Scale shape: one corpus scan into a map-side-combined agg keyed by
    * [[NShards]] values; nothing sorts globally — the ORDER BY lives
    * inside each shard's write ([[writeTrainShards]] range-partitions by
    * (shard, h), so each output task sorts only its shard slice).
    */
  def q135ShuffleShard(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .withColumn("h", hashBucket64("doc_id"))
      .withColumn("shard", pmod(col("h"), lit(NShards.toLong)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        min(struct(col("h"), col("doc_id"))).getField("doc_id").as("first_doc"),
        max(struct(col("h"), col("doc_id"))).getField("doc_id").as("last_doc"))
      .orderBy(col("shard"))

  /** 64-bit md5-prefix hash of a column (Spark side of the DuckDB
    * `('0x' || substr(md5(x), 1, 15))::BIGINT` pairing — 15 hex digits
    * keep the value positive in both engines).
    */
  private def hashBucket64(c: String): Column =
    expr(s"CAST(conv(substr(md5(CAST($c AS STRING)), 1, 15), 16, 10) AS BIGINT)")

  /** The q135 export: one directory per shard, rows stored in shuffle
    * order. `repartitionByRange(shard, h)` + `sortWithinPartitions` keeps
    * the global sort OUT of the plan — each write task orders only its
    * own shard slice, the 100 TB shape (a global ORDER BY would funnel
    * the corpus through one range exchange boundary computation, fine,
    * but the subsequent single-direction write is what shard-parallel
    * trainers cannot consume).
    */
  def writeTrainShards(spark: SparkSession, dir: String, outDir: String): Unit =
    docs(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
      .withColumn("h", hashBucket64("doc_id"))
      .withColumn("shard", pmod(col("h"), lit(NShards.toLong)))
      .repartitionByRange(NShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("h"), col("doc_id"))
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)

  // ------------------------------------------------------------------
  // q98: robust length outliers (median/MAD, census-based exact)
  // ------------------------------------------------------------------

  /** Per-source robust outlier documents: |n_chars - median| > 3 * MAD
    * (median absolute deviation) — the scale-robust version of z-score
    * filtering, immune to the exact heavy tails it is meant to catch.
    *
    * Exact medians WITHOUT sorting values into one reducer: `percentile()`
    * collects every group value into executor memory — a straggler/OOM
    * when one source holds a 100 TB corpus's bulk. Document LENGTH has
    * bounded cardinality, so the interpolated median comes from a
    * (source, n_chars) CENSUS instead: hash agg (map-side combined) to at
    * most |sources| x |distinct lengths| rows, a cumulative window over
    * that tiny census, and the two middle order statistics read off the
    * cumulative counts. The same census trick runs again on the integer
    * deviations |2x - med2| for the MAD.
    *
    * Everything stays in INTEGER space (med2 = 2*median, mad4 = 4*MAD are
    * integers by construction), so the outlier predicate
    * |4x - 2*med2| > 3*mad4 is exact in both engines — no float boundary.
    */
  def q98LengthOutliers(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select("doc_id", "source", "n_chars")
    val cen = d.groupBy(col("source"), col("n_chars")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("source").orderBy("n_chars")
    val wTot = Window.partitionBy("source")
    val cen2 = cen
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wTot))
    // med2 = v_floor((n-1)/2) + v_ceil((n-1)/2): value at 0-based index k
    // is the smallest n_chars whose cumulative count exceeds k
    val med = cen2.groupBy(col("source")).agg(
      (min(when(expr("cum > ((tot - 1) div 2)"), col("n_chars"))) +
        min(when(expr("cum > (tot div 2)"), col("n_chars")))).as("med2"))
    val dd = d.join(med, Seq("source"))
      .withColumn("d2", abs(col("n_chars") * 2 - col("med2")))
    val cenD = dd.groupBy(col("source"), col("d2")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.partitionBy("source").orderBy("d2")))
      .withColumn("tot", sum(col("c")).over(Window.partitionBy("source")))
    val mad = cenD.groupBy(col("source")).agg(
      (min(when(expr("cum > ((tot - 1) div 2)"), col("d2"))) +
        min(when(expr("cum > (tot div 2)"), col("d2")))).as("mad4"))
    dd.join(mad, Seq("source"))
      .filter(abs(col("n_chars") * 4 - col("med2") * 2) > col("mad4") * 3)
      .select(col("doc_id"), col("source"), col("n_chars"),
        (col("med2") / lit(2.0)).as("med"), (col("mad4") / lit(4.0)).as("mad"))
      .orderBy(col("source"), col("doc_id"))
  }

  // ------------------------------------------------------------------
  // Oracles
  // ------------------------------------------------------------------

  /** The q50/q92 shared component CTEs: jaccard pairs -> recursive
    * reachability -> (doc_id, cluster_id) as `comp`.
    */
  private def clusterCompCtes: String =
    s"""sh AS (
       |  SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS s
       |  FROM (SELECT DISTINCT doc_id, unnest(${Dedup.shingleSql}) AS g
       |        FROM documents WHERE len(string_split(text,' ')) >= 3)),
       |n AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |pairs AS (
       |  SELECT i, j FROM inter
       |  JOIN n na ON na.doc_id = i JOIN n nb ON nb.doc_id = j
       |  WHERE CAST(inter AS DOUBLE) / (na.ns + nb.ns - inter) >= 0.8),
       |edges AS (SELECT i AS u, j AS v FROM pairs
       |          UNION SELECT j, i FROM pairs),
       |reach AS (
       |  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
       |  UNION
       |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.u = e.v),
       |comp AS (SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u)""".stripMargin

  private def shingles8Cte: String =
    s"""sh8 AS (
       |  SELECT DISTINCT doc_id, unnest(${wordNgramSql(8)}) AS s
       |  FROM documents WHERE len(string_split(text,' ')) >= 8)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q131_leakage_splits" ->
      s"""WITH RECURSIVE $clusterCompCtes,
         |alld AS (
         |  SELECT d.doc_id,
         |    COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
         |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
         |b AS (SELECT *,
         |    CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
         |      AS BIGINT) % 100 AS cb,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |      AS BIGINT) % 100 AS nb
         |  FROM alld),
         |s AS (SELECT *,
         |    CASE WHEN cb < $TrainBuckets THEN 'train'
         |         WHEN cb < $ValBuckets THEN 'val' ELSE 'test' END AS split,
         |    CASE WHEN nb < $TrainBuckets THEN 'train'
         |         WHEN nb < $ValBuckets THEN 'val' ELSE 'test' END AS naive_split
         |  FROM b),
         |cl AS (SELECT cluster_id, split, count(*) AS nd, sum(n_toks) AS nt,
         |    count(DISTINCT naive_split) AS nns
         |  FROM s GROUP BY cluster_id, split)
         |SELECT split, CAST(sum(nd) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN nns > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS straddle_clusters
         |FROM cl GROUP BY split ORDER BY split""".stripMargin,

    "q135_shuffle_shard" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |      AS BIGINT) AS h
         |  FROM documents)
         |SELECT h % $NShards AS shard, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |  struct_extract(min({'h': h, 'doc_id': doc_id}), 'doc_id')
         |    AS first_doc,
         |  struct_extract(max({'h': h, 'doc_id': doc_id}), 'doc_id')
         |    AS last_doc
         |FROM d GROUP BY shard ORDER BY shard""".stripMargin,

    "q50_dedup_clusters" ->
      s"""WITH RECURSIVE $clusterCompCtes,
         |ranked AS (
         |  SELECT cluster_id, doc_id,
         |    row_number() OVER (PARTITION BY cluster_id ORDER BY doc_id) AS rn
         |  FROM comp)
         |SELECT cluster_id, count(*) AS n_docs,
         |  string_agg(CASE WHEN rn <= $MemberSampleK THEN CAST(doc_id AS VARCHAR) END,
         |             ',' ORDER BY doc_id) AS members_sample
         |FROM ranked GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    "q51_stratified_sample" ->
      """SELECT doc_id, lang, source,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
        |      < CASE WHEN lang = 'en' THEN 40 ELSE 80 END
        |ORDER BY doc_id""".stripMargin,

    "q52_decontaminate" ->
      s"""WITH $shingles8Cte,
         |evals AS (SELECT DISTINCT s FROM sh8 WHERE doc_id % 20 = 0),
         |contam AS (
         |  SELECT DISTINCT doc_id FROM sh8
         |  WHERE doc_id % 20 <> 0 AND s IN (SELECT s FROM evals))
         |SELECT lang, count(*) AS n_train,
         |  CAST(sum(CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_contaminated,
         |  CAST(count(*) - sum(CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_clean
         |FROM documents d LEFT JOIN contam c ON c.doc_id = d.doc_id
         |WHERE d.doc_id % 20 <> 0
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "q53_pack_windows" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
         |  FROM documents)
         |SELECT doc_id, lang, n_toks,
         |  CAST(coalesce(sum(n_toks) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS "offset",
         |  CAST(coalesce(sum(n_toks) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    // $WindowTokens AS BIGINT) AS w_first,
         |  CAST((coalesce(sum(n_toks) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n_toks - 1)
         |    // $WindowTokens AS BIGINT) AS w_last
         |FROM toks ORDER BY doc_id""".stripMargin,

    "q54_chunk_overlap" ->
      s"""SELECT doc_id,
         |  CAST(start // $ChunkStride AS BIGINT) AS chunk_idx,
         |  CAST(start AS BIGINT) AS chunk_start,
         |  md5(substr(text, CAST(start AS INTEGER) + 1, $ChunkSize)) AS chunk_fp
         |FROM documents,
         |  unnest(generate_series(0, length(text) - 1, $ChunkStride)) AS t(start)
         |WHERE doc_id < 100 AND length(text) > 0
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    "q110_cdc_chunks" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |w AS (SELECT doc_id, i,
        |    ('0x' || substr(md5(array_to_string(
        |      toks[i+1 : i+$CdcWindowTokens], ' ')), 1, 15))::BIGINT AS wh
        |  FROM t, unnest(range(len(toks) - $CdcWindowTokens + 1)) AS u(i)
        |  WHERE len(toks) >= $CdcWindowTokens),
        |cuts AS (SELECT doc_id, list(i + $CdcWindowTokens ORDER BY i) AS cs
        |  FROM w WHERE wh % $CdcDivisor = 0 GROUP BY doc_id),
        |b AS (SELECT t.doc_id, t.toks,
        |    [0] || coalesce(cs, CAST([] AS BIGINT[])) || [len(t.toks)] AS bounds
        |  FROM t LEFT JOIN cuts USING (doc_id)),
        |ch AS (SELECT doc_id, toks, j - 1 AS chunk_id,
        |    bounds[CAST(j AS INTEGER)] AS s, bounds[CAST(j AS INTEGER) + 1] AS e
        |  FROM b, unnest(range(1, len(bounds))) AS u(j))
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(s AS BIGINT) AS start_tok, CAST(e - s AS BIGINT) AS n_toks,
        |  md5(array_to_string(toks[CAST(s AS INTEGER)+1 : CAST(e AS INTEGER)], ' ')) AS chunk_fp
        |FROM ch WHERE e > s ORDER BY doc_id, chunk_id""".stripMargin,

    "q55_vocab_topk" ->
      """WITH counts AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |agg AS (SELECT lang, token, count(*) AS cnt FROM counts GROUP BY lang, token),
        |ranked AS (
        |  SELECT lang, token, cnt,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token)
        |      AS INTEGER) AS rnk
        |  FROM agg)
        |SELECT lang, token, cnt, rnk FROM ranked WHERE rnk <= 10
        |ORDER BY lang, rnk""".stripMargin,

    // len(d4) = len(d3) - |s4|: the final merged length is arithmetic
    // over the position CTEs, never d4's full list rebuild (the one
    // materialization DuckDB could not fit at sf0.1 — exact, see q127)
    "q124_subword_budget" ->
      s"""WITH ${TextAnalysis.bpeChainCtes(TextAnalysis.BpeRounds)},
         |mc AS (SELECT doc_id, count(*) AS cnt
         |       FROM s${TextAnalysis.BpeRounds} GROUP BY doc_id),
         |mlen AS (SELECT d.doc_id,
         |           CAST(len(d.toks) - coalesce(mc.cnt, 0) AS BIGINT) AS nm
         |         FROM d${TextAnalysis.BpeRounds - 1} d
         |         LEFT JOIN mc USING (doc_id)),
         |raw AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS rtoks
         |  FROM documents),
         |scored AS (
         |  SELECT r.doc_id, r.lang,
         |    m.nm AS n_toks,
         |    CAST(len(list_distinct(r.rtoks)) AS DOUBLE) / len(r.rtoks) AS score
         |  FROM raw r JOIN mlen m ON r.doc_id = m.doc_id
         |  WHERE len(r.rtoks) > 0),
         |run AS (
         |  SELECT doc_id, lang, n_toks, score,
         |    CAST(coalesce(sum(n_toks) OVER (PARTITION BY lang
         |      ORDER BY score DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS spent_before
         |  FROM scored)
         |SELECT doc_id, lang, n_toks, score, spent_before
         |FROM run WHERE spent_before < $LangTokenBudget
         |ORDER BY lang, score DESC, doc_id""".stripMargin,

    "q68_token_budget" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS score
         |  FROM documents WHERE len(string_split(text, ' ')) > 0),
         |run AS (
         |  SELECT doc_id, lang, n_toks, score,
         |    CAST(coalesce(sum(n_toks) OVER (PARTITION BY lang
         |      ORDER BY score DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS spent_before
         |  FROM scored)
         |SELECT doc_id, lang, n_toks, score, spent_before
         |FROM run WHERE spent_before < $LangTokenBudget
         |ORDER BY lang, score DESC, doc_id""".stripMargin,

    "q56_repetition" ->
      s"""WITH grams AS (
         |  SELECT doc_id, lang, unnest(${wordNgramSql(5)}) AS g
         |  FROM documents WHERE len(string_split(text,' ')) >= 5)
         |SELECT doc_id, lang, count(*) AS n5, count(DISTINCT g) AS d5,
         |  1.0 - CAST(count(DISTINCT g) AS DOUBLE) / count(*) AS rep_ratio
         |FROM grams GROUP BY doc_id, lang
         |ORDER BY rep_ratio DESC, doc_id""".stripMargin,

    "q92_cluster_survivors" ->
      s"""WITH RECURSIVE $clusterCompCtes,
         |t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
         |${TextAnalysis.qualityMetricsCte("t")},
         |sc AS (SELECT doc_id, ${TextAnalysis.qualityScoreSql} AS score FROM m),
         |ranked AS (
         |  SELECT comp.cluster_id, comp.doc_id, sc.score,
         |    row_number() OVER (PARTITION BY comp.cluster_id
         |      ORDER BY sc.score DESC, comp.doc_id) AS rn
         |  FROM comp JOIN sc USING (doc_id))
         |SELECT cluster_id, count(*) AS n_docs,
         |  max(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id,
         |  max(CASE WHEN rn = 1 THEN score END) AS keep_score
         |FROM ranked GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    "q87_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |${TextAnalysis.qualityMetricsCte("t")},
        |sc AS (SELECT doc_id, ${TextAnalysis.qualityScoreSql} AS score FROM m),
        |keyed AS (SELECT doc_id, score,
        |  round(ln((CAST(${graft.operators.Kmv.hash60Sql("doc_id")} AS DOUBLE) + 1.0)
        |        / 1152921504606846976.0) / score, 9) AS key
        |FROM sc WHERE score > 0)
        |SELECT doc_id, score, key FROM keyed
        |ORDER BY key DESC, doc_id LIMIT $WeightedSampleK""".stripMargin,

    "q83_curation_funnel" -> {
      val p = Dedup.PassageTokens
      s"""WITH base AS (SELECT doc_id, text, string_split(text, ' ') AS toks,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS nt FROM documents),
        |keep1 AS (SELECT min(doc_id) AS doc_id FROM base GROUP BY md5(text)),
        |s2 AS (SELECT b.* FROM base b JOIN keep1 USING (doc_id)),
        |${TextAnalysis.qualityMetricsCte("base")},
        |sc AS (SELECT doc_id, ${TextAnalysis.qualityScoreSql} AS score FROM m),
        |s3 AS (SELECT s2.* FROM s2 JOIN sc USING (doc_id) WHERE sc.score >= $FunnelQualityMin),
        |c AS (SELECT doc_id,
        |  [md5(array_to_string(toks[i*$p+1 : i*$p+$p], ' '))
        |   for i in generate_series(0, CAST(ceil(len(toks) / $p.0) AS INT) - 1)] AS phs
        |FROM s3),
        |e AS (SELECT doc_id, unnest(phs) AS ph FROM c),
        |g AS (SELECT ph, count(*) AS cnt FROM e GROUP BY ph),
        |pd AS (SELECT doc_id, count(*) AS np,
        |  sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS nd FROM e JOIN g USING (ph)
        |GROUP BY doc_id),
        |s4 AS (SELECT s3.* FROM s3 JOIN pd USING (doc_id)
        |       WHERE CAST(nd AS DOUBLE) <= np * $FunnelDupMax)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'raw' AS name, count(*) AS n_docs,
        |    CAST(sum(nt) AS BIGINT) AS n_tokens FROM base
        |  UNION ALL SELECT 2, 'exact_dedup', count(*), CAST(sum(nt) AS BIGINT) FROM s2
        |  UNION ALL SELECT 3, 'quality', count(*), CAST(sum(nt) AS BIGINT) FROM s3
        |  UNION ALL SELECT 4, 'passage_dedup', count(*), CAST(sum(nt) AS BIGINT) FROM s4)
        |ORDER BY stage""".stripMargin
    },

    "q146_source_funnel" -> {
      val p = Dedup.PassageTokens
      s"""WITH base AS (SELECT doc_id, text, string_split(text, ' ') AS toks,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS nt FROM documents),
        |keep1 AS (SELECT min(doc_id) AS doc_id FROM base GROUP BY md5(text)),
        |s2 AS (SELECT b.* FROM base b JOIN keep1 USING (doc_id)),
        |${TextAnalysis.qualityMetricsCte("base")},
        |sc AS (SELECT doc_id, ${TextAnalysis.qualityScoreSql} AS score FROM m),
        |s3 AS (SELECT s2.* FROM s2 JOIN sc USING (doc_id) WHERE sc.score >= $FunnelQualityMin),
        |c AS (SELECT doc_id,
        |  [md5(array_to_string(toks[i*$p+1 : i*$p+$p], ' '))
        |   for i in generate_series(0, CAST(ceil(len(toks) / $p.0) AS INT) - 1)] AS phs
        |FROM s3),
        |e AS (SELECT doc_id, unnest(phs) AS ph FROM c),
        |g AS (SELECT ph, count(*) AS cnt FROM e GROUP BY ph),
        |pd AS (SELECT doc_id, count(*) AS np,
        |  sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS nd FROM e JOIN g USING (ph)
        |GROUP BY doc_id),
        |s4 AS (SELECT s3.* FROM s3 JOIN pd USING (doc_id)
        |       WHERE CAST(nd AS DOUBLE) <= np * $FunnelDupMax)
        |SELECT d.source, count(*) AS n_raw,
        |  CAST(sum(b.nt) AS BIGINT) AS t_raw,
        |  CAST(sum(CASE WHEN m2.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_exact,
        |  CAST(sum(CASE WHEN m3.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_quality,
        |  CAST(sum(CASE WHEN m4.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_final,
        |  CAST(sum(CASE WHEN m4.doc_id IS NOT NULL THEN b.nt ELSE 0 END) AS BIGINT)
        |    AS t_final,
        |  round(CAST(sum(CASE WHEN m4.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS retention
        |FROM base b JOIN documents d USING (doc_id)
        |LEFT JOIN (SELECT doc_id FROM s2) m2 ON b.doc_id = m2.doc_id
        |LEFT JOIN (SELECT doc_id FROM s3) m3 ON b.doc_id = m3.doc_id
        |LEFT JOIN (SELECT doc_id FROM s4) m4 ON b.doc_id = m4.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin
    },

    "q95_dsir_selection" ->
      s"""WITH bg AS (
        |  SELECT doc_id, lang, unnest(${wordNgramSql(2)}) AS g
        |  FROM documents WHERE len(string_split(text,' ')) >= 2),
        |bk AS (SELECT doc_id, lang,
        |  ('0x' || substr(md5(g), 1, 15))::BIGINT % $DsirBuckets AS b FROM bg),
        |raw AS (SELECT b, count(*) AS cr FROM bk GROUP BY b),
        |tgt AS (SELECT b, count(*) AS ct FROM bk WHERE lang = 'en' GROUP BY b),
        |tots AS (SELECT count(*) AS tr,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tt FROM bk),
        |w AS (SELECT raw.b,
        |  CAST(round(ln(((COALESCE(ct, 0) + CAST(1 AS DOUBLE)) / (tt + $DsirBuckets))
        |    * ((tr + CAST($DsirBuckets AS DOUBLE)) / (cr + 1))) * 1000000000) AS BIGINT) AS lw
        |  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tots),
        |ds AS (SELECT bk.doc_id, bk.lang, count(*) AS n_bigrams, sum(w.lw) AS nano
        |       FROM bk JOIN w USING (b) GROUP BY 1, 2)
        |SELECT doc_id, lang, n_bigrams,
        |  round(CAST(nano AS DOUBLE) / 1e9, 6) AS dsir_weight
        |FROM ds ORDER BY dsir_weight DESC, doc_id LIMIT $DsirTopK""".stripMargin,

    "q117_source_kl" ->
      s"""WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |bk AS (SELECT source,
        |  ('0x' || substr(md5(tok), 1, 15))::BIGINT % $KlBuckets AS b FROM tk),
        |census AS (SELECT source, b, count(*) AS c FROM bk GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM census GROUP BY 1),
        |cbt AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM census GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM census),
        |spine AS (SELECT ns.source, ns.ns, g.b
        |          FROM ns, generate_series(0, ${KlBuckets - 1}) AS g(b)),
        |terms AS (SELECT s.source, s.ns,
        |  CAST(round(((coalesce(census.c, 0) + CAST(1 AS DOUBLE)) / (s.ns + $KlBuckets))
        |    * ln(((coalesce(census.c, 0) + CAST(1 AS DOUBLE)) / (s.ns + $KlBuckets))
        |         / ((coalesce(cbt.cb, 0) + CAST(1 AS DOUBLE)) / (tot.nt + $KlBuckets)))
        |    * 1000000000) AS BIGINT) AS nano
        |  FROM spine s
        |  LEFT JOIN census ON s.source = census.source AND s.b = census.b
        |  LEFT JOIN cbt ON s.b = cbt.b CROSS JOIN tot)
        |SELECT source, ns AS n_tokens,
        |  round(CAST(sum(nano) AS DOUBLE) / 1e9, 6) AS kl
        |FROM terms GROUP BY source, ns ORDER BY source""".stripMargin,

    "q118_interleave_mix" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |${TextAnalysis.qualityMetricsCte("t")},
        |sc AS (SELECT doc_id,
        |  CAST(floor((${TextAnalysis.qualityScoreSql}) * 1e9 + 0.5) AS BIGINT) AS nscore
        |  FROM m),
        |ranked AS (SELECT d.source, sc.doc_id, sc.nscore,
        |    CAST(row_number() OVER (PARTITION BY d.source
        |      ORDER BY sc.nscore DESC, sc.doc_id) AS BIGINT) AS rnk
        |  FROM documents d JOIN sc ON d.doc_id = sc.doc_id),
        |mix AS (SELECT CAST(row_number() OVER (ORDER BY rnk, source) AS BIGINT) AS seq,
        |    source, rnk, doc_id, CAST(nscore AS DOUBLE) / 1e9 AS score
        |  FROM ranked WHERE rnk <= $MixPerSource)
        |SELECT seq, source, rnk, doc_id, score FROM mix
        |WHERE seq <= $MixTotal ORDER BY seq""".stripMargin,

    "q155_cluster_sizes" ->
      s"""WITH RECURSIVE $clusterCompCtes,
        |sz AS (SELECT cluster_id, count(*) AS sz FROM comp GROUP BY cluster_id),
        |cl AS (SELECT count(*) AS n_clusters,
        |         CAST(coalesce(sum(sz), 0) AS BIGINT) AS n_docs FROM sz),
        |tot AS (SELECT count(*) AS n FROM documents),
        |bk AS (SELECT CAST(length(bin(sz)) - 1 AS BIGINT) AS bucket,
        |         count(*) AS n_clusters, CAST(sum(sz) AS BIGINT) AS n_docs
        |       FROM sz GROUP BY 1),
        |sing AS (SELECT CAST(0 AS BIGINT) AS bucket,
        |    CAST(tot.n - cl.n_docs AS BIGINT) AS n_clusters,
        |    CAST(tot.n - cl.n_docs AS BIGINT) AS n_docs
        |  FROM tot, cl)
        |SELECT bucket, CAST(sum(n_clusters) AS BIGINT) AS n_clusters,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs
        |FROM (SELECT * FROM bk UNION ALL SELECT * FROM sing)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q156_doc_verdicts" -> {
      val p = Dedup.PassageTokens
      s"""WITH base AS (SELECT doc_id, text, string_split(text, ' ') AS toks,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS nt FROM documents),
        |keep1 AS (SELECT min(doc_id) AS doc_id FROM base GROUP BY md5(text)),
        |s2 AS (SELECT b.* FROM base b JOIN keep1 USING (doc_id)),
        |${TextAnalysis.qualityMetricsCte("base")},
        |sc AS (SELECT doc_id, ${TextAnalysis.qualityScoreSql} AS score FROM m),
        |s3 AS (SELECT s2.* FROM s2 JOIN sc USING (doc_id) WHERE sc.score >= $FunnelQualityMin),
        |c AS (SELECT doc_id,
        |  [md5(array_to_string(toks[i*$p+1 : i*$p+$p], ' '))
        |   for i in generate_series(0, CAST(ceil(len(toks) / $p.0) AS INT) - 1)] AS phs
        |FROM s3),
        |e AS (SELECT doc_id, unnest(phs) AS ph FROM c),
        |g AS (SELECT ph, count(*) AS cnt FROM e GROUP BY ph),
        |pd AS (SELECT doc_id, count(*) AS np,
        |  sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS nd FROM e JOIN g USING (ph)
        |GROUP BY doc_id),
        |s4 AS (SELECT s3.* FROM s3 JOIN pd USING (doc_id)
        |       WHERE CAST(nd AS DOUBLE) <= np * $FunnelDupMax)
        |SELECT b.doc_id, b.nt AS n_tokens,
        |  CAST(CASE WHEN m2.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS pass_exact,
        |  CAST(CASE WHEN m3.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS pass_quality,
        |  CAST(CASE WHEN m4.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS pass_final
        |FROM base b
        |LEFT JOIN (SELECT doc_id FROM s2) m2 ON b.doc_id = m2.doc_id
        |LEFT JOIN (SELECT doc_id FROM s3) m3 ON b.doc_id = m3.doc_id
        |LEFT JOIN (SELECT doc_id FROM s4) m4 ON b.doc_id = m4.doc_id
        |ORDER BY b.doc_id""".stripMargin
    },

    "q154_data_constrained_mix" ->
      s"""WITH ${waterfallCtes(WaterfallRounds)}
        |SELECT source, c AS n_tokens, cap AS cap_tokens, prov AS alloc_tokens,
        |  CAST(CASE WHEN capped THEN 1 ELSE 0 END AS BIGINT) AS capped,
        |  round(CAST(prov AS DOUBLE) / c, 6) AS epochs
        |FROM p$WaterfallRounds ORDER BY source""".stripMargin,

    "q150_balanced_eval" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |${TextAnalysis.qualityMetricsCte("t")},
        |sc AS (SELECT doc_id, (${TextAnalysis.qualityScoreSql}) AS score FROM m),
        |d AS (SELECT doc.doc_id, doc.source,
        |        CASE WHEN sc.score >= 0.8 THEN 'high'
        |             WHEN sc.score >= 0.6 THEN 'medium' ELSE 'low' END AS bucket,
        |        ('0x' || substr(md5(CAST(doc.doc_id AS VARCHAR)), 1, 15))::BIGINT
        |          AS hkey
        |      FROM documents doc JOIN sc ON doc.doc_id = sc.doc_id),
        |r AS (SELECT source, bucket, doc_id,
        |        row_number() OVER (PARTITION BY source, bucket
        |          ORDER BY hkey DESC, doc_id) AS rnk
        |      FROM d)
        |SELECT source, bucket, CAST(rnk AS BIGINT) AS rnk, doc_id
        |FROM r WHERE rnk <= $EvalQuota
        |ORDER BY source, bucket, rnk""".stripMargin,

    "q148_context_sweep" ->
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |offs AS (
        |  SELECT doc_id, n_toks,
        |    CAST(coalesce(sum(n_toks) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS off
        |  FROM toks),
        |sw AS (
        |  SELECT c.ctx, o.doc_id, o.n_toks,
        |    CASE WHEN o.off // c.ctx <> (o.off + o.n_toks - 1) // c.ctx
        |         THEN 1 ELSE 0 END AS straddle
        |  FROM offs o, (VALUES (${CtxSweep.mkString("), (")})) AS c(ctx))
        |SELECT CAST(ctx AS BIGINT) AS ctx, count(*) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |  CAST(ceil(CAST(sum(n_toks) AS DOUBLE) / ctx) AS BIGINT) AS n_windows,
        |  CAST(sum(straddle) AS BIGINT) AS straddle_docs,
        |  round(CAST(sum(straddle) AS DOUBLE) / count(*), 6) AS straddle_frac
        |FROM sw GROUP BY ctx ORDER BY ctx""".stripMargin,

    "q143_effective_tokens" ->
      s"""WITH RECURSIVE $clusterCompCtes,
        |d AS (SELECT doc_id, source,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |      FROM documents),
        |k AS (SELECT d.source, d.nt,
        |        CASE WHEN c.doc_id IS NULL OR c.cluster_id = d.doc_id
        |             THEN 1 ELSE 0 END AS kept
        |      FROM d LEFT JOIN comp c ON d.doc_id = c.doc_id)
        |SELECT source, count(*) AS docs,
        |  CAST(sum(nt) AS BIGINT) AS raw_tokens,
        |  CAST(sum(kept) AS BIGINT) AS kept_docs,
        |  CAST(sum(CASE WHEN kept = 1 THEN nt ELSE 0 END) AS BIGINT)
        |    AS effective_tokens,
        |  round(CAST(sum(CASE WHEN kept = 1 THEN nt ELSE 0 END) AS DOUBLE)
        |    / sum(nt), 6) AS effective_ratio
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

    "q142_quality_dup_calibration" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |${TextAnalysis.qualityMetricsCte("t")},
        |sc AS (SELECT doc_id, n_tokens,
        |         (${TextAnalysis.qualityScoreSql}) AS score FROM m),
        |sh AS (
        |  SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS s
        |  FROM (SELECT DISTINCT doc_id, unnest(${Dedup.shingleSql}) AS g
        |        FROM documents WHERE len(string_split(text,' ')) >= 3)),
        |n AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT i, j FROM inter
        |  JOIN n na ON na.doc_id = i JOIN n nb ON nb.doc_id = j
        |  WHERE CAST(inter AS DOUBLE) / (na.ns + nb.ns - inter) >= 0.8),
        |dup AS (SELECT DISTINCT doc_id FROM
        |  (SELECT i AS doc_id FROM pairs UNION ALL SELECT j FROM pairs)),
        |banded AS (
        |  SELECT sc.doc_id,
        |    least(CAST(floor(sc.score * 10) AS BIGINT), 9) AS band,
        |    sc.n_tokens,
        |    CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
        |  FROM sc LEFT JOIN dup d ON sc.doc_id = d.doc_id)
        |SELECT band, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
        |  round(CAST(sum(is_dup) AS DOUBLE) / count(*), 6) AS dup_rate
        |FROM banded GROUP BY band ORDER BY band""".stripMargin,

    "q138_domain_cap" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |${TextAnalysis.qualityMetricsCte("t")},
        |sc AS (SELECT doc_id, n_tokens,
        |  CAST(floor((${TextAnalysis.qualityScoreSql}) * 1e9 + 0.5) AS BIGINT) AS nscore
        |  FROM m),
        |ranked AS (SELECT d.source, sc.doc_id, sc.n_tokens,
        |    row_number() OVER (PARTITION BY d.source
        |      ORDER BY sc.nscore DESC, sc.doc_id) AS rnk
        |  FROM documents d JOIN sc ON d.doc_id = sc.doc_id)
        |SELECT source, count(*) AS docs,
        |  CAST(sum(CASE WHEN rnk <= $DomainCap THEN 1 ELSE 0 END) AS BIGINT)
        |    AS kept_docs,
        |  count(*) - CAST(sum(CASE WHEN rnk <= $DomainCap THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dropped_docs,
        |  CAST(sum(CASE WHEN rnk <= $DomainCap THEN n_tokens ELSE 0 END) AS BIGINT)
        |    AS kept_tokens,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM ranked GROUP BY source ORDER BY source""".stripMargin,

    "q140_temperature_mix" ->
      s"""WITH c AS (SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |s AS (SELECT source, n_tokens,
        |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS nsqrt
        |  FROM c),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS totc,
        |    CAST(sum(nsqrt) AS BIGINT) AS tots FROM s)
        |SELECT source, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / totc, 6) AS w_prop,
        |  round(CAST(nsqrt AS DOUBLE) / tots, 6) AS w_temp,
        |  round($TempBudget * (CAST(nsqrt AS DOUBLE) / tots)
        |    / CAST(n_tokens AS DOUBLE), 6) AS epochs_temp
        |FROM s, tot ORDER BY source""".stripMargin,

    // q68's greedy budget re-keyed on the PREDICTED language — lang_pred
    // recomputed in SQL from the same marker profile (langPredCte), so
    // scorer + selection are both cross-checked in one query
    "q175_budget_predlang" ->
      s"""WITH ${TextAnalysis.langPredCte},
        |scored AS (
        |  SELECT d.doc_id, p.lang_pred,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks,
        |    CAST(len(list_distinct(string_split(d.text, ' '))) AS DOUBLE)
        |      / len(string_split(d.text, ' ')) AS score
        |  FROM documents d JOIN pred p USING (doc_id)
        |  WHERE len(string_split(d.text, ' ')) > 0),
        |run AS (
        |  SELECT doc_id, lang_pred, n_toks, score,
        |    CAST(coalesce(sum(n_toks) OVER (PARTITION BY lang_pred
        |      ORDER BY score DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS spent_before
        |  FROM scored)
        |SELECT doc_id, lang_pred, n_toks, score, spent_before
        |FROM run WHERE spent_before < $LangTokenBudget
        |ORDER BY lang_pred, score DESC, doc_id""".stripMargin,

    // q140's temperature mix re-keyed on the predicted language
    "q176_temperature_predlang" ->
      s"""WITH ${TextAnalysis.langPredCte},
        |c AS (SELECT p.lang_pred,
        |    CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents d JOIN pred p USING (doc_id) GROUP BY 1),
        |s AS (SELECT lang_pred, n_tokens,
        |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS nsqrt
        |  FROM c),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS totc,
        |    CAST(sum(nsqrt) AS BIGINT) AS tots FROM s)
        |SELECT lang_pred, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / totc, 6) AS w_prop,
        |  round(CAST(nsqrt AS DOUBLE) / tots, 6) AS w_temp,
        |  round($TempBudget * (CAST(nsqrt AS DOUBLE) / tots)
        |    / CAST(n_tokens AS DOUBLE), 6) AS epochs_temp
        |FROM s, tot ORDER BY lang_pred""".stripMargin,

    "q96_source_novelty" ->
      s"""WITH sh AS (
        |  SELECT DISTINCT source, ('0x' || substr(md5(g), 1, 15))::BIGINT AS s
        |  FROM (SELECT source, unnest(${wordNgramSql(3)}) AS g FROM documents
        |        WHERE len(string_split(text,' ')) >= 3)),
        |sc AS (SELECT s, count(*) AS nsrc FROM sh GROUP BY s)
        |SELECT source, count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  round(CAST(sum(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS novelty
        |FROM sh JOIN sc USING (s) GROUP BY source ORDER BY source""".stripMargin,

    "q98_length_outliers" ->
      """WITH m AS (
        |  SELECT source, CAST(round(2 * quantile_cont(n_chars, 0.5), 0) AS BIGINT) AS med2
        |  FROM documents GROUP BY source),
        |d AS (SELECT dd.doc_id, dd.source, dd.n_chars, m.med2,
        |        abs(2 * dd.n_chars - m.med2) AS d2
        |      FROM documents dd JOIN m USING (source)),
        |s AS (SELECT source, CAST(round(2 * quantile_cont(d2, 0.5), 0) AS BIGINT) AS mad4
        |      FROM d GROUP BY source)
        |SELECT d.doc_id, d.source, d.n_chars, d.med2 / 2.0 AS med, s.mad4 / 4.0 AS mad
        |FROM d JOIN s USING (source)
        |WHERE abs(4 * d.n_chars - 2 * d.med2) > 3 * s.mad4
        |ORDER BY d.source, d.doc_id""".stripMargin,

    "q78_mix_allocation" ->
      """WITH s AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |r AS (SELECT *,
        |    CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS rank,
        |    CAST(count(*) OVER () AS BIGINT) AS n_src
        |  FROM s),
        |w AS (SELECT *, n_src - rank + 1 AS weight FROM r),
        |t AS (SELECT sum(n_tokens) AS tot, sum(weight) AS den FROM w),
        |a AS (SELECT w.*,
        |  CAST(least(n_tokens, (tot // 2) * weight // den) AS BIGINT) AS alloc_tokens
        |  FROM w, t)
        |SELECT source, n_docs, n_tokens, weight, alloc_tokens,
        |  round(CAST(alloc_tokens AS DOUBLE) / n_tokens, 6) AS rate
        |FROM a ORDER BY source""".stripMargin,
  )

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q131_leakage_splits" -> (q131LeakageSplits _),
    "q135_shuffle_shard" -> (q135ShuffleShard _),
    "q50_dedup_clusters" -> (q50DedupClusters _),
    "q51_stratified_sample" -> (q51StratifiedSample _),
    "q52_decontaminate" -> (q52Decontaminate _),
    "q53_pack_windows" -> (q53PackWindows _),
    "q54_chunk_overlap" -> (q54ChunkOverlap _),
    "q110_cdc_chunks" -> (q110CdcChunks _),
    "q55_vocab_topk" -> (q55VocabTopk _),
    "q56_repetition" -> (q56Repetition _),
    "q78_mix_allocation" -> (q78MixAllocation _),
    "q83_curation_funnel" -> (q83CurationFunnel _),
    "q87_weighted_sample" -> (q87WeightedSample _),
    "q92_cluster_survivors" -> (q92ClusterSurvivors _),
    "q68_token_budget" -> (q68TokenBudget _),
    "q95_dsir_selection" -> (q95DsirSelection _),
    "q146_source_funnel" -> (q146SourceFunnel _),
    "q96_source_novelty" -> (q96SourceNovelty _),
    "q98_length_outliers" -> (q98LengthOutliers _),
    "q117_source_kl" -> (q117SourceKl _),
    "q118_interleave_mix" -> (q118InterleaveMix _),
    "q124_subword_budget" -> (q124SubwordBudget _),
    "q138_domain_cap" -> (q138DomainCap _),
    "q140_temperature_mix" -> (q140TemperatureMix _),
    "q175_budget_predlang" -> (q175BudgetPredLang _),
    "q176_temperature_predlang" -> (q176TemperaturePredLang _),
    "q142_quality_dup_calibration" -> (q142QualityDupCalibration _),
    "q143_effective_tokens" -> (q143EffectiveTokens _),
    "q148_context_sweep" -> (q148ContextSweep _),
    "q150_balanced_eval" -> (q150BalancedEval _),
    "q154_data_constrained_mix" -> (q154DataConstrainedMix _),
    "q155_cluster_sizes" -> (q155ClusterSizes _),
    "q156_doc_verdicts" -> (q156DocVerdicts _),
  )
}
