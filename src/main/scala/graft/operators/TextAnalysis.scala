package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (driver north star:
  * language-ID, quality scoring, token counting, fingerprinting).
  *
  * Cross-engine determinism: all metrics are integer counts, string hashes
  * (md5), or doubles derived from integer division — each reproducible
  * bit-for-bit in the DuckDB oracles. Tokenization is a plain
  * split-on-space in both engines.
  *
  * Scale notes (100 TB): every query is a narrow per-row map (codegen'd
  * higher-order functions on the tokens array, no UDFs, no shuffle except
  * the final aggregate where present). Token explosion is avoided — counts
  * come from `size(filter(...))`/`regexp_count` without generating rows.
  */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Queries.t(spark, dir, "documents").withColumn("toks", split(col("text"), " "))

  /** Per-document token statistics (token counting). */
  def q20TextStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        length(col("text")).cast("long").as("n_chars"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") /
          size(col("toks"))).as("avg_tok_len"))
      .orderBy(col("doc_id"))

  /** Stopword lists for the n-gram/stopword language-ID heuristic. */
  private val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(", ")

  /** Language identification via stopword-hit voting (deterministic argmax
    * with fixed tie order en > de > es > fr > und).
    */
  def q21LangId(spark: SparkSession, dir: String): DataFrame = {
    val hits = langStops.map { case (lang, words) =>
      expr(s"size(filter(toks, t -> t IN (${inList(words)})))").cast("long")
        .as(s"${lang}_hits")
    }
    docs(spark, dir)
      .select(col("doc_id") +: hits: _*)
      .withColumn("pred_lang",
        when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits") &&
             col("en_hits") >= col("fr_hits") && col("en_hits") > 0, "en")
        .when(col("de_hits") >= col("es_hits") && col("de_hits") >= col("fr_hits") &&
              col("de_hits") > 0, "de")
        .when(col("es_hits") >= col("fr_hits") && col("es_hits") > 0, "es")
        .when(col("fr_hits") > 0, "fr")
        .otherwise("und"))
      .orderBy(col("doc_id"))
  }

  /** Char-n-gram language profiles for [[q162CharLangId]]: per language, a
    * small set of high-frequency character trigram markers (linguistic
    * anchors — German function-word cores, Spanish/French clitic+article
    * patterns, common hanzi for zh). A linear score over char-n-gram
    * counts is exactly the fastText/CCNet langid model shape reduced to a
    * literal profile table; character level (unlike [[q21LangId]]'s word
    * votes) needs no tokenizer and survives noisy web text. Public anchor:
    * Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
    * from Web Crawl Data" (2019).
    */
  private[graft] val CharLangMarkers: Seq[(String, Seq[String])] = Seq(
    // Round 11 widened each profile after measuring 0.86 accuracy on the
    // 50-sentence real fixture (Round11OpsSpec) — the misses were texts
    // whose five original markers simply never fire (classical zh, short
    // aphoristic es/fr). Markers may overlap across languages (fr/es
    // both claim " la"): the argmax weighs total evidence, it does not
    // need exclusivity — the fastText/CCNet shape.
    "de" -> Seq("der", "ein", "sch", "und", "ich", "die", "cht"),
    "en" -> Seq("the", " th", "ing", " of", "and", "er ", " me"),
    "es" -> Seq(" de", "que", "ión", " la", "los", " el", "ino"),
    "fr" -> Seq(" le", "les", "eur", "ait", "aux", " un", " qu", "oir", " la"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不", "有", "来"))

  /** Char-n-gram language identification (q162) — the pipeline stage that
    * PRODUCES a language label (q68/q117/q140 consume one): per document,
    * an integer marker-occurrence score per language, argmax with
    * smallest-lang tie-break, `und` when no marker fires. Output is the
    * (actual, predicted) confusion census against the corpus's stored
    * `lang` column. NOTE the testdata labels are synthetic (the text is a
    * uniform token soup regardless of label), so the census measures the
    * scorer's determinism under the oracle, not recall — the spec's
    * bilingual corpus with real sentences is where identification itself
    * is proven.
    *
    * Scale shape: occurrence counting is `length − length(replace(..))`
    * per marker — pure codegen'd per-row expressions, NO token explosion,
    * no cross join, no shuffle except the final bounded confusion-matrix
    * aggregate (≤ |langs|² rows). The profile table is compiled into the
    * plan as literals — the 100 TB form ships a broadcast weight table
    * exactly like q105's classifier.
    */
  def q162CharLangId(spark: SparkSession, dir: String): DataFrame =
    withCharLangPred(docs(spark, dir))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("lang_pred"))

  /** Attach `lang_pred` to any frame with a `text` column — the reusable
    * langid kernel ([[q162CharLangId]] is its confusion census; a pipeline
    * would call this right after ingest to produce the `lang` column).
    * Per-row codegen expressions only; adds no shuffle to the input plan.
    */
  private[graft] def withCharLangPred(df: DataFrame): DataFrame = {
    // ONE Aho-Corasick pass counts every marker at once
    // ([[graft.functions.MultiSubstrCount]]) — the round-10 kernel's
    // per-marker `length - replace` formulation scanned the document
    // once PER marker (37 passes after the round-11 profile widening).
    // Counts are provably identical (no marker self-overlaps; the
    // expression enforces it), so the replace-based ORACLE is unchanged.
    graft.functions.GraftFunctions.register(df.sparkSession)
    val flat = CharLangMarkers.flatMap(_._2)
    val mc = call_function("multi_substr_count", col("text"),
      array(flat.map(lit): _*))
    var base = 0
    val scores = CharLangMarkers.map { case (lang, ms) =>
      val s = ms.indices
        .map(j => element_at(col("_mc"), base + j + 1))
        .reduce[org.apache.spark.sql.Column](_ + _)
      base += ms.length
      lang -> s.cast("long")
    }
    // argmax by (score, tie-priority): priority DESCENDS in lang order, so
    // an equal-score tie resolves to the lexicographically smallest lang —
    // the same rule the oracle's (score DESC, lang ASC) row_number applies
    val candidates = scores.zipWithIndex.map { case ((lang, s), i) =>
      struct(s.as("s"), lit(CharLangMarkers.size - i).as("p"), lit(lang).as("l"))
    }
    val best = array_max(array(candidates: _*))
    df.withColumn("_mc", mc)
      .withColumn("lang_pred",
        when(best.getField("s") === 0L, lit("und")).otherwise(best.getField("l")))
      .drop("_mc")
  }

  /** Shared oracle CTE computing `pred(doc_id, lang_pred)` — the ONE SQL
    * copy of [[withCharLangPred]]'s argmax (marker table interpolated from
    * [[CharLangMarkers]]), consumed by q162's confusion census and by the
    * pred-driven pipeline variants (q175/q176) so the scorer and every
    * oracle that uses it cannot drift.
    */
  private[operators] def langPredCte: String = {
    val vals = CharLangMarkers.flatMap { case (l, ms) =>
      ms.map(m => s"('$l', '${m.replace("'", "''")}')")
    }.mkString(", ")
    s"""mk(lang_m, g) AS (VALUES $vals),
      |sc AS (SELECT d.doc_id, mk.lang_m,
      |        sum((length(d.text) - length(replace(d.text, mk.g, '')))
      |            // length(mk.g)) AS score
      |      FROM documents d CROSS JOIN mk GROUP BY 1, 2),
      |lp AS (SELECT doc_id,
      |        CASE WHEN score = 0 THEN 'und' ELSE lang_m END AS lang_pred,
      |        row_number() OVER (PARTITION BY doc_id
      |          ORDER BY score DESC, lang_m ASC) AS rn
      |      FROM sc),
      |pred AS (SELECT doc_id, lang_pred FROM lp WHERE rn = 1)""".stripMargin
  }

  /** Oracle fragment mirroring [[q21LangId]]'s hit columns. */
  private def langHitsSql: String = langStops.map { case (lang, words) =>
    s"len(list_filter(toks, t -> t IN (${inList(words)}))) AS ${lang}_hits"
  }.mkString(",\n  ")

  /** Oracle CTE mirroring [[qualityScored]]'s integer metrics over `src`
    * (needs doc_id, text, toks in scope) — the ONE SQL copy of the q22
    * metric definitions, interpolated by every oracle that scores quality
    * (q22, q83, q87) so the engines and the oracles cannot drift.
    */
  private[operators] def qualityMetricsCte(src: String): String =
    s"""m AS (SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
      |  len(list_filter(toks, t -> length(t) <= 2)) AS n_short,
      |  len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
      |  length(text) AS n_chars,
      |  len(list_filter(toks, t -> t IN (${inList(langStops.head._2)}))) AS n_stop
      |FROM $src)""".stripMargin

  /** Oracle expression for the q22 score over [[qualityMetricsCte]]'s
    * columns — float-op-identical to [[qualityScored]] (ratio first, then
    * the weighted sum).
    */
  private[operators] val qualityScoreSql: String =
    """CAST(n_distinct AS DOUBLE) / n_tokens * 0.5 +
      |  (1.0 - CAST(n_short AS DOUBLE) / n_tokens) * 0.3 +
      |  (1.0 - CASE WHEN n_chars = 0 THEN 0.0
      |              ELSE CAST(n_punct AS DOUBLE) / n_chars END) * 0.1 +
      |  (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.1""".stripMargin

  /** Quality scoring: distinct-token, short-token, punctuation, and
    * stopword ratios combined into one double score + a bucket label (the
    * length/punct/stopword signal set of a training-data quality filter).
    */
  def q22Quality(spark: SparkSession, dir: String): DataFrame =
    qualityScored(docs(spark, dir))
      .withColumn("bucket",
        when(col("score") >= 0.8, "high")
          .when(col("score") >= 0.6, "medium").otherwise("low"))
      .select("doc_id", "n_tokens", "distinct_ratio", "short_ratio",
        "punct_ratio", "stopword_ratio", "score", "bucket")
      .orderBy(col("doc_id"))

  /** The q22 ratio/score columns over a frame with (doc_id, text, toks) —
    * shared with the q83 funnel so the two can never drift on the formula.
    */
  private[graft] def qualityScored(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        expr("size(filter(toks, t -> length(t) <= 2))").cast("long").as("n_short"),
        regexp_count(col("text"), lit("[^a-z0-9 ]")).cast("long").as("n_punct"),
        length(col("text")).cast("long").as("n_chars"),
        expr(s"size(filter(toks, t -> t IN (${inList(langStops.head._2)})))")
          .cast("long").as("n_stop"))
      .withColumn("distinct_ratio", col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("short_ratio", col("n_short").cast("double") / col("n_tokens"))
      .withColumn("punct_ratio", // empty doc: 0, not NULL-vs-NaN across engines
        when(col("n_chars") === 0, lit(0.0))
          .otherwise(col("n_punct").cast("double") / col("n_chars")))
      .withColumn("stopword_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("score",
        col("distinct_ratio") * lit(0.5) + (lit(1.0) - col("short_ratio")) * lit(0.3) +
          (lit(1.0) - col("punct_ratio")) * lit(0.1) +
          (lit(1.0) - col("stopword_ratio")) * lit(0.1))

  /** Regex token classes per source (BPE-ish segmentation counts): word runs,
    * single-char tokens, aggregated per source.
    */
  def q23TokenClasses(spark: SparkSession, dir: String): DataFrame =
    Queries.t(spark, dir, "documents")
      .select(col("source"),
        regexp_count(col("text"), lit("[a-z]+")).cast("long").as("alpha_runs"),
        regexp_count(col("text"), lit("\\b[a-z]\\b")).cast("long").as("single_chars"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("alpha_runs")).as("sum_alpha_runs"),
        sum(col("single_chars")).as("sum_single_chars"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))

  /** Document fingerprinting: whole-content md5 + min-shingle fingerprint
    * (the 1-hash MinHash special case used for content-defined chunk ids).
    */
  def q24Fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("shingles", Dedup.shingleExpr)
      .select(col("doc_id"),
        md5(col("text")).as("content_md5"),
        expr("array_min(transform(shingles, s -> md5(s)))").as("min_shingle_fp"),
        size(col("shingles")).cast("long").as("n_shingles"))
      .orderBy(col("doc_id"))

  /** Edit-distance similarity (SURVEY F1 + dedup family): levenshtein over
    * consecutive doc pairs (a defined, bounded pairing — full pairwise edit
    * distance is O(n² · len²) and never the scale path; at 100 TB edit
    * distance runs only on LSH/MinHash candidates).
    */
  def q25EditDistance(spark: SparkSession, dir: String): DataFrame = {
    val d = Queries.t(spark, dir, "documents").select("doc_id", "text")
    d.as("a").join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        levenshtein(col("a.text"), col("b.text")).cast("long").as("lev"),
        greatest(length(col("a.text")), length(col("b.text"))).cast("long").as("max_len"))
      .withColumn("sim", lit(1.0) - col("lev").cast("double") / col("max_len"))
      .orderBy(col("i"))
  }

  /** Polynomial rolling-hash fingerprinting (the task's "rolling hash"
    * deliverable): whole-document hash h = fold((acc*31 + code) mod p) over
    * char codes, plus the minimum 8-char-gram rolling hash (the winnowing
    * min-fingerprint used for content-defined chunking). Pure integer
    * arithmetic — identical in both engines (Spark's 0-seeded fold equals
    * DuckDB's first-element-seeded list_reduce for this recurrence).
    */
  def q28RollingHash(spark: SparkSession, dir: String): DataFrame = {
    // ONE native pass per document (round 21): the pre-r21 SQL shape
    // (kept verbatim in the oracle) materialized the per-char code array
    // once per consuming column (projection collapse inlines it into
    // full_hash, min_gram_hash AND n_chars) and re-folded every 8-gram
    // from scratch through the interpreted higher-order-function
    // evaluator — the q28 32-core anti-scaling cliff (allocation
    // pressure scales with concurrent tasks). [[graft.functions.
    // RollingHashStats]] computes the identical residues in one tight
    // code-point loop; inline() surfaces the struct's fields as columns
    // with a single evaluation per row.
    graft.functions.GraftFunctions.register(spark)
    Queries.t(spark, dir, "documents")
      .select(col("doc_id"),
        expr("inline(array(rolling_hash_stats(text)))"))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF term scoring: top-3 terms per document (first 50 docs) by
    * tf * ln((N+1)/(df+1)), rounded to 6 decimals for cross-engine rank
    * stability, tie-broken by term.
    *
    * Scale shape: the REQUESTED doc set (here `doc_id < 50`) is filtered
    * BEFORE the vocabulary join and is the broadcast side — a web-scale
    * vocabulary (typos, URLs, numerals) is corpus-sized and must flow
    * through the join shuffled, never broadcast. The df aggregation still
    * sees every (doc, term) pair once (that is what df means); its shuffle
    * is the irreducible cost and is map-side combined.
    */
  def q29Tfidf(spark: SparkSession, dir: String): DataFrame = {
    val toks = Queries.t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = toks.filter(col("doc_id") < 50)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.distinct().groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = Queries.t(spark, dir, "documents").agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    dfreq.join(broadcast(tf), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("doc_id", "term", "tf", "df", "score", "rn")
      .orderBy(col("doc_id"), col("rn"))
  }

  /** Character-level Shannon entropy per document — the perplexity-proxy
    * quality signal: near-zero entropy = degenerate repetition (aaaa…),
    * unusually high = random junk/binary-in-text; both are filtered before
    * training. Shape: explode to (doc, char), two-level hash agg — the
    * per-doc alphabet is bounded (~100 symbols), so map-side combine
    * collapses each doc to its histogram before anything shuffles. Entropy
    * = log2(n) - Σ c·log2(c) / n over the integer histogram; log2 is the
    * one step not guaranteed correctly-rounded across engines, so the
    * result rounds to 6 decimals on both sides (the percentile precedent).
    */
  def q71CharEntropy(spark: SparkSession, dir: String): DataFrame =
    Queries.t(spark, dir, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("lang"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n_chars"),
        count(lit(1)).as("n_distinct"),
        sum(col("c").cast("double") * log2(col("c").cast("double"))).as("clg"))
      .withColumn("entropy",
        round(log2(col("n_chars").cast("double")) - col("clg") / col("n_chars"), 6))
      .select("doc_id", "lang", "n_chars", "n_distinct", "entropy")
      .orderBy(col("doc_id"))

  /** Bigram language-model scoring (q77) — the CCNet/KenLM-style quality
    * filter: train bigram conditional frequencies ON the corpus, then score
    * each document by its mean bigram log-probability
    * avg(ln(c(w1 w2) / c(w1 ·))). Low scores = improbable token sequences
    * (junk/garbled text); unusually high = degenerate repetition. Both
    * tails are cut before training.
    *
    * Scale shape (100 TB): bigram explosion is the codegen
    * [[graft.functions.WordNgrams]] kernel (no shuffle); the model is two
    * hash-aggs (bigram counts, prefix counts — map-side combined); scoring
    * joins the bigram stream against the model on the bigram/prefix keys —
    * shuffle equi-joins whose build side is vocabulary²-bounded, with the
    * exploded stream's exchange reused between the count and join
    * consumers. No windows, no broadcast of anything corpus-sized.
    *
    * Determinism: per-bigram log-probs are summed as ROUNDED INTEGER
    * nano-units (order-independent bigint sum), not doubles — float
    * accumulation order would differ between Spark's partial aggregates
    * and DuckDB; ln() 1-ulp differences are absorbed by the nano-round
    * followed by the 6-decimal output round.
    */
  def q77BigramLm(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val bi = Queries.t(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr("word_ngrams(toks, 2)")).as("bg"))
      .withColumn("w1", expr("split_part(bg, ' ', 1)"))
    val cBi = bi.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val cW1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("cw"))
    bi.join(cBi, Seq("bg")).join(cW1, Seq("w1"))
      .withColumn("lp_nano", expr(
        "CAST(round(ln(CAST(cb AS DOUBLE) / cw) * 1000000000) AS BIGINT)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_nano")).as("nano"))
      .withColumn("avg_logprob",
        round(col("nano").cast("double") / col("n_bigrams") / 1e9, 6))
      .select("doc_id", "n_bigrams", "avg_logprob")
      .orderBy(col("doc_id"))
  }

  /** Reference source whose bigrams train the q134 held-out LM. */
  private val LmRefSource = "src0"

  /** Rounded avg-logprob at or below which q134 flags a doc off-domain. */
  private val OffDomainTau = -3.5

  /** Held-out LM scoring (q134) — the CCNet selection recipe: train a
    * bigram LM on a REFERENCE source only ([[LmRefSource]], standing in
    * for the curated "clean" corpus CCNet trains its KenLM on), then
    * score EVERY document — including other sources the model never saw —
    * by add-one-smoothed per-bigram log-probability
    * ln((c(w1,w2)+1) / (c(w1)+V)). Unlike q77 (self-trained, a fluency
    * signal), the held-out model measures DOMAIN MISMATCH: a source
    * whose usage diverges from the reference scores low and is flagged
    * for review/filtering — the production gate that keeps a pretraining
    * mix anchored to a quality reference.
    *
    * Determinism is q77's recipe (nano-int log-prob sums, 6-decimal
    * output round). Scale shape: the model tables (bigram and unigram
    * censuses of the REFERENCE source) are vocabulary-sized, not
    * corpus-sized — the production contract is a bounded shipped model
    * (CCNet's fixed KenLM); the scoring pass joins the corpus bigram
    * stream against them keyed on the bigram string, a narrow shuffle
    * Spark broadcasts when the model is small. The bigram stream is
    * checkpointed once and feeds both the training censuses and the
    * scoring pass.
    */
  def q134CrossLm(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val bi = Queries.t(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(expr("word_ngrams(toks, 2)")).as("bg"))
      .withColumn("w1", expr("split_part(bg, ' ', 1)"))
      .localCheckpoint(false)
    val ref = bi.filter(col("source") === LmRefSource)
    val cBi = ref.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val cW1 = ref.groupBy(col("w1")).agg(count(lit(1)).as("cw"))
    val vocab = ref.agg(countDistinct(col("w1")).as("v"))
    bi.join(cBi, Seq("bg"), "left")
      .join(cW1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp_nano", expr(
        """CAST(round(ln(CAST(coalesce(cb, 0L) + 1 AS DOUBLE)
          |  / CAST(coalesce(cw, 0L) + v AS DOUBLE)) * 1000000000) AS BIGINT)"""
          .stripMargin))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_nano")).as("nano"))
      .withColumn("avg_logprob",
        round(col("nano").cast("double") / col("n_bigrams") / 1e9, 6))
      .withColumn("off_domain", col("avg_logprob") < OffDomainTau)
      .select("doc_id", "source", "n_bigrams", "avg_logprob", "off_domain")
      .orderBy(col("doc_id"))
  }

  /** Quality-signal agreement (q157): per-source Pearson correlation
    * between the two quality signals this engine computes — the q22
    * heuristic (length/punct/stopword ratios) and the q134 held-out LM
    * score. The calibration every filter stack needs before combining
    * signals: strong agreement means the cheap heuristic can gate ahead
    * of the LM pass (CCNet's architecture); near-zero agreement means
    * the signals measure different things and BOTH belong in the funnel.
    * Per-source, because a signal pair can agree on one corpus register
    * and disagree on another — the aggregate number hides exactly the
    * sources where the cheap gate would misfire.
    *
    * Determinism: both scores quantize to micro-ints, moments are exact
    * BIGINT sums (the q90/q152 recipe — micro not nano, so squared sums
    * stay far under 2^63), and the one float step is the final formula.
    * Docs too short for a bigram LM score (< 2 tokens) are excluded from
    * both sides by the inner join.
    */
  def q157QualityAgreement(spark: SparkSession, dir: String): DataFrame = {
    val lm = q134CrossLm(spark, dir).select(col("doc_id"), col("avg_logprob"))
    val heur = qualityScored(docs(spark, dir)).select(col("doc_id"), col("score"))
    Queries.t(spark, dir, "documents").select("doc_id", "source")
      .join(heur, Seq("doc_id")).join(lm, Seq("doc_id"))
      .withColumn("hn", expr("CAST(floor(score * 1e6 + 0.5) AS BIGINT)"))
      .withColumn("lmn", expr("CAST(floor(avg_logprob * 1e6 + 0.5) AS BIGINT)"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("hn")).as("sh"), sum(col("lmn")).as("sl"),
        sum(col("hn") * col("hn")).as("shh"),
        sum(col("lmn") * col("lmn")).as("sll"),
        sum(col("hn") * col("lmn")).as("shl"))
      .withColumn("varh", expr(
        "CAST(n AS DOUBLE) * CAST(shh AS DOUBLE) - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)"))
      .withColumn("varl", expr(
        "CAST(n AS DOUBLE) * CAST(sll AS DOUBLE) - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)"))
      .withColumn("corr", expr(
        """CASE WHEN n < 2 OR varh <= 0 OR varl <= 0 THEN NULL
          |ELSE (CAST(n AS DOUBLE) * CAST(shl AS DOUBLE)
          |      - CAST(sh AS DOUBLE) * CAST(sl AS DOUBLE))
          |  / (sqrt(varh) * sqrt(varl)) END""".stripMargin))
      .select("source", "n", "corr")
      .orderBy(col("source"))
  }

  /** Corpus-wide frequent tokens (q79) via the mergeable Misra-Gries
    * aggregate [[graft.functions.HeavyHitters]]: top-10 tokens with
    * support counts, computed WITHOUT a full token census. The exact
    * alternative (`groupBy(token).count()`) shuffles one row per distinct
    * token — a skew hazard when the "vocabulary" is web-scale (URLs,
    * typos, numbers). `heavy_hitters(tok, 64)` reduces every partition to
    * <= 64 counters before the exchange and merges re-cap at 64; with the
    * test corpus's 31-token vocabulary the buffer never overflows, so the
    * counts are exact and the DuckDB census oracle matches bit-for-bit.
    * The approx regime's error bound (<= n/(m+1) undercount) is
    * spec-tested separately.
    */
  def q79HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Queries.t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(expr("heavy_hitters(tok, 64)").as("hh"))
      .select(posexplode(col("hh")).as(Seq("pos", "e")))
      .filter(col("pos") < 10)
      .select((col("pos") + 1).cast("long").as("rank"),
        col("e.item").as("token"), col("e.cnt").as("cnt"))
      .orderBy(col("rank"))
  }

  /** Per-source frequent tokens (q81) — the grouped form of q79: one
    * bounded Misra-Gries summary PER SOURCE under a single hash aggregate.
    * This is the shape that matters operationally: a corpus audit wants
    * per-provenance token profiles, and the grouped aggregate keeps state
    * at (groups in partition) x m counters with map-side combine — no
    * (source, token) census shuffle, no per-source ranking window.
    */
  def q81SourceTokens(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Queries.t(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"))
      .agg(expr("heavy_hitters(tok, 64)").as("hh"))
      .select(col("source"), posexplode(col("hh")).as(Seq("pos", "e")))
      .filter(col("pos") < 5)
      .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
        col("e.item").as("token"), col("e.cnt").as("cnt"))
      .orderBy(col("source"), col("rank"))
  }

  /** Deterministic PII/URL annotation of the synthetic corpus (the q70
    * precedent: the testdata carries no emails/phones/URLs, so the INPUT
    * side is synthesized identically in both engines — this one SQL snippet
    * parses in Spark SQL and DuckDB — while the operator under test, the
    * regex detect/redact/extract kernels, is fully real). Per doc:
    * doc_id%4 identical emails, a phone when doc_id is odd, one shard-
    * varied URL always, a mirror URL every 5th doc.
    */
  private val annotateSql: String =
    """concat(text,
      |  repeat(concat(' contact user', doc_id, '@example.org'),
      |         cast(doc_id % 4 as int)),
      |  case when doc_id % 2 = 1
      |    then concat(' call +1-555-', lpad(cast(doc_id % 10000 as string), 4, '0'))
      |    else '' end,
      |  ' https://',
      |  case cast(doc_id % 3 as int) when 0 then 'www' when 1 then 'cdn' else 'img' end,
      |  '.', source, '.example.com/d/', doc_id,
      |  case when doc_id % 5 = 0
      |    then concat(' http://mirror.example.net/x/', doc_id)
      |    else '' end)""".stripMargin

  private val emailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phoneRe = "\\+1-555-[0-9]{4}"
  private val urlRe   = "https?://[a-z0-9./-]+"

  /** PII detection + redaction (emails, phone numbers) — the scrub pass a
    * training pipeline runs before anything else. Counts via regexp_count,
    * redaction via global regexp_replace; `redacted_md5` pins the full
    * redacted text bit-for-bit across engines. Scale shape: a narrow
    * per-row codegen map (RegExpReplace/RegExpCount are codegen'd Catalyst
    * expressions), zero shuffle, zero UDFs — at 100 TB this runs entirely
    * inside the scan stage.
    */
  def q72PiiScrub(spark: SparkSession, dir: String): DataFrame =
    Queries.t(spark, dir, "documents")
      .withColumn("full_text", expr(annotateSql))
      .select(
        col("doc_id"),
        regexp_count(col("full_text"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("full_text"), lit(phoneRe)).cast("long").as("n_phones"),
        length(col("full_text")).cast("long").as("len_raw"),
        regexp_replace(regexp_replace(col("full_text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("redacted"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("len_raw"),
        length(col("redacted")).cast("long").as("len_redacted"),
        md5(col("redacted")).as("redacted_md5"))
      .orderBy(col("doc_id"))

  /** URL extraction + domain normalization + per-domain rollup — the
    * provenance census of a web-scale corpus (which hosts feed the corpus,
    * how many docs each touches, what share is https). Extract-all →
    * explode (≲2 rows/doc here — bounded fanout), host parse, `www.`
    * strip, hash-agg by domain. The explode is the only row multiplier and
    * the final agg the only shuffle; domain cardinality is tiny relative
    * to input so map-side combine collapses it.
    */
  def q73UrlDomains(spark: SparkSession, dir: String): DataFrame =
    Queries.t(spark, dir, "documents")
      .withColumn("full_text", expr(annotateSql))
      .select(col("doc_id"),
        explode(expr(s"regexp_extract_all(full_text, '$urlRe', 0)")).as("url"))
      .withColumn("host", regexp_extract(col("url"), "^https?://([^/]+)", 1))
      .withColumn("domain",
        when(col("host").startsWith("www."), expr("substring(host, 5)"))
          .otherwise(col("host")))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(when(col("url").startsWith("https:"), 1L).otherwise(0L)).as("n_https"))
      .orderBy(col("domain"))

  /** Text normalization export (q149): the canonicalization pass that
    * runs before any hashing/dedup stage — markup-bearing raw text (the
    * q72 annotated fixture: emails, phones, URLs riding real documents)
    * is folded to the token alphabet: every non-[a-z0-9 ] character
    * becomes a space, runs of spaces collapse, edges trim. Emitted as a
    * per-doc digest (before/after lengths + md5 of the normalized text);
    * the digest column is what makes normalization auditable — two
    * pipelines agree on normalization iff the md5 columns agree.
    *
    * Scale shape: three codegen regexp passes + a hash, entirely inside
    * the scan stage — zero shuffle, the cheapest possible operator class
    * (q72's contract). Order matters and is part of the definition:
    * punctuation->space BEFORE collapse, trim last.
    */
  def q149Normalize(spark: SparkSession, dir: String): DataFrame =
    Queries.t(spark, dir, "documents")
      .withColumn("full_text", expr(annotateSql))
      .withColumn("norm", trim(regexp_replace(
        regexp_replace(col("full_text"), "[^a-z0-9 ]", " "), " +", " ")))
      .select(col("doc_id"),
        length(col("full_text")).cast("long").as("len_raw"),
        length(col("norm")).cast("long").as("len_norm"),
        md5(col("norm")).as("norm_md5"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------------
  // q137: corpus-frequency boilerplate removal (CCNet/RefinedWeb-style)
  // ------------------------------------------------------------------

  /** A bigram is boilerplate when it appears in at least this percentage
    * of all documents. Relative, not absolute: the threshold tracks corpus
    * size across SFs, the way CCNet's duplicated-paragraph filter and
    * RefinedWeb's line-dedup are tuned as document-share fractions.
    * Degenerate-corpus caveat: below ceil(100/pct) documents the
    * threshold floors at df >= 1 and EVERY bigram is "boilerplate" (a
    * 1-doc corpus would clean itself empty) — a df-share census is
    * meaningless on a handful of docs, which is exactly why the
    * streaming twin refuses to train below [[graft.streaming.CleanStream
    * .MinSeedDocs]]; batch callers own the same precondition.
    */
  private val BoilerplatePct = 8

  /** Corpus-frequency boilerplate removal report (q137): the cleaning
    * stage between exact dedup (whole-doc copies, q30) and passage dedup
    * (long repeated spans, q76) — SHORT token runs repeated across a
    * large share of documents (headers, footers, navigation chrome,
    * license blurbs) that survive both. A bigram occurring in >=
    * [[BoilerplatePct]]% of all docs is marked boilerplate; every token
    * position covered by a marked bigram is removal-eligible; the report
    * is the per-source retained-token ratio — the number that shows which
    * source's volume is chrome before it inflates a mixing budget.
    *
    * Scale shape (100 TB): the doc-frequency census is one map-side-
    * combined hash agg over per-doc DISTINCT bigrams (the q30/q49 shingle
    * recipe — `array_distinct` per row, no distinct-aggregate shuffle).
    * The frequent set is corpus-size-INDEPENDENT by construction: grams
    * with df >= p·N number at most (total grams)/(p·N) ≈ avg_len/p, so
    * it always broadcasts. Coverage marking is then a broadcast semi-join
    * on the positional gram stream (codegen `word_ngrams`), a bounded
    * 2x position explode, and a per-doc distinct count — doc-keyed
    * groups, no hot keys, no window.
    */
  /** The q137 frequent-bigram census over a (doc_id, toks) frame: bigrams
    * whose document frequency reaches [[BoilerplatePct]]% of `total`
    * docs. Shared with the streaming twin ([[graft.streaming
    * .CleanStream]]), which freezes this set from its seed batch. Caller
    * must have registered `word_ngrams` on the frame's own session.
    */
  private[graft] def boilerplateGramsOf(d: DataFrame): DataFrame = {
    val tot = d.agg(count(lit(1)).as("n"))
    d.select(col("doc_id"),
        explode(array_distinct(expr("word_ngrams(toks, 2)"))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(tot))
      .filter(col("df") * 100 >= col("n") * BoilerplatePct)
      .select("g")
  }

  /** Per-document covered-position counts against a frequent-gram set:
    * (doc_id, covered) for docs with at least one covered token. The
    * coverage kernel shared by q137 and the streaming twin — a broadcast
    * semi-join on the positional gram stream plus a bounded 2x position
    * explode, never a corpus-sized sort.
    */
  private[graft] def coveredPerDoc(d: DataFrame, fq: DataFrame): DataFrame =
    d.select(col("doc_id"),
        posexplode(expr("word_ngrams(toks, 2)")).as(Seq("p", "g")))
      .join(broadcast(fq), Seq("g"), "left_semi")
      .select(col("doc_id"), explode(array(col("p"), col("p") + 1)).as("p2"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("p2")).as("covered"))

  def q137Boilerplate(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val d = docs(spark, dir).localCheckpoint(true)
    val cov = coveredPerDoc(d, boilerplateGramsOf(d))
    d.select(col("doc_id"), col("source"),
        size(col("toks")).cast("long").as("nt"))
      .join(cov, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(col("nt")).as("total_tokens"),
        sum(coalesce(col("covered"), lit(0L))).as("covered_tokens"))
      .withColumn("retained_ratio",
        lit(1.0) - col("covered_tokens").cast("double") / col("total_tokens"))
      .select("source", "docs", "total_tokens", "covered_tokens",
        "retained_ratio")
      .orderBy(col("source"))
  }

  /** Boilerplate REMOVAL as an export (q147): where q137 reports the
    * per-source cost, this produces the cleaned corpus itself — each
    * document's tokens with every covered position dropped, emitted as a
    * verification digest (md5 of the cleaned text + before/after counts;
    * the full-text export is the same frame without the hash). The
    * removal is positional, not token-identity-based: a word that
    * appears both inside a boilerplate bigram and in novel context keeps
    * its novel occurrences — the property that distinguishes
    * position-marked cleaning from naive stopword deletion.
    *
    * Scale shape: q137's census + coverage kernels (broadcast frequent
    * set), with the covered positions aggregated to a per-doc LIST
    * (bounded by document length, the one per-group state) and the
    * cleaned text rebuilt by a codegen filter over the token array — no
    * extra shuffle beyond the doc-keyed coverage agg q137 already pays.
    */
  def q147BoilerplateClean(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val d = docs(spark, dir).localCheckpoint(true)
    val fq = boilerplateGramsOf(d)
    val covered = d.select(col("doc_id"),
        posexplode(expr("word_ngrams(toks, 2)")).as(Seq("p", "g")))
      .join(broadcast(fq), Seq("g"), "left_semi")
      .select(col("doc_id"), explode(array(col("p"), col("p") + 1)).as("p2"))
      .groupBy(col("doc_id"))
      .agg(array_sort(array_distinct(collect_list(col("p2")))).as("cov"))
    d.select(col("doc_id"), col("toks"))
      .join(covered, Seq("doc_id"), "left")
      .withColumn("cov", coalesce(col("cov"), array().cast("array<int>")))
      .withColumn("kept", expr(
        "filter(toks, (t, i) -> NOT array_contains(cov, i))"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_before"),
        size(col("kept")).cast("long").as("n_after"),
        md5(array_join(col("kept"), " ")).as("cleaned_md5"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------------
  // q105: hashed-feature linear classifier inference (fastText-style)
  // ------------------------------------------------------------------

  /** Feature-space size for the q105 hashed bag-of-words classifier. */
  private val ClassifierBuckets = 1024

  /** Pretrained-classifier inference over the corpus — the fastText-shaped
    * quality filter (Joulin et al. 2016; the CCNet/LLaMA-style "does this
    * page look like a reference corpus" gate): each document's tokens are
    * hashed into [[ClassifierBuckets]] bag-of-words buckets, dotted with a
    * FIXED externally-supplied weight vector, and length-normalized into a
    * logit; `kept` is the logit>0 decision. The weights here are derived
    * deterministically from md5 of the bucket index — a stand-in for a
    * model file, exercising the exact inference plumbing (hash, broadcast
    * dot, normalize, threshold) a real weight table would ride.
    *
    * Contrast with q95 DSIR: there the weights are LEARNED from the corpus
    * (two extra corpus passes to estimate target/raw distributions); here
    * they arrive trained, so inference is a single scan — the common case
    * for a production quality gate.
    *
    * Scale shape (100 TB): the weight table is exactly
    * [[ClassifierBuckets]] rows, broadcast; scoring is the token stream
    * joined map-side against it (zero shuffle) plus one map-side-combined
    * per-doc hash-agg — the only exchange in the plan. Determinism: nano-
    * int weights summed as BIGINT (order-free), one double division at the
    * end, and the keep decision is the INTEGER predicate `nano > 0`, never
    * a rounded-double compare.
    */
  def q105QualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val d = ClassifierBuckets
    val weights = spark.range(0, d.toLong).select(col("id").as("b"),
      (expr("md5_prefix64(concat('w:', CAST(id AS STRING)))")
        % 2000000001L - 1000000000L).as("wnano"))
    val tb = Queries.t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("t"))
      .withColumn("b", expr("md5_prefix64(t)") % d)
    tb.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_toks"), sum(col("wnano")).as("nano"))
      .select(col("doc_id"), col("source"), col("n_toks"),
        round(col("nano").cast("double") / col("n_toks") / 1e9, 6).as("logit"),
        when(col("nano") > 0, 1L).otherwise(0L).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** Candidates reported by q121. */
  private val BpeTopK = 20

  /** BPE merge candidates (q121): the most frequent adjacent token pairs
    * — tokenizer training's first step is literally "find the most
    * frequent pair and merge it" (Sennrich et al. 2016), and a corpus
    * team reads this table before training to see what the vocabulary
    * will absorb first. PMI is reported alongside: frequency finds
    * candidates, pointwise mutual information separates true collocations
    * from pairs that co-occur by chance because both words are common.
    *
    * Scale shape: pair counting is one map-side-combined hash agg over
    * the bigram stream (occurrence counts, NOT the dedup family's
    * distinct sets); the top-[[BpeTopK]] rides the mergeable `top_k_by`
    * (never a vocabulary-wide sort), and the unigram census joins against
    * the BROADCAST 20-row candidate set — the corpus-vocab-sized side is
    * filtered by the tiny side, never shuffled wide. Totals are one-row
    * broadcasts. Determinism: counts are exact ints; PMI's one ln() runs
    * on a ratio derived from identical ints and rounds to nano before the
    * 6-decimal output (q95's precedent).
    */
  def q121BpeMerges(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val d = docs(spark, dir)
    val uni = d.select(explode(col("toks")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cu"))
      .localCheckpoint(true)
    val bi = d.filter(size(col("toks")) >= 2)
      .select(explode(expr("word_ngrams(toks, 2)")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("cb"))
      .localCheckpoint(true)
    val nTok = uni.agg(sum(col("cu")).as("n"))
    val nBi = bi.agg(sum(col("cb")).as("nb"))
    val top = bi
      .agg(expr(s"top_k_by(g, cb, $BpeTopK)").as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "hit")))
      .select((col("pos") + 1).cast("long").as("rnk"),
        col("hit.v").as("pair"), col("hit.c").as("cnt"))
      .withColumn("w1", substring_index(col("pair"), " ", 1))
      .withColumn("w2", substring_index(col("pair"), " ", -1))
    uni.join(broadcast(top.select(col("w1"), col("rnk"))), col("t") === col("w1"))
      .select(col("rnk"), col("cu").as("c1"))
      .join(broadcast(top), Seq("rnk"))
      .join(uni.withColumnRenamed("cu", "c2"), col("t") === col("w2"))
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
      .withColumn("nano", expr(
        """CAST(round(ln((CAST(cnt AS DOUBLE) / nb)
          |  / ((c1 / CAST(n AS DOUBLE)) * (c2 / CAST(n AS DOUBLE))))
          |  * 1000000000) AS BIGINT)""".stripMargin))
      .select(col("rnk"), col("pair"), col("cnt"), col("c1"), col("c2"),
        round(col("nano").cast("double") / 1e9, 6).as("pmi"))
      .orderBy(col("rnk"))
  }

  /** Merge rounds applied by q123. */
  private[operators] val BpeRounds = 4

  /** One greedy left-to-right BPE merge pass over a (doc_id, toks) frame:
    * every non-overlapping occurrence of the adjacent pair (t1, t2) —
    * scalar columns from the broadcast 1-row winner — collapses into the
    * single token `t1 + " " + t2`. A fold, not a window: the per-row
    * `aggregate` lambda carries (emitted-prefix, pending-token) state, so
    * a run of overlapping matches ("a a a" under pair (a,a)) merges at
    * positions 1 and 3 exactly like sequential BPE. No shuffle — the pass
    * is a per-document map.
    */
  private def bpeMergePass(d: DataFrame, top1: DataFrame): DataFrame =
    d.crossJoin(broadcast(top1))
      // cheap containment guard: a doc lacking either token of the pair
      // cannot change, so the fold (with its per-step array building) runs
      // only over docs that might merge — the production delta-update
      // insight (only documents containing the pair have work) applied at
      // row granularity; the result is identical by construction
      .withColumn("toks", when(
        !(expr("array_contains(toks, t1)") && expr("array_contains(toks, t2)")),
        col("toks")).otherwise(expr(
        """aggregate(toks,
          |  named_struct('acc', CAST(array() AS ARRAY<STRING>),
          |               'prev', CAST(NULL AS STRING)),
          |  (s, x) -> CASE
          |    WHEN s.prev IS NULL THEN named_struct('acc', s.acc, 'prev', x)
          |    WHEN s.prev = t1 AND x = t2
          |      THEN named_struct('acc', array_append(s.acc, concat(t1, ' ', t2)),
          |                        'prev', CAST(NULL AS STRING))
          |    ELSE named_struct('acc', array_append(s.acc, s.prev), 'prev', x)
          |  END,
          |  s -> CASE WHEN s.prev IS NULL THEN s.acc
          |       ELSE array_append(s.acc, s.prev) END)""".stripMargin)))
      .select("doc_id", "toks")

  /** Iterative BPE merge training (q123): where q121 RANKS first-round
    * merge candidates, this RUNS the tokenizer-training loop (Sennrich et
    * al. 2016) — [[BpeRounds]] rounds of (count adjacent pairs, pick the
    * most frequent, apply the merge corpus-wide, re-count). Later rounds
    * see pairs q121 cannot: a merged token pairing with its neighbor. The
    * output is the merge TABLE (round, t1, t2, count) — the artifact a
    * tokenizer ships; q124 re-costs token budgets under it.
    *
    * Scale shape per round: pair counting is one map-side-combined hash
    * agg over the bigram stream; the winner rides the mergeable
    * `top_k_by` at k=1 (pair-key ties break on the chr(1)-joined key —
    * binary UTF8 in both engines — never a vocabulary-wide sort); the
    * merge pass is a broadcast of ONE row plus a per-document fold, no
    * shuffle. k rounds = k linear corpus passes, the honest distributed
    * baseline (production incrementalizes the pair-count delta — only
    * documents containing the merged pair change counts — but the
    * per-round plan shape is identical). The greedy loop is driver-side
    * control flow over distributed ops, the `ivfCentroids`/q116
    * precedent; nothing collects.
    */
  def q123BpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeTrained(spark, dir, BpeRounds)._1.orderBy(col("rnd"))

  /** Train-once / apply-many BPE artifacts: the merge table and merged
    * corpus persist to a per-(corpus, rounds) parquet scratch on first
    * demand; q123, q124, and q127 then read the SAME trained artifact
    * instead of each re-running the k-round loop (the bench previously
    * paid the identical training three times — the round-6 KMV
    * sketch-persistence precedent applied to the tokenizer: production
    * trains once and ships the merge table to every consumer). Training
    * is deterministic, so a cache hit is byte-identical to a retrain;
    * the JVM-wide lock + completion marker keep concurrent first-demands
    * (parallel suites in one JVM) single-writer, and the scratch key is
    * corpus-dir-hashed so scale factors never collide.
    */
  private val bpeTrainLock = new Object
  private[graft] def bpeTrained(
      spark: SparkSession, dir: String, rounds: Int): (DataFrame, DataFrame) =
    bpeTrainLock.synchronized {
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$dir#$rounds".getBytes("UTF-8")).take(6)
        .map("%02x".format(_)).mkString
      val root = s"${sys.props("java.io.tmpdir")}/graft_bpe_$key"
      ArtifactCache.ensure(root, "_TRAINED") { staging =>
        val (merges, corpus) = bpeTrainLoop(spark, dir, rounds)
        merges.write.mode("overwrite").parquet(s"$staging/merges")
        corpus.write.mode("overwrite").parquet(s"$staging/merged")
      }
      (spark.read.parquet(s"$root/merges"),
        spark.read.parquet(s"$root/merged"))
    }

  /** The shared BPE training loop: returns (merge table, merged corpus
    * after `rounds` passes). q123 publishes the table; q124 re-costs
    * token budgets over the merged corpus.
    */
  private[graft] def bpeTrainLoop(
      spark: SparkSession, dir: String, rounds: Int): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(spark)
    var d = docs(spark, dir).select(col("doc_id"), col("toks"))
      .localCheckpoint(true)
    var out: DataFrame = null
    for (r <- 1 to rounds) {
      // pair census in whole-stage codegen: word_ngrams with the chr(1)
      // separator (merged tokens contain spaces, so a space-joined key
      // would be ambiguous) — replaces an interpreted per-element
      // struct-transform lambda on the hottest stream of the loop
      val counted = d.filter(size(col("toks")) >= 2)
        .select(explode(expr("word_ngrams(toks, 2, '\u0001')")).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      val top1 = counted
        .agg(expr("top_k_by(g, cnt, 1)").as("top"))
        .select(col("top")(0).getField("v").as("pk"),
          col("top")(0).getField("c").as("cnt"))
        .select(expr("split_part(pk, chr(1), 1)").as("t1"),
          expr("split_part(pk, chr(1), 2)").as("t2"), col("cnt"))
        .localCheckpoint(true)
      val row = top1.select(lit(r).cast("long").as("rnd"),
        col("t1"), col("t2"), col("cnt"))
      out = if (out == null) row else out.unionByName(row)
      d = bpeMergePass(d, top1).localCheckpoint(true)
    }
    (out, d)
  }

  /** DuckDB CTE chain for one oracle BPE round: pair census -> winner ->
    * greedy-merge selection via run parity (positions i of matches,
    * grouped into consecutive runs, every ODD member selected — exactly
    * the left-to-right fold: a merge consumes position i+1, and in a run
    * of overlapping matches, which requires t1 = t2, the next eligible
    * start is i+2) -> rebuilt token lists.
    */
  private def bpeRoundCte(r: Int): String = {
    val prev = s"d${r - 1}"
    // list comprehensions, not lateral generate_series: DuckDB's table-
    // function form rejects column arguments (len(toks)); the scalar/
    // comprehension form accepts them (q121's pattern). chr(1) joins the
    // pair key — tokens never contain it (merged tokens join with ' ').
    // AS MATERIALIZED throughout: each d_r is referenced three times
    // (c_{r+1}, m_{r+1}, d_{r+1}) and DuckDB's inlining would otherwise
    // expand the 4-round chain into 3^4 copies of the d0 pipeline — the
    // plan explosion behind the round-12 sweep's two sf0.1 OOM skips
    // (a ~270k-token corpus "out of memory" at a 48 GB budget; 1.2 s
    // materialized).
    s"""c$r AS MATERIALIZED (
       |  SELECT string_split(g, chr(1))[1] AS t1,
       |         string_split(g, chr(1))[2] AS t2, count(*) AS cnt
       |  FROM (SELECT unnest([toks[i] || chr(1) || toks[i + 1]
       |                       for i in generate_series(1, len(toks) - 1)]) AS g
       |        FROM $prev WHERE len(toks) >= 2)
       |  GROUP BY 1, 2),
       |top$r AS MATERIALIZED (SELECT t1, t2, cnt FROM c$r
       |          ORDER BY cnt DESC, t1 || chr(1) || t2 LIMIT 1),
       |m$r AS MATERIALIZED (
       |  SELECT doc_id, unnest([i for i in generate_series(1, len(toks) - 1)
       |                         if toks[i] = t.t1 AND toks[i + 1] = t.t2]) AS i
       |  FROM $prev, top$r t),
       |r$r AS MATERIALIZED (SELECT doc_id, i,
       |          i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
       |        FROM m$r),
       |s$r AS MATERIALIZED (SELECT doc_id, i FROM (
       |          SELECT doc_id, i, row_number() OVER
       |            (PARTITION BY doc_id, grp ORDER BY i) AS rn FROM r$r)
       |        WHERE rn % 2 = 1),
       |d$r AS MATERIALIZED (
       |  SELECT pp.doc_id,
       |    list(CASE WHEN sel.i IS NOT NULL THEN t.t1 || ' ' || t.t2
       |         ELSE pp.t END ORDER BY pp.i) AS toks
       |  FROM (SELECT doc_id, unnest(generate_series(1, len(toks))) AS i,
       |               unnest(toks) AS t
       |        FROM $prev) pp
       |  CROSS JOIN top$r t
       |  LEFT JOIN s$r sel ON pp.doc_id = sel.doc_id AND pp.i = sel.i
       |  LEFT JOIN s$r sc ON pp.doc_id = sc.doc_id AND pp.i = sc.i + 1
       |  WHERE sc.i IS NULL
       |  GROUP BY pp.doc_id)""".stripMargin
  }

  /** The full oracle BPE chain `d0 .. d<rounds>` plus `top1..top<rounds>`. */
  private[operators] def bpeChainCtes(rounds: Int): String =
    ("d0 AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)"
      +: (1 to rounds).map(bpeRoundCte)).mkString(",\n")

  /** Tokenizer application report (q127): apply the q123-trained merge
    * table to the corpus and report per-source token compression — the
    * acceptance measurement after tokenizer training (how many tokens a
    * source actually costs under the new vocab vs whitespace counting;
    * the per-source ratio is the number that re-prices mixing budgets,
    * q124's input). Counts are exact integers; the one double is a
    * 6-decimal round of an integer ratio.
    *
    * Scale shape: the merge passes are q123's (linear, shuffle-free); the
    * report is one doc_id-keyed join plus one map-side-combined hash agg
    * to |sources| rows.
    */
  def q127TokenizerApply(spark: SparkSession, dir: String): DataFrame = {
    val merged = bpeTrained(spark, dir, BpeRounds)._2
      .select(col("doc_id"), size(col("toks")).cast("long").as("nm"))
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        size(col("toks")).cast("long").as("nr"))
      .join(merged, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nr")).as("tok_raw"), sum(col("nm")).as("tok_merged"))
      .withColumn("ratio",
        round(col("tok_merged").cast("double") / col("tok_raw"), 6))
      .select("source", "n_docs", "tok_raw", "tok_merged", "ratio")
      .orderBy(col("source"))
  }

  val oracles: Map[String, String] = Map(
    // the final round's merged LENGTH is pure arithmetic over the
    // position CTEs: len(d4) = len(d3) - |s4| (each selected merge
    // shortens the list by one), so the oracle never materializes d4's
    // full token lists — the one list-rebuild DuckDB could not fit at
    // sf0.1 (the round-12 sweep's only skips). Exact, not approximate.
    "q127_tokenizer_apply" ->
      s"""WITH ${bpeChainCtes(BpeRounds)},
        |mc AS (SELECT doc_id, count(*) AS cnt
        |       FROM s$BpeRounds GROUP BY doc_id),
        |mlen AS (SELECT d.doc_id,
        |           CAST(len(d.toks) - coalesce(mc.cnt, 0) AS BIGINT) AS nm
        |         FROM d${BpeRounds - 1} d LEFT JOIN mc USING (doc_id)),
        |raw AS (SELECT doc_id, source,
        |          CAST(len(string_split(text, ' ')) AS BIGINT) AS nr
        |        FROM documents)
        |SELECT r.source, count(*) AS n_docs,
        |  CAST(sum(r.nr) AS BIGINT) AS tok_raw,
        |  CAST(sum(m.nm) AS BIGINT) AS tok_merged,
        |  round(CAST(sum(m.nm) AS DOUBLE) / sum(r.nr), 6) AS ratio
        |FROM raw r JOIN mlen m ON r.doc_id = m.doc_id
        |GROUP BY r.source ORDER BY r.source""".stripMargin,

    "q137_boilerplate" ->
      s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
        |             FROM documents),
        |tot AS (SELECT count(*) AS n FROM documents),
        |gl AS (SELECT doc_id, unnest([{'i': i, 'g': t[i] || ' ' || t[i+1]}
        |                              for i in generate_series(1, len(t) - 1)]) AS u
        |       FROM toks),
        |g AS (SELECT doc_id, u.i AS i, u.g AS g FROM gl),
        |fq AS (SELECT g
        |       FROM (SELECT g, count(DISTINCT doc_id) AS df FROM g GROUP BY g), tot
        |       WHERE df * 100 >= tot.n * $BoilerplatePct),
        |cov AS (SELECT doc_id, count(DISTINCT p) AS covered
        |        FROM (SELECT g.doc_id, unnest([g.i, g.i + 1]) AS p
        |              FROM g JOIN fq USING (g))
        |        GROUP BY doc_id)
        |SELECT toks.source, count(*) AS docs,
        |  CAST(sum(len(toks.t)) AS BIGINT) AS total_tokens,
        |  CAST(sum(coalesce(cov.covered, 0)) AS BIGINT) AS covered_tokens,
        |  1.0 - CAST(sum(coalesce(cov.covered, 0)) AS DOUBLE) / sum(len(toks.t))
        |    AS retained_ratio
        |FROM toks LEFT JOIN cov USING (doc_id)
        |GROUP BY toks.source ORDER BY toks.source""".stripMargin,

    "q149_normalize" ->
      s"""WITH a AS (SELECT doc_id, $annotateSql AS full_text FROM documents),
        |n AS (SELECT doc_id, full_text,
        |        trim(regexp_replace(
        |          regexp_replace(full_text, '[^a-z0-9 ]', ' ', 'g'),
        |          ' +', ' ', 'g')) AS norm
        |      FROM a)
        |SELECT doc_id,
        |  CAST(length(full_text) AS BIGINT) AS len_raw,
        |  CAST(length(norm) AS BIGINT) AS len_norm,
        |  md5(norm) AS norm_md5
        |FROM n ORDER BY doc_id""".stripMargin,

    "q147_boilerplate_clean" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tot AS (SELECT count(*) AS n FROM documents),
        |gl AS (SELECT doc_id, unnest([{'i': i, 'g': t[i] || ' ' || t[i+1]}
        |                              for i in generate_series(1, len(t) - 1)]) AS u
        |       FROM toks),
        |g AS (SELECT doc_id, u.i AS i, u.g AS g FROM gl),
        |fq AS (SELECT g
        |       FROM (SELECT g, count(DISTINCT doc_id) AS df FROM g GROUP BY g), tot
        |       WHERE df * 100 >= tot.n * $BoilerplatePct),
        |cov AS (SELECT doc_id, list(DISTINCT p) AS cov
        |        FROM (SELECT g.doc_id, unnest([g.i, g.i + 1]) AS p
        |              FROM g JOIN fq USING (g))
        |        GROUP BY doc_id),
        |clean AS (SELECT toks.doc_id,
        |    len(toks.t) AS n_before,
        |    [toks.t[j] for j in generate_series(1, len(toks.t))
        |     if NOT list_contains(coalesce(cov.cov, []), j)] AS kept
        |  FROM toks LEFT JOIN cov USING (doc_id))
        |SELECT doc_id, CAST(n_before AS BIGINT) AS n_before,
        |  CAST(len(kept) AS BIGINT) AS n_after,
        |  md5(array_to_string(kept, ' ')) AS cleaned_md5
        |FROM clean ORDER BY doc_id""".stripMargin,

    "q123_bpe_train" ->
      s"""WITH ${bpeChainCtes(BpeRounds)}
        |${(1 to BpeRounds).map(r =>
            s"SELECT CAST($r AS BIGINT) AS rnd, t1, t2, cnt FROM top$r")
            .mkString("\nUNION ALL\n")}
        |ORDER BY rnd""".stripMargin,

    "q121_bpe_merges" ->
      s"""WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |uni AS (SELECT u.t, count(*) AS cu
        |        FROM (SELECT unnest(toks) AS t FROM t) u GROUP BY u.t),
        |bi AS (SELECT g, count(*) AS cb
        |       FROM (SELECT unnest([toks[i] || ' ' || toks[i+1]
        |               for i in generate_series(1, len(toks) - 1)]) AS g
        |             FROM t WHERE len(toks) >= 2) GROUP BY g),
        |nt AS (SELECT CAST(sum(cu) AS BIGINT) AS n FROM uni),
        |nbt AS (SELECT CAST(sum(cb) AS BIGINT) AS nb FROM bi),
        |top AS (SELECT g AS pair, cb AS cnt,
        |    CAST(row_number() OVER (ORDER BY cb DESC, g) AS BIGINT) AS rnk
        |  FROM bi ORDER BY cb DESC, g LIMIT $BpeTopK),
        |sp AS (SELECT rnk, pair, cnt,
        |    string_split(pair, ' ')[1] AS w1, string_split(pair, ' ')[2] AS w2
        |  FROM top)
        |SELECT sp.rnk, sp.pair, sp.cnt, u1.cu AS c1, u2.cu AS c2,
        |  round(CAST(CAST(round(ln((CAST(sp.cnt AS DOUBLE) / nbt.nb)
        |    / ((u1.cu / CAST(nt.n AS DOUBLE)) * (u2.cu / CAST(nt.n AS DOUBLE))))
        |    * 1000000000) AS BIGINT) AS DOUBLE) / 1e9, 6) AS pmi
        |FROM sp JOIN uni u1 ON u1.t = sp.w1 JOIN uni u2 ON u2.t = sp.w2,
        |  nt, nbt
        |ORDER BY sp.rnk""".stripMargin,

    "q105_quality_classifier" ->
      s"""WITH w AS (SELECT b,
        |    ('0x' || substr(md5('w:' || CAST(b AS VARCHAR)), 1, 15))::BIGINT
        |      % 2000000001 - 1000000000 AS wnano
        |  FROM (SELECT unnest(range($ClassifierBuckets)) AS b)),
        |tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
        |        FROM documents),
        |tb AS (SELECT doc_id, source,
        |    ('0x' || substr(md5(t), 1, 15))::BIGINT % $ClassifierBuckets AS b
        |  FROM tok),
        |sc AS (SELECT doc_id, source, count(*) AS n_toks,
        |    CAST(sum(wnano) AS BIGINT) AS nano
        |  FROM tb JOIN w USING (b) GROUP BY doc_id, source)
        |SELECT doc_id, source, n_toks,
        |  round(CAST(nano AS DOUBLE) / n_toks / 1e9, 6) AS logit,
        |  CAST(CASE WHEN nano > 0 THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM sc ORDER BY doc_id""".stripMargin,

    "q72_pii_scrub" ->
      s"""WITH a AS (SELECT doc_id, $annotateSql AS full_text FROM documents),
        |r AS (SELECT doc_id, full_text,
        |  regexp_replace(regexp_replace(full_text, '$emailRe', '<EMAIL>', 'g'),
        |                 '$phoneRe', '<PHONE>', 'g') AS redacted FROM a)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(full_text, '$emailRe')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(full_text, '$phoneRe')) AS BIGINT) AS n_phones,
        |  CAST(length(full_text) AS BIGINT) AS len_raw,
        |  CAST(length(redacted) AS BIGINT) AS len_redacted,
        |  md5(redacted) AS redacted_md5
        |FROM r ORDER BY doc_id""".stripMargin,

    "q73_url_domains" ->
      s"""WITH a AS (SELECT doc_id, $annotateSql AS full_text FROM documents),
        |u AS (SELECT doc_id, unnest(regexp_extract_all(full_text, '$urlRe')) AS url FROM a),
        |h AS (SELECT doc_id, url, regexp_extract(url, '^https?://([^/]+)', 1) AS host FROM u),
        |d AS (SELECT doc_id, url,
        |  CASE WHEN host LIKE 'www.%' THEN substring(host, 5) ELSE host END AS domain FROM h)
        |SELECT domain, count(*) AS n_urls, count(DISTINCT doc_id) AS n_docs,
        |  CAST(sum(CASE WHEN url LIKE 'https:%' THEN 1 ELSE 0 END) AS BIGINT) AS n_https
        |FROM d GROUP BY domain ORDER BY domain""".stripMargin,

    "q71_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, lang, unnest(regexp_split_to_array(text, '')) AS ch
        |  FROM documents WHERE length(text) > 0),
        |hist AS (
        |  SELECT doc_id, lang, ch, count(*) AS c
        |  FROM ch WHERE ch <> '' GROUP BY doc_id, lang, ch)
        |SELECT doc_id, lang,
        |  CAST(sum(c) AS BIGINT) AS n_chars,
        |  count(*) AS n_distinct,
        |  round(log2(CAST(sum(c) AS DOUBLE))
        |    - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) / sum(c), 6) AS entropy
        |FROM hist GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin,

    "q81_source_tokens" ->
      """WITH c AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        |g AS (SELECT source, token, count(*) AS cnt FROM c GROUP BY source, token),
        |r AS (SELECT source, token, cnt,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY cnt DESC, token) AS BIGINT) AS rank
        |FROM g)
        |SELECT source, rank, token, cnt FROM r WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin,

    "q79_heavy_hitters" ->
      """WITH c AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |g AS (SELECT token, count(*) AS cnt FROM c GROUP BY token),
        |r AS (SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank,
        |             token, cnt FROM g)
        |SELECT rank, token, cnt FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "q77_bigram_lm" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |bi AS (SELECT doc_id,
        |  unnest([toks[i] || ' ' || toks[i+1]
        |          for i in generate_series(1, len(toks) - 1)]) AS bg FROM t),
        |b2 AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM bi),
        |cb AS (SELECT bg, count(*) AS cb FROM b2 GROUP BY bg),
        |cw AS (SELECT w1, count(*) AS cw FROM b2 GROUP BY w1),
        |s AS (SELECT doc_id,
        |  CAST(round(ln(CAST(cb.cb AS DOUBLE) / cw.cw) * 1000000000) AS BIGINT) AS lp_nano
        |FROM b2 JOIN cb USING (bg) JOIN cw USING (w1))
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(sum(lp_nano) AS DOUBLE) / count(*) / 1e9, 6) AS avg_logprob
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q134_cross_lm" ->
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        |           FROM documents),
        |bi AS (SELECT doc_id, source,
        |  unnest([toks[i] || ' ' || toks[i+1]
        |          for i in generate_series(1, len(toks) - 1)]) AS bg
        |  FROM t WHERE len(toks) >= 2),
        |b2 AS (SELECT doc_id, source, bg, split_part(bg, ' ', 1) AS w1 FROM bi),
        |ref AS (SELECT bg, w1 FROM b2 WHERE source = '$LmRefSource'),
        |cb AS (SELECT bg, count(*) AS cb FROM ref GROUP BY bg),
        |cw AS (SELECT w1, count(*) AS cw FROM ref GROUP BY w1),
        |v AS (SELECT count(DISTINCT w1) AS v FROM ref),
        |s AS (SELECT b2.doc_id, b2.source,
        |  CAST(round(ln(CAST(COALESCE(cb.cb, 0) + 1 AS DOUBLE)
        |    / CAST(COALESCE(cw.cw, 0) + v.v AS DOUBLE)) * 1000000000)
        |    AS BIGINT) AS lp_nano
        |FROM b2 LEFT JOIN cb USING (bg) LEFT JOIN cw USING (w1), v)
        |SELECT doc_id, source, count(*) AS n_bigrams,
        |  round(CAST(sum(lp_nano) AS DOUBLE) / count(*) / 1e9, 6) AS avg_logprob,
        |  round(CAST(sum(lp_nano) AS DOUBLE) / count(*) / 1e9, 6) < $OffDomainTau
        |    AS off_domain
        |FROM s GROUP BY doc_id, source ORDER BY doc_id""".stripMargin,

    "q157_quality_agreement" ->
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        |           FROM documents),
        |bi AS (SELECT doc_id, source,
        |  unnest([toks[i] || ' ' || toks[i+1]
        |          for i in generate_series(1, len(toks) - 1)]) AS bg
        |  FROM t WHERE len(toks) >= 2),
        |b2 AS (SELECT doc_id, source, bg, split_part(bg, ' ', 1) AS w1 FROM bi),
        |ref AS (SELECT bg, w1 FROM b2 WHERE source = '$LmRefSource'),
        |cb AS (SELECT bg, count(*) AS cb FROM ref GROUP BY bg),
        |cw AS (SELECT w1, count(*) AS cw FROM ref GROUP BY w1),
        |v AS (SELECT count(DISTINCT w1) AS v FROM ref),
        |s AS (SELECT b2.doc_id, b2.source,
        |  CAST(round(ln(CAST(COALESCE(cb.cb, 0) + 1 AS DOUBLE)
        |    / CAST(COALESCE(cw.cw, 0) + v.v AS DOUBLE)) * 1000000000)
        |    AS BIGINT) AS lp_nano
        |FROM b2 LEFT JOIN cb USING (bg) LEFT JOIN cw USING (w1), v),
        |lm AS (SELECT doc_id,
        |  round(CAST(sum(lp_nano) AS DOUBLE) / count(*) / 1e9, 6) AS avg_logprob
        |FROM s GROUP BY doc_id),
        |tq AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |       FROM documents),
        |${qualityMetricsCte("tq")},
        |hq AS (SELECT doc_id, ($qualityScoreSql) AS score FROM m),
        |j AS (SELECT d.source,
        |    CAST(floor(hq.score * 1e6 + 0.5) AS BIGINT) AS hn,
        |    CAST(floor(lm.avg_logprob * 1e6 + 0.5) AS BIGINT) AS lmn
        |  FROM documents d JOIN hq ON d.doc_id = hq.doc_id
        |       JOIN lm ON d.doc_id = lm.doc_id),
        |mo AS (SELECT source, count(*) AS n,
        |    CAST(sum(hn) AS BIGINT) AS sh, CAST(sum(lmn) AS BIGINT) AS sl,
        |    CAST(sum(hn * hn) AS BIGINT) AS shh,
        |    CAST(sum(lmn * lmn) AS BIGINT) AS sll,
        |    CAST(sum(hn * lmn) AS BIGINT) AS shl
        |  FROM j GROUP BY source),
        |cc AS (SELECT source, n,
        |    CAST(n AS DOUBLE) * shh - CAST(sh AS DOUBLE) * sh AS varh,
        |    CAST(n AS DOUBLE) * sll - CAST(sl AS DOUBLE) * sl AS varl,
        |    CAST(n AS DOUBLE) * shl - CAST(sh AS DOUBLE) * sl AS cov
        |  FROM mo)
        |SELECT source, n,
        |  CASE WHEN n < 2 OR varh <= 0 OR varl <= 0 THEN NULL
        |       ELSE cov / (sqrt(varh) * sqrt(varl)) END AS corr
        |FROM cc ORDER BY source""".stripMargin,

    "q29_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |    round(tf.tf * ln(CAST(n.n_docs + 1 AS DOUBLE) / (dfreq.df + 1)), 6) AS score
        |  FROM tf JOIN dfreq USING (term), n
        |  WHERE tf.doc_id < 50),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS BIGINT) AS rn FROM scored)
        |SELECT doc_id, term, tf, df, score, rn FROM ranked WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,
    "q28_rolling_hash" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    [CAST(unicode(substr(text, i, 1)) AS BIGINT)
        |     for i in generate_series(1, length(text))] AS codes
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN len(codes) = 0 THEN 0
        |       ELSE list_reduce(codes, (x, y) -> (x * 31 + y) % 1000000007) END AS full_hash,
        |  list_min([list_reduce(codes[i : i + 7], (x, y) -> (x * 31 + y) % 1000000007)
        |            for i in generate_series(1, len(codes) - 7)]) AS min_gram_hash,
        |  len(codes) AS n_chars
        |FROM c ORDER BY doc_id""".stripMargin,

    "q25_edit_distance" ->
      """SELECT a.doc_id AS i, b.doc_id AS j,
        |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
        |  CAST(greatest(length(a.text), length(b.text)) AS BIGINT) AS max_len,
        |  1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
        |      / greatest(length(a.text), length(b.text)) AS sim
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY i""".stripMargin,
    "q20_text_stats" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  length(text) AS n_chars,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q21_lang_id" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |h AS (SELECT doc_id,
        |  $langHitsSql
        |FROM t)
        |SELECT doc_id, en_hits, de_hits, es_hits, fr_hits,
        |  CASE
        |    WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
        |    WHEN de_hits >= es_hits AND de_hits >= fr_hits AND de_hits > 0 THEN 'de'
        |    WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
        |    WHEN fr_hits > 0 THEN 'fr'
        |    ELSE 'und' END AS pred_lang
        |FROM h ORDER BY doc_id""".stripMargin,

    // marker table interpolated from CharLangMarkers — the engine and the
    // oracle read the SAME profile constants, so they cannot drift
    "q162_char_lang_id" ->
      s"""WITH $langPredCte
        |SELECT d.lang, p.lang_pred, count(*) AS n_docs
        |FROM documents d JOIN pred p USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q22_quality" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |${qualityMetricsCte("t")},
        |s AS (SELECT doc_id, n_tokens,
        |  CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
        |  CAST(n_short AS DOUBLE) / n_tokens AS short_ratio,
        |  CASE WHEN n_chars = 0 THEN 0.0
        |       ELSE CAST(n_punct AS DOUBLE) / n_chars END AS punct_ratio,
        |  CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio
        |FROM m),
        |sc AS (SELECT *, distinct_ratio * 0.5 + (1.0 - short_ratio) * 0.3 +
        |  (1.0 - punct_ratio) * 0.1 + (1.0 - stopword_ratio) * 0.1 AS score FROM s)
        |SELECT doc_id, n_tokens, distinct_ratio, short_ratio, punct_ratio,
        |  stopword_ratio, score,
        |  CASE WHEN score >= 0.8 THEN 'high'
        |       WHEN score >= 0.6 THEN 'medium' ELSE 'low' END AS bucket
        |FROM sc ORDER BY doc_id""".stripMargin,

    "q23_token_classes" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS sum_alpha_runs,
        |  CAST(sum(len(regexp_extract_all(text, '\b[a-z]\b'))) AS BIGINT) AS sum_single_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q24_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, text, ${Dedup.shingleSql} AS shingles FROM documents)
        |SELECT doc_id, md5(text) AS content_md5,
        |  list_min(list_transform(shingles, s -> md5(s))) AS min_shingle_fp,
        |  len(shingles) AS n_shingles
        |FROM t ORDER BY doc_id""".stripMargin,
  )

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_edit_distance" -> (q25EditDistance _),
    "q28_rolling_hash" -> (q28RollingHash _),
    "q29_tfidf" -> (q29Tfidf _),
    "q20_text_stats" -> (q20TextStats _),
    "q21_lang_id" -> (q21LangId _),
    "q162_char_lang_id" -> (q162CharLangId _),
    "q22_quality" -> (q22Quality _),
    "q23_token_classes" -> (q23TokenClasses _),
    "q24_fingerprint" -> (q24Fingerprint _),
    "q71_char_entropy" -> (q71CharEntropy _),
    "q72_pii_scrub" -> (q72PiiScrub _),
    "q73_url_domains" -> (q73UrlDomains _),
    "q77_bigram_lm" -> (q77BigramLm _),
    "q134_cross_lm" -> (q134CrossLm _),
    "q157_quality_agreement" -> (q157QualityAgreement _),
    "q137_boilerplate" -> (q137Boilerplate _),
    "q147_boilerplate_clean" -> (q147BoilerplateClean _),
    "q149_normalize" -> (q149Normalize _),
    "q79_heavy_hitters" -> (q79HeavyHitters _),
    "q81_source_tokens" -> (q81SourceTokens _),
    "q105_quality_classifier" -> (q105QualityClassifier _),
    "q121_bpe_merges" -> (q121BpeMerges _),
    "q123_bpe_train" -> (q123BpeTrain _),
    "q127_tokenizer_apply" -> (q127TokenizerApply _),
  )
}
