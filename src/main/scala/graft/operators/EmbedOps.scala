package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 embedding-pipeline operators on top of [[Similarity]]'s exact
  * integer-cosine machinery: IVF index health profiling (q114) and
  * embedding-space train/eval decontamination (q115).
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

  /** Embedding-space decontamination (q115): remove from the TRAINING
    * corpus every vector whose cosine to ANY held-out eval vector reaches
    * [[DecontamTau]] — the semantic analog of q52's n-gram decontamination
    * (which only catches verbatim leakage; a paraphrased eval item needs
    * the embedding test). Eval set = vec_id % 50 == 0.
    *
    * Scale shape: an eval benchmark is small and FIXED-size (thousands of
    * items) regardless of corpus scale, so the eval side broadcasts and
    * the train side streams through ONE BroadcastNestedLoopJoin LeftSemi —
    * per-row work is |eval| integer dots with early-exit on first match,
    * and nothing corpus-sized shuffles (contrast q97, whose within-corpus
    * pairing needs LSH bucketing because BOTH sides are the corpus). The
    * audit agg mirrors q97's: per label, how much of the train split the
    * prune removes.
    */
  def q115SemanticDecontam(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.qvecs(spark, dir).localCheckpoint(true)
    val eval = e.filter(col("vec_id") % 50 === 0)
      .select(col("q").as("qq"), col("nq").as("qn"))
    val train = e.filter(col("vec_id") % 50 =!= 0)
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

    "q115_semantic_decontam" ->
      s"""WITH $qCte,
        |ev AS (SELECT q AS qq, nq AS qn FROM e WHERE vec_id % 50 = 0),
        |tr AS (SELECT * FROM e WHERE vec_id % 50 <> 0),
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
  )

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q114_ivf_cells" -> (q114IvfCells _),
    "q115_semantic_decontam" -> (q115SemanticDecontam _),
  )
}
