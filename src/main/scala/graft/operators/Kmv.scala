package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** K-minimum-values distinct sketch — the ONE definition of the algebra
  * shared by q41 (per-group estimate) and q57 (sketch merge), in both its
  * Spark and DuckDB-SQL forms. Keeping hash width, k, and the estimator in
  * a single object is what guarantees the engines can never drift apart on
  * one call site but not another.
  *
  * Estimator: hash keys uniformly into [0, 2^60); keep the k smallest
  * distinct hashes; |D| ~= (k-1) * 2^60 / kth_min, exact when |D| <= k.
  * KMV merges by unioning hash sets and re-taking k minima (unlike HLL,
  * whose register layout is engine-private, every step here reproduces
  * bit-for-bit in any engine with md5).
  */
object Kmv {

  /** Sketch size. */
  val K = 64
  /** 2^60 (exactly representable as a double) — the hash-space size. */
  val Two60 = 1.152921504606846976e18

  /** 60-bit uniform hash of a key (first 15 md5 hex chars as BIGINT — the
    * native [[graft.functions.Md5Prefix64]]; callers register via
    * [[graft.functions.GraftFunctions.register]], which they already need
    * for `kmv_sketch`).
    */
  def hash60(c: Column): Column =
    call_function("md5_prefix64", c.cast("string"))

  /** Mergeable k-min sketch of a hash column: ascending array of the K
    * smallest distinct hashes ([[graft.functions.KmvSketch]] — map-side
    * combined ObjectHashAggregate, never a per-group window/sort).
    */
  def sketch(h: Column): Column = call_function("kmv_sketch", h, lit(K))

  /** kth-minimum from a sketch array; null when the set has < K members
    * (the estimate's exact branch applies then). The size guard keeps
    * ANSI-mode element_at from faulting on short arrays.
    */
  def kth(sk: Column): Column =
    when(size(sk) === K, element_at(sk, K))

  /** Distinct estimate from (distinct count if small, kth-minimum hash). */
  def estimate(nu: Column, kth: Column): Column =
    when(nu <= K, nu.cast("double"))
      .otherwise(round(lit((K - 1).toDouble) * lit(Two60) / kth.cast("double"), 4))

  /** DuckDB twin of [[hash60]]. */
  def hash60Sql(expr: String): String =
    s"('0x' || substr(md5(CAST($expr AS VARCHAR)), 1, 15))::BIGINT"

  /** DuckDB twin of [[estimate]]. */
  def estimateSql(nu: String, kth: String): String =
    s"""CASE WHEN $nu <= $K THEN CAST($nu AS DOUBLE)
       |     ELSE round(${K - 1}.0 * 1152921504606846976.0 /
       |                CAST($kth AS DOUBLE), 4) END""".stripMargin
}
