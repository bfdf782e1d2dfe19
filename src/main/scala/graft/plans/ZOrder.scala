package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional scan pruning.
  *
  * A table sorted on one column gives tight per-file min/max stats on that
  * column only — a predicate on any OTHER column prunes nothing. Writing
  * the table clustered by the interleaved-bit z-value gives every file a
  * narrow range on EVERY participating dimension, so parquet footer
  * (file/row-group) min-max stats prune scans for predicates on any of
  * them. At 100 TB this is the difference between "filter on (partkey,
  * suppkey) reads one file in N" and "reads everything except on the one
  * sorted column" — the standard layout move next to partitioning and
  * bucketing (same trick Delta/Iceberg `OPTIMIZE ZORDER BY` applies).
  *
  * The z-value is pure codegen bitwise arithmetic (shift/mask/add on
  * longs) — no UDF, no interpreted path.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column (values are masked into
    * `[0, 2^bits)`; callers normalize wider domains first — e.g.
    * `pmod(key, 1 << bits)` or a rank-based quantization). Column i
    * contributes bit b to z-bit `b * n + i`; disjoint targets make `+`
    * equal to bitwise-or.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty && bits * cols.size <= 63,
      s"${cols.size} cols x $bits bits must fit a long")
    val n = cols.size
    val parts = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    parts.reduce(_ + _)
  }

  /** Driver-side scalar twin of [[zValue]] — the SAME interleave over
    * already-scaled longs, used by the incremental z-order re-cluster to
    * derive a file's conservative z-range from its manifest min/max
    * corners (the Morton code is monotone in each coordinate, so a
    * box's z-minimum is at the all-lo corner and its z-maximum at the
    * all-hi corner).
    */
  def zScalar(vals: Seq[Long], bits: Int): Long = {
    require(vals.nonEmpty && bits * vals.size <= 63,
      s"${vals.size} vals x $bits bits must fit a long")
    val n = vals.size
    var z = 0L
    var b = 0
    while (b < bits) {
      var i = 0
      while (i < n) {
        z |= ((vals(i) >> b) & 1L) << (b * n + i)
        i += 1
      }
      b += 1
    }
    z
  }

  /** Write `df` into `files` files clustered by the z-value of `dims`:
    * range-partition on z (each file owns a contiguous z interval), sort
    * within partitions so row groups inherit the locality too. The z
    * column itself is not persisted — it is derivable, and the stats that
    * matter are the per-file min/max of the ORIGINAL dimensions.
    */
  def writeClustered(df: DataFrame, dims: Seq[Column], path: String,
      files: Int, bits: Int = 16): Unit = {
    val zc = "_graft_z"
    df.withColumn(zc, zValue(dims, bits))
      .repartitionByRange(files, col(zc))
      .sortWithinPartitions(col(zc))
      .drop(zc)
      .write.mode("overwrite").parquet(path)
  }
}
