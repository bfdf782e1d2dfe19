package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Deterministic Bloom-filter kernels shared by the build aggregate and the
  * membership expression. The filter is a plain byte[] bitset; positions
  * come from double hashing h_i = h1 + i·h2 (Kirsch–Mitzenmacher) over a
  * caller-supplied 64-bit hash (xxhash64 upstream), so the SAME bytes come
  * out regardless of row order or partitioning — bitwise OR is commutative —
  * and the filter survives serialization to a literal for plan-embedded
  * runtime pruning.
  */
object Bloom {
  /** k hash probes derived from one 64-bit hash; h2 forced odd so the
    * probe sequence cycles through all bit positions.
    */
  @inline private def probe(hash: Long, i: Int, nBits: Int): Int = {
    val h1 = hash
    val h2 = (hash >>> 32) | 1L
    (((h1 + i * h2) & Long.MaxValue) % nBits).toInt
  }

  def add(bits: Array[Byte], hash: Long, numHashes: Int): Unit = {
    val nBits = bits.length << 3
    var i = 0
    while (i < numHashes) {
      val p = probe(hash, i, nBits)
      bits(p >>> 3) = (bits(p >>> 3) | (1 << (p & 7))).toByte
      i += 1
    }
  }

  /** Static so [[BloomMightContain.doGenCode]] can call it from generated
    * Java — the expression stays inside whole-stage codegen.
    */
  def mightContain(bits: Array[Byte], hash: Long, numHashes: Int): Boolean = {
    val nBits = bits.length << 3
    var i = 0
    while (i < numHashes) {
      val p = probe(hash, i, nBits)
      if ((bits(p >>> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }

  def union(into: Array[Byte], from: Array[Byte]): Unit = {
    var i = 0
    while (i < into.length) { into(i) = (into(i) | from(i)).toByte; i += 1 }
  }
}

/** `bloom_build(hash, numBits, numHashes)` — mergeable Bloom-filter
  * aggregate: OR-combine per-partition bitsets built from 64-bit hashes;
  * output is the raw bitset bytes.
  *
  * This is the build side of the runtime-filter pattern at 100 TB: aggregate
  * the (filtered, small) dim-side join keys into a fixed-size filter — map-
  * side partials mean each partition ships one bitset, never its keys — then
  * broadcast the bytes and prune the fact scan with [[BloomMightContain]]
  * BEFORE the shuffle/join. False positives only cost work; the exact join
  * that follows removes them, so results stay exact while the shuffle
  * carries ~selectivity× less data. Spark's own `injectRuntimeFilter` does
  * this opportunistically; this pair makes the plan explicit and testable.
  */
case class BloomBuild(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_build expects a BIGINT hash, got ${child.dataType.sql}")
    else if (numBits <= 0 || (numBits & 7) != 0)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_build numBits must be a positive multiple of 8, got $numBits")
    else if (numHashes <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_build numHashes must be positive, got $numHashes")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBits >>> 3)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    Bloom.union(buf, other)
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuild =
    copy(child = newChildren(0))
}

/** `bloom_might_contain(filterBytes, hash)` — membership probe against a
  * [[BloomBuild]] bitset; `numHashes` must match the build side. Codegen'd
  * (static call into [[Bloom.mightContain]]) so the pruning filter runs
  * inside the scan's WholeStageCodegen span, upstream of any shuffle.
  */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (BINARY, BIGINT), got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(bits: Any, hash: Any): Any =
    Bloom.mightContain(bits.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, hash) =>
      s"${ev.value} = graft.functions.Bloom.mightContain($bits, $hash, $numHashes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
