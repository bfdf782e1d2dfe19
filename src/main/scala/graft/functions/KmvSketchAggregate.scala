package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded buffer for a KMV (k-minimum-values) distinct sketch: the k
  * smallest DISTINCT hash values seen so far. TreeSet gives dedup +
  * ordered eviction in O(log k) with k fixed and tiny (64), so the
  * per-group state is at most k boxed longs regardless of input size.
  */
final class KmvBuffer {
  val set = new java.util.TreeSet[java.lang.Long]()
  def add(v: Long, k: Int): Unit =
    if (set.size < k) { set.add(v); () }
    else if (v < set.last && set.add(v)) { set.pollLast(); () }
  def merge(other: KmvBuffer, k: Int): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next(), k)
  }
}

/** `kmv_sketch(hash)` — mergeable k-minimum-values sketch aggregate.
  * Input: a uniform hash (LONG, e.g. [[graft.operators.Kmv.hash60]]);
  * output: the ascending array of the k smallest distinct hashes. The
  * distinct estimate is then `(k-1) * 2^60 / kth_min` (exact when fewer
  * than k distinct values exist: the array IS the distinct set).
  *
  * Why an aggregate and not a window: `row_number().over(partitionBy(g))`
  * sends each group's entire distinct-hash set through ONE reducer with a
  * sort — one day of a 100 TB event stream is hundreds of millions of
  * hashes on a single task. As a TypedImperativeAggregate the sketch gets
  * map-side partial aggregation (every partition reduces to <= k values
  * before the shuffle) and runs under ObjectHashAggregateExec, the same
  * contract as [[LatestRow]]. Merging sketches = union + re-take k minima
  * ([[merge]]), which is also exactly how per-day sketches roll up to any
  * date range without rescanning raw data.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch expects a BIGINT hash, got ${child.dataType.sql}")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"kmv_sketch k must be positive, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.merge(other, k)
    buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val out = new Array[Long](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val buf = new KmvBuffer
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong, k)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren(0))
}
