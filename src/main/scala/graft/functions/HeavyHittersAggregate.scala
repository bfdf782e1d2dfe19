package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded Misra-Gries frequency summary: at most `m` (item, count)
  * counters. Overflow evicts by the classic decrement-all step, so every
  * surviving count is an underestimate by at most n/(m+1) where n is the
  * items consumed — and EXACT whenever the buffer never overflowed
  * (distinct items <= m on every partial), which is the regime the oracle
  * checks.
  */
final class HeavyHittersBuffer {
  val counts = new java.util.HashMap[String, Long]()

  def add(item: String, m: Int): Unit = {
    val c = counts.get(item)
    if (c != 0L) { counts.put(item, c + 1L); () }
    else if (counts.size < m) { counts.put(item, 1L); () }
    else decrementAll(1L)
  }

  /** Mergeable-summaries merge (Agarwal et al., PODS'12): sum counts
    * item-wise, then if over capacity subtract the (m+1)-th largest count
    * from everything and drop the non-positive remainder — the result is
    * again a valid MG summary of the combined stream.
    */
  def merge(other: HeavyHittersBuffer, m: Int): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (counts.size > m) {
      val vals = new Array[Long](counts.size)
      val vit = counts.values().iterator()
      var i = 0
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      // (m+1)-th largest = index size-m-1 in ascending order
      decrementAll(vals(counts.size - m - 1))
    }
  }

  private def decrementAll(by: Long): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }
}

/** `heavy_hitters(item, m)` — mergeable Misra-Gries frequent-items
  * aggregate over a STRING column. Output: ARRAY<STRUCT<item, cnt>>
  * ordered (cnt DESC, item ASC), at most m entries.
  *
  * Why an aggregate: the exact alternative (`groupBy(item).count()` then
  * top-k) shuffles the full distinct-item census — fine for a 31-word test
  * vocabulary, a skew hazard for a web-scale one (URLs, typos, numbers
  * push distinct terms into the billions). As a TypedImperativeAggregate
  * under ObjectHashAggregateExec, every partition reduces its token stream
  * to <= m counters before the exchange, and merges re-cap at m — constant
  * state per partition regardless of input size, the same contract as
  * [[KmvSketch]].
  *
  * Exactness: counts are exact when no buffer ever overflowed (distinct
  * <= m everywhere); otherwise each count underestimates by at most
  * n/(m+1) and the summary still contains every item with true frequency
  * > n/(m+1) — the standard MG guarantee, spec-tested in the approx
  * regime.
  */
case class HeavyHitters(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHittersBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters expects a STRING item, got ${child.dataType.sql}")
    else if (m <= 0)
      TypeCheckResult.TypeCheckFailure(s"heavy_hitters m must be positive, got $m")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): HeavyHittersBuffer = new HeavyHittersBuffer

  override def update(buf: HeavyHittersBuffer, input: InternalRow): HeavyHittersBuffer = {
    val v = child.eval(input)
    // UTF8String may alias reused row memory — materialize to String
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, m)
    buf
  }

  override def merge(buf: HeavyHittersBuffer, other: HeavyHittersBuffer): HeavyHittersBuffer = {
    buf.merge(other, m)
    buf
  }

  override def eval(buf: HeavyHittersBuffer): Any = {
    val entries = new Array[(String, Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = entries.sortBy { case (item, cnt) => (-cnt, item) }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), cnt))
    })
  }

  override def serialize(buf: HeavyHittersBuffer): Array[Byte] = {
    var n = 4
    val sit = buf.counts.entrySet().iterator()
    val items = new java.util.ArrayList[(Array[Byte], Long)](buf.counts.size)
    while (sit.hasNext) {
      val e = sit.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      items.add((b, e.getValue))
      n += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(n)
    bb.putInt(items.size)
    var i = 0
    while (i < items.size) {
      val (b, c) = items.get(i)
      bb.putInt(b.length).put(b).putLong(c)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HeavyHittersBuffer = {
    val buf = new HeavyHittersBuffer
    val bb = ByteBuffer.wrap(bytes)
    var k = bb.getInt
    while (k > 0) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      buf.counts.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      k -= 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0))
}
