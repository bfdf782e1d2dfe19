package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded buffer for [[TopKBy]]: the k largest (key, value) entries seen
  * so far, ordered key DESC then value ASC. `valueIsLong` selects the
  * value collation: signed 64-bit numeric for BIGINT payloads, binary
  * UTF8 for STRING payloads (the same collation DuckDB applies to ASCII
  * strings, so oracle row_number ties break identically). TreeSet gives
  * ordered eviction in O(log k); state is k entries regardless of input
  * size. Entries are deduplicated by (key, value) — callers feed
  * pre-aggregated (group, value, count) rows, where the pair is unique
  * per group by construction.
  */
final class TopKByBuffer(valueIsLong: Boolean) {
  val set = new java.util.TreeSet[(Long, Any)](new Comparator[(Long, Any)] {
    override def compare(a: (Long, Any), b: (Long, Any)): Int = {
      val c = java.lang.Long.compare(b._1, a._1) // key DESC
      if (c != 0) c
      else if (valueIsLong)                      // value ASC
        java.lang.Long.compare(a._2.asInstanceOf[Long], b._2.asInstanceOf[Long])
      else a._2.asInstanceOf[UTF8String].compareTo(b._2.asInstanceOf[UTF8String])
    }
  })
  def add(key: Long, value: Any, k: Int): Unit =
    if (set.size < k) { set.add((key, value)); () }
    else if (set.comparator.compare((key, value), set.last) < 0 && set.add((key, value))) {
      set.pollLast(); ()
    }
  def merge(other: TopKByBuffer, k: Int): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) { val e = it.next(); add(e._1, e._2, k) }
  }
}

/** `top_k_by(value, key, k)` — mergeable per-group top-k aggregate: the k
  * (value, key) entries with the largest keys, emitted as an ordered
  * ARRAY<STRUCT<v, c: BIGINT>> (key desc, value asc on ties). The value may
  * be STRING or BIGINT; `v`'s output type follows it. The BIGINT overload
  * exists because id payloads (vec_id, doc_id) otherwise had to ride
  * through `lpad(CAST(id AS STRING), w, '0')` to make binary collation
  * match numeric order — a per-candidate-row string allocation on the
  * hottest stream of q109/q113/q118, and silently wrong for ids wider than
  * the pad or negative (zero-padding mis-orders sign-magnitude text).
  * Numeric payloads compare as the 64-bit integers they are.
  *
  * This is the aggregate form of `row_number().over(partitionBy(g)
  * .orderBy(key.desc)) <= k` — and the reason it exists is the same reason
  * as [[KmvSketch]]: the window formulation sorts EVERY group's full row
  * set on one reducer, so one hot group (a web-scale language's vocabulary,
  * a mega-site's URL set) owns a task. As a TypedImperativeAggregate the
  * top-k runs under ObjectHashAggregateExec with map-side partial
  * aggregation — every partition reduces each group to <= k entries before
  * the shuffle, and merging buffers re-takes the k best. q55 hand-rolled
  * this shape (per-partition top-k, then merge); this aggregate makes it a
  * one-call primitive.
  */
case class TopKBy(
    value: Expression,
    key: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByBuffer] {

  private def valueIsLong: Boolean = value.dataType == LongType

  override def children: Seq[Expression] = Seq(value, key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", value.dataType), StructField("c", LongType))),
    containsNull = false)
  override def prettyName: String = "top_k_by"

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType != StringType && value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by expects a STRING or BIGINT value, got ${value.dataType.sql}")
    else if (key.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by expects a BIGINT key, got ${key.dataType.sql}")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"top_k_by k must be positive, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKByBuffer = new TopKByBuffer(valueIsLong)

  override def update(buf: TopKByBuffer, input: InternalRow): TopKByBuffer = {
    val v = value.eval(input)
    val c = key.eval(input)
    if (v != null && c != null) {
      // UTF8String may point into a reused row buffer — copy before retaining
      val retained = v match {
        case s: UTF8String => s.copy()
        case other => other
      }
      buf.add(c.asInstanceOf[Long], retained, k)
    }
    buf
  }

  override def merge(buf: TopKByBuffer, other: TopKByBuffer): TopKByBuffer = {
    buf.merge(other, k)
    buf
  }

  override def eval(buf: TopKByBuffer): Any = {
    val out = new Array[Any](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) {
      val (c, v) = it.next()
      out(i) = new GenericInternalRow(Array[Any](v, c))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKByBuffer): Array[Byte] = {
    if (valueIsLong) {
      val bb = ByteBuffer.allocate(4 + 16 * buf.set.size)
      bb.putInt(buf.set.size)
      val it = buf.set.iterator()
      while (it.hasNext) {
        val (c, v) = it.next()
        bb.putLong(c).putLong(v.asInstanceOf[Long])
      }
      bb.array()
    } else {
      var n = 4
      val it0 = buf.set.iterator()
      while (it0.hasNext) n += 12 + it0.next()._2.asInstanceOf[UTF8String].numBytes()
      val bb = ByteBuffer.allocate(n)
      bb.putInt(buf.set.size)
      val it = buf.set.iterator()
      while (it.hasNext) {
        val (c, v) = it.next()
        val bytes = v.asInstanceOf[UTF8String].getBytes
        bb.putLong(c).putInt(bytes.length).put(bytes)
      }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): TopKByBuffer = {
    val buf = new TopKByBuffer(valueIsLong)
    val bb = ByteBuffer.wrap(bytes)
    var n = bb.getInt
    while (n > 0) {
      if (valueIsLong) {
        val c = bb.getLong
        buf.add(c, bb.getLong, k)
      } else {
        val c = bb.getLong
        val len = bb.getInt
        val arr = new Array[Byte](len)
        bb.get(arr)
        buf.add(c, UTF8String.fromBytes(arr), k)
      }
      n -= 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(value = newChildren(0), key = newChildren(1))
}
