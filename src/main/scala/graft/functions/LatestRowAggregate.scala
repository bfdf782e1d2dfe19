package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Mutable buffer: the best (ordering, payload) pair seen so far. */
final class LatestRowBuffer(var ordering: Any, var payload: Any) {
  def isEmpty: Boolean = ordering == null
}

/** `latest_row(payload, ordering)` — argmax aggregate that keeps the payload
  * of the row with the greatest `ordering` value (any orderable type,
  * including structs for composite (ts, priority, seq) orderings).
  *
  * Why it exists: the CDC fold is `groupBy(key).agg(argmax-by-ordering)`.
  * Spark's built-in `max_by` is declarative with a struct-typed buffer,
  * which the fixed-width hash aggregate cannot hold — the plan degrades to
  * SortAggregate (two per-partition sorts per merge). As a
  * TypedImperativeAggregate this function runs under ObjectHashAggregateExec
  * (hash map of group -> buffer object, sort-based fallback only on spill),
  * keeping the latest-per-key merge sort-free end to end while preserving
  * map-side partial aggregation.
  */
case class LatestRow(
    payloadExpr: Expression,
    orderingExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LatestRowBuffer] {

  override def children: Seq[Expression] = Seq(payloadExpr, orderingExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = payloadExpr.dataType
  override def prettyName: String = "latest_row"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(orderingExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"latest_row ordering type ${orderingExpr.dataType.sql} is not orderable")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(orderingExpr.dataType)

  override def createAggregationBuffer(): LatestRowBuffer =
    new LatestRowBuffer(null, null)

  override def update(buf: LatestRowBuffer, input: InternalRow): LatestRowBuffer = {
    val ord = orderingExpr.eval(input)
    if (ord != null && (buf.isEmpty || ordering.compare(ord, buf.ordering) > 0)) {
      buf.ordering = InternalRow.copyValue(ord)
      buf.payload = InternalRow.copyValue(payloadExpr.eval(input))
    }
    buf
  }

  override def merge(buf: LatestRowBuffer, other: LatestRowBuffer): LatestRowBuffer = {
    if (!other.isEmpty &&
        (buf.isEmpty || ordering.compare(other.ordering, buf.ordering) > 0)) {
      buf.ordering = other.ordering
      buf.payload = other.payload
    }
    buf
  }

  override def eval(buf: LatestRowBuffer): Any = buf.payload

  @transient private lazy val serializer =
    UnsafeProjection.create(Array(orderingExpr.dataType, payloadExpr.dataType))
  @transient private lazy val pairRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)

  override def serialize(buf: LatestRowBuffer): Array[Byte] =
    if (buf.isEmpty) Array.emptyByteArray
    else {
      pairRow.update(0, buf.ordering)
      pairRow.update(1, buf.payload)
      serializer(pairRow).getBytes
    }

  override def deserialize(bytes: Array[Byte]): LatestRowBuffer =
    if (bytes.isEmpty) createAggregationBuffer()
    else {
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      new LatestRowBuffer(
        InternalRow.copyValue(row.get(0, orderingExpr.dataType)),
        InternalRow.copyValue(row.get(1, payloadExpr.dataType)))
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): LatestRow =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LatestRow =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LatestRow =
    copy(payloadExpr = newChildren(0), orderingExpr = newChildren(1))
}
