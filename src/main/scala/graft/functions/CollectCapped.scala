package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_capped(e, cap)` — collect_list whose BUFFER never exceeds
  * cap+1 elements, at every stage of aggregation (partial, merge,
  * final).
  *
  * This is what makes the near-dup bucket caps a real degenerate-data
  * guard: `filter(size(xs) <= cap)` after a plain collect_list bounds
  * the downstream pair emit but still materializes the whole
  * pathological bucket in one aggregation buffer first — a
  * mass-duplicated document at 100 TB would OOM the task inside the
  * collect, before the filter ever runs. Here update and merge stop
  * appending at cap+1, so per-group state is O(cap) regardless of group
  * size, while the cap+1 length still signals "over cap" to the filter.
  *
  * Contract: for groups with ≤ cap total elements the result is exactly
  * collect_list's multiset (no truncation can occur at any stage, since
  * every partial holds a subset); larger groups yield SOME cap+1-subset
  * — callers must treat length cap+1 as "oversized, drop", which is the
  * only deterministic reading (which subset survives depends on
  * partitioning). Nulls are skipped, as collect_list does.
  */
case class CollectCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(cap > 0, s"cap must be positive, got $cap")

  private def limit = cap + 1

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_collect_capped"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  override def update(
      buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buf.size < limit) {
      val v = child.eval(input)
      if (v != null) buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(
      buf: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buf.size < limit && it.hasNext) buf += it.next()
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  private lazy val projection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buf = mutable.ArrayBuffer.empty[Any]
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v: Any) => buf += v)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCapped =
    copy(child = newChild)
}

object CollectCapped {
  /** Column wrapper: bounded-state collect; length cap+1 ⟺ "over cap". */
  def collectCapped(e: Column, cap: Int): Column =
    ColumnBridge.column(
      CollectCapped(ColumnBridge.expression(e), cap).toAggregateExpression())
}
