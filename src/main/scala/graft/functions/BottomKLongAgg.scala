package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mutable sorted buffer for [[BottomKLongAgg]]: the k smallest longs
  * seen so far, ascending, duplicates kept — primitive array +
  * arraycopy inserts, no per-row allocation. */
final class BottomKLongBuffer(val k: Int) {
  val a: Array[Long] = new Array[Long](k)
  var n: Int = 0

  /** Insert keeping the k-smallest invariant: position = first index
    * whose value is STRICTLY greater than v (ties keep the incumbent
    * first — same rule as [[BottomKLong]].insert's `indexWhere(v < _)`,
    * and irrelevant to the result multiset anyway). */
  def insert(v: Long): Unit = {
    var lo = 0
    var hi = n
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (a(m) <= v) lo = m + 1 else hi = m
    }
    if (n < k) {
      System.arraycopy(a, lo, a, lo + 1, n - lo)
      a(lo) = v
      n += 1
    } else if (lo < k) {
      System.arraycopy(a, lo, a, lo + 1, k - lo - 1)
      a(lo) = v
    }
  }
}

/** `bottom_k_long(e, k)` — the k SMALLEST values of a Long column per
  * group, ascending, with an O(k) PRIMITIVE buffer at every stage
  * (update, partial, merge): the [[BottomKLong]] typed Aggregator's
  * contract (deterministic, mirrorable as
  * `row_number() OVER (... ORDER BY v) <= k`) without its costs — the
  * udaf path rebuilds an immutable Vector per input row and pays the
  * encoder on every buffer touch, which r12 measured at ~35% OVER the
  * window form it was meant to replace on the hot co-purchase
  * projection. This expression's update is a binary search + arraycopy
  * into a primitive array; serialization (8 bytes/value) happens only
  * at partial-exchange boundaries. Nulls are skipped, as collect_list
  * does. */
case class BottomKLongAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKLongBuffer] with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottom_k_long"

  override def createAggregationBuffer(): BottomKLongBuffer =
    new BottomKLongBuffer(k)

  override def update(
      buf: BottomKLongBuffer, input: InternalRow): BottomKLongBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: BottomKLongBuffer, other: BottomKLongBuffer): BottomKLongBuffer = {
    var i = 0
    while (i < other.n) { buf.insert(other.a(i)); i += 1 }
    buf
  }

  override def eval(buf: BottomKLongBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.a, buf.n))

  override def serialize(buf: BottomKLongBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.a(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKLongBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BottomKLongBuffer(k)
    // The serialized values are ascending and ≤ k of them: bulk-load.
    var i = 0
    while (i < n) { buf.a(i) = bb.getLong; i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKLongAgg =
    copy(child = newChild)
}

object BottomKLongAgg {
  /** Column wrapper: k smallest longs per group, ascending. */
  def bottomKLong(e: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKLongAgg(ColumnBridge.expression(e), k).toAggregateExpression())
}
