package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed `Aggregator` (SURVEY §2.10): per-group top-k values with a
  * bounded buffer — the state per group is ≤ k doubles no matter how
  * large the group, unlike `collect_list`+`sort` whose state is O(group
  * size). `reduce` keeps a descending-sorted prefix of length ≤ k;
  * `merge` folds one buffer into the other, so partial (map-side)
  * aggregation works and the shuffle carries at most k doubles per
  * group per mapper — the same bounded-state contract that makes
  * TakeOrderedAndProject safe globally, applied per key.
  *
  * Values are carried unmodified (no arithmetic), so results are exact
  * and engine-portable: the DuckDB oracle mirrors with
  * list_sort(..., 'DESC')[1:k], and a sorted multiset of equal values is
  * deterministic under ties.
  */
case class TopK(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[Double] = Vector.empty

  override def reduce(b: Seq[Double], a: Double): Seq[Double] = insert(b, a)

  override def merge(x: Seq[Double], y: Seq[Double]): Seq[Double] =
    y.foldLeft(x)(insert)

  override def finish(r: Seq[Double]): Seq[Double] = r

  private def insert(b: Seq[Double], v: Double): Seq[Double] = {
    // Total order via Double.compare: NaN ranks ABOVE everything, like
    // Spark's sort and DuckDB's list_sort DESC — IEEE `>` would silently
    // drop NaN (NaN > x is false for all x).
    val idx = b.indexWhere(x => java.lang.Double.compare(v, x) > 0)
    val pos = if (idx < 0) b.size else idx
    if (pos >= k) b
    else (b.take(pos) :+ v) ++ b.drop(pos).take(k - pos - 1)
  }

  override def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

/** Bounded bottom-k over Long keys: per-group k SMALLEST values with an
  * O(k) buffer at every stage (update, partial, merge) — the same
  * bounded-state contract as [[TopK]], for id-valued columns. Unlike
  * [[CollectCapped]] (whose surviving subset for an oversized group
  * depends on partitioning), the k-smallest multiset is a DETERMINISTIC
  * function of the group, so it can serve as a mirrorable candidate cap:
  * the DuckDB oracle reproduces it exactly with
  * `row_number() OVER (PARTITION BY g ORDER BY v) <= k`. Used by q352 to
  * bound the per-IVF-bucket negative pool — a degenerate corpus that
  * lands everything in one bucket keeps state O(k) and pair volume
  * O(n·k) instead of n². */
case class BottomKLong(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], a: Long): Seq[Long] = insert(b, a)

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    y.foldLeft(x)(insert)

  override def finish(r: Seq[Long]): Seq[Long] = r

  private def insert(b: Seq[Long], v: Long): Seq[Long] = {
    val idx = b.indexWhere(v < _)
    val pos = if (idx < 0) b.size else idx
    if (pos >= k) b
    else (b.take(pos) :+ v) ++ b.drop(pos).take(k - pos - 1)
  }

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
