package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded (Ukkonen-style) edit distance with an early cutoff: returns
  * levenshtein(a, b) when it is ≤ `bound`, else `bound + 1` — exactly
  * `least(levenshtein(a, b), bound + 1)`, which is what every
  * record-linkage verifier actually consumes (q52 thresholds at k; the
  * distance's magnitude beyond k is never read).
  *
  * Why a custom expression when Spark ships `levenshtein`: the builtin
  * fills the full O(n·m) DP matrix per pair; the band restricts work to
  * the 2k+1 diagonal strip — O(k·n) — and bails the moment the whole
  * strip exceeds the bound. On an ER pair stream where 99% of pairs are
  * far apart (the q302/q296 candidate shape), almost every evaluation
  * exits after the length check or the first few rows. (Spark's
  * levenshtein does accept a threshold argument in recent versions; the
  * banded kernel here also pins the exact sentinel contract the oracle
  * states, independent of builtin behavior changes.) Byte-wise over
  * UTF-8, matching DuckDB's byte-wise levenshtein on ASCII corpora.
  */
case class BoundedLevenshtein(left: Expression, right: Expression, bound: Int)
    extends BinaryExpression {

  require(bound >= 0, s"bound must be >= 0, got $bound")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bounded_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    BoundedLevenshtein.banded(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], bound)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BoundedLevenshtein.banded($a, $b, $bound)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedLevenshtein =
    copy(left = newLeft, right = newRight)
}

object BoundedLevenshtein {

  // Per-thread scratch rows keep the kernel allocation-free. Measured
  // honestly at sf0.1 (8M pairs): the pair-stream join dominates the
  // query either way (~4.2 s with or without per-call allocations);
  // the scratch matters when the kernel is the bottleneck (longer
  // strings, wider bands), not at 12-char part names.
  private val rowA = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](64)
  }
  private val rowB = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](64)
  }
  private def scratch(tl: ThreadLocal[Array[Int]], size: Int): Array[Int] = {
    var a = tl.get()
    if (a.length < size) { a = new Array[Int](Integer.highestOneBit(size - 1) << 1); tl.set(a) }
    a
  }

  /** Banded DP; returns min(levenshtein(a,b), k+1). */
  def banded(ua: UTF8String, ub: UTF8String, k: Int): Int = {
    val s = ua.getBytes
    val t = ub.getBytes
    val n = s.length
    val m = t.length
    val inf = k + 1
    if (math.abs(n - m) > k) return inf
    if (n == 0) return math.min(m, inf)
    if (m == 0) return math.min(n, inf)
    var prev = scratch(rowA, m + 1)
    var cur = scratch(rowB, m + 1)
    java.util.Arrays.fill(prev, 0, m + 1, inf)
    var j = 0
    while (j <= math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, 0, m + 1, inf)
      cur(0) = if (i <= k) i else inf
      var best = cur(0)
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      j = lo
      while (j <= hi) {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        if (prev(j) + 1 < v) v = prev(j) + 1
        if (cur(j - 1) + 1 < v) v = cur(j - 1) + 1
        if (v > inf) v = inf
        cur(j) = v
        if (v < best) best = v
        j += 1
      }
      if (best >= inf) return inf // whole band over the bound — bail
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    math.min(prev(m), inf)
  }

  /** Column wrapper. */
  def boundedLevenshtein(a: Column, b: Column, k: Int): Column =
    ColumnBridge.column(BoundedLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b), k))
}
