package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro-Winkler similarity over two string columns — the
  * record-linkage verifier (Winkler 1990, building on Jaro 1989) that
  * complements the candidate generators in q291/q296: blocking proposes
  * pairs, an edit-window similarity scores them.
  *
  * Semantics are pinned to the common reference implementation (and
  * verified bit-identical to DuckDB's `jaro_winkler_similarity` over
  * randomized corpora in StringSimSpec): match window
  * ⌊max(l1,l2)/2⌋−1, transpositions = half the misaligned matches,
  * Winkler prefix boost (≤4 chars, weight 0.1) applied only when the
  * Jaro score exceeds 0.7, and the degenerate rules empty→0.0 (both
  * empty INCLUDED) and equal→1.0. IEEE evaluation order matches the
  * reference exactly — (m/l1 + m/l2 + (m−t)/m)/3 then j + p·0.1·(1−j)
  * — so downstream integer gates (floor(jw·1e6)) are engine-portable.
  *
  * Operates on UTF-8 BYTES (exact for the ASCII linkage corpora it
  * serves; multi-byte text compares code-unit-wise, same as DuckDB).
  * A Scala UDF here would box both strings per pair; on the O(block²)
  * pair streams of an ER pipeline this expression stays inside
  * whole-stage codegen with two array allocations per comparison.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinkler.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Reference-order Jaro-Winkler; see class doc for the pinned rules. */
  def jw(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.getBytes
    val s2 = ub.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    var win = math.max(l1, l2) / 2 - 1
    if (win < 0) win = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      var j = math.max(0, i - win)
      val hi = math.min(l2, i + win + 1)
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    var j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3
    if (j > 0.7) {
      val pm = math.min(4, math.min(l1, l2))
      var p = 0
      var stop = false
      while (p < pm && !stop) {
        if (s1(p) == s2(p)) p += 1 else stop = true
      }
      j = j + p * 0.1 * (1 - j)
    }
    j
  }

  /** Column wrapper. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
