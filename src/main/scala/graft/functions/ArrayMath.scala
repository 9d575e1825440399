package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The built-in route — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is
  * correct but interpreted: Spark's higher-order array functions evaluate
  * their lambda per element outside whole-stage codegen and allocate an
  * intermediate product array per row. On pairwise workloads (q27's
  * near-dup blocking join evaluates millions of pairs) that interpretive
  * overhead dominated the round-1 bench. This expression generates a
  * tight Java loop over the two `ArrayData` buffers — no allocation, no
  * lambda dispatch — inside WholeStageCodegen.
  *
  * Semantics match the built-in formulation bit-for-bit: a sequential
  * left fold of `a(i) * b(i)` in DOUBLE starting at 0.0 (same IEEE
  * additions of the same operands in the same order), so the DuckDB
  * oracle mirror (Det.sqlDot) remains bit-identical. A null array, any
  * null element, or MISMATCHED array lengths yields null — the zip_with
  * chain null-pads the short side and the oracle's out-of-range index is
  * NULL, so a silent partial dot over min(len) would be a plausible wrong
  * number where both references return null (a corrupt embedding row must
  * surface as null, not corrupt similarity rankings undetected).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayMath {
  /** Column-level dot product backed by [[DotProduct]]. Inputs must
    * already be `array<double>` (VectorOps.asDouble casts). */
  def dotCodegen(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
