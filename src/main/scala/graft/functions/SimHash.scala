package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `graft_simhash32(digests)` — the 32-bit SimHash of an md5-hex array,
  * one compiled loop per row.
  *
  * Bit j of the result is the sign (strictly positive → 1) of
  * Σ over digests of ±1, where the vote is +1 iff hex digit j of the
  * digest is in [8,f] — i.e. the high bit of nibble j. Byte-identical to
  * the explode → 32 conditional sums → bit-assembly formulation the
  * DuckDB oracle uses, but with no explode, no shuffle of per-gram rows,
  * and no 32-wide aggregate: the round-3 q25 plan shuffled ~260k gram
  * rows at sf0.1 to compute what is a per-document pure function.
  * Null array → null; null elements are skipped (they contribute no
  * vote), matching how the exploded formulation drops null rows.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash32"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $t")
    }

  override def nullSafeEval(arr: Any): Any =
    SimHash32.simhash(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHash32.simhash($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  /** One pass over the digest array; hex digit ≥ '8' votes +1, else −1. */
  def simhash(arr: ArrayData): Long = {
    val counts = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var j = 0
        val m = math.min(32, bytes.length)
        while (j < m) {
          val c = bytes(j)
          // md5 hex is [0-9a-f]; high nibble-bit ⟺ digit in [8,f].
          val high = (c >= '8' && c <= '9') || (c >= 'a' && c <= 'f')
          counts(j) += (if (high) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  /** Column wrapper. */
  def simhash32(digests: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(digests)))
}
