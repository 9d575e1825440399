package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `array_md5(arr, suffix)` ≡ `transform(arr, x -> md5(concat(x, suffix)))`
  * as one compiled loop per row.
  *
  * The transform/md5 formulation pays interpreted lambda dispatch plus a
  * fresh digest + UTF8String boxing per ELEMENT; on shingle-hashing
  * workloads (q24 minhash: ~50 shingles × 2 salts × every document;
  * q32 winnowing: ~1000 char-grams per document) that dominated the
  * round-3 profile. Here the whole array is hashed inside one
  * `md5Array` call per row — one reused MessageDigest, byte-level
  * concat, no per-element closure frames. Both the interpreted and
  * generated paths call the same loop, so eval parity is structural.
  *
  * Portability contract unchanged: output elements are exactly
  * `md5(x || suffix)` lowercase hex, byte-for-byte what the DuckDB
  * oracles compute. Null arrays yield null; null elements yield null
  * elements (as transform does).
  */
case class ArrayMd5(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType,
    containsNull = left.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_array_md5"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, string), got ($l, $r)")
    }

  override def nullSafeEval(arr: Any, suffix: Any): Any =
    ArrayMd5.md5Array(arr.asInstanceOf[ArrayData], suffix.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, s) =>
      s"graft.functions.ArrayMd5.md5Array($a, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayMd5 =
    copy(left = newLeft, right = newRight)
}

object ArrayMd5 {
  private val hexDigits = "0123456789abcdef".toCharArray

  /** One loop, one digest instance, hex identical to Spark's md5(). */
  def md5Array(arr: ArrayData, suffix: UTF8String): GenericArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val sfx = suffix.getBytes
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        md.update(sfx)
        val dig = md.digest()
        val hex = new Array[Char](32)
        var j = 0
        while (j < 16) {
          hex(2 * j) = hexDigits((dig(j) >> 4) & 0xf)
          hex(2 * j + 1) = hexDigits(dig(j) & 0xf)
          j += 1
        }
        out(i) = UTF8String.fromString(new String(hex))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper. */
  def arrayMd5(arr: Column, suffix: Column): Column =
    ColumnBridge.column(
      ArrayMd5(ColumnBridge.expression(arr), ColumnBridge.expression(suffix)))
}
