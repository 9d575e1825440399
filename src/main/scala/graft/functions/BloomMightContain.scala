package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd bloom-filter membership probe over a LONG key column —
  * the runtime-filter primitive behind [[graft.operators.RuntimeFilter]].
  *
  * The expression carries the SERIALIZED filter (the compact bitset
  * `spark.util.sketch.BloomFilter.writeTo` emits) so it ships to
  * executors once inside the serialized plan, exactly like a broadcast
  * variable but scoped to the expression tree; each executor
  * deserializes lazily on first use (`@transient lazy val`) and the
  * generated code probes the SAME deserialized instance via a codegen
  * reference object — no per-row deserialization, no UDF boxing, the
  * probe is two hash multiplications and a couple of bitset reads
  * inside WholeStageCodegen.
  *
  * Why not an `isin` literal list: a 10M-key small side is far beyond
  * both `isin`'s expression-size limit and broadcast-hash-join
  * thresholds, but its 1%-fpp bloom is ~12 MB — small enough to ship in
  * the plan and cut the big side BEFORE its shuffle. False positives
  * only let extra rows through (the downstream exact join removes
  * them); false negatives are impossible, so the rewrite is
  * semantics-preserving by construction.
  */
case class BloomMightContain(child: Expression, bfBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key, got $t")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bfBytes))

  override def nullSafeEval(k: Any): Any =
    bloom.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, k => s"${ev.value} = $bloomRef.mightContainLong($k);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
