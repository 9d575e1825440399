package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point query into a serialized Count-Min sketch.
  *
  * Spark ships the CMS *builder* (`count_min_sketch` aggregate → binary)
  * but no SQL-surface way to READ the sketch back — the binary is only
  * usable from driver-side Scala. This expression closes that gap:
  * `graft_cms_estimate(sketch, item)` returns the sketch's estimated
  * count for a string item, making the full sketch workflow (build per
  * partition/day → store bytes → probe at query time) expressible in a
  * plan.
  *
  * Estimates use the same item encoding as the builder (UTF8 bytes for
  * strings — `CountMinSketchAgg` adds strings via `addBinary`), so
  * probing a value that was counted returns its CMS estimate: an
  * overcount only on hash collision in every depth row, never an
  * undercount.
  *
  * Per-call cost: the sketch deserializes per evaluation. A probe runs
  * against a HANDFUL of candidate items post-aggregation (the sketch
  * side of a probe join is one row; candidates are a small exact set),
  * so eval count is |candidates|, never |input rows| — deserialization
  * is not the hot path. The eval delegates to a static helper that
  * memoizes the most recent sketch bytes per thread, so the common
  * shape (one sketch row × k probes in one task) deserializes once.
  */
case class CmsEstimate(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary, string), got ($l, $r)")
    }

  override def nullSafeEval(sketchBytes: Any, item: Any): Any =
    CmsEstimate.estimate(
      sketchBytes.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (sk, it) =>
      s"${CmsEstimate.getClass.getName.stripSuffix("$")}.estimate($sk, $it)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  // Last-deserialized sketch per thread (tasks are single-threaded):
  // k probes against one sketch row deserialize once, not k times.
  private val cache = new ThreadLocal[(Array[Byte], CountMinSketch)]

  /** Static entry shared by interpreted eval and generated code. */
  def estimate(sketchBytes: Array[Byte], item: UTF8String): Long = {
    val cached = cache.get()
    val sketch =
      if (cached != null && (cached._1 eq sketchBytes)) cached._2
      else {
        val s = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))
        cache.set((sketchBytes, s))
        s
      }
    // Strings are counted as their UTF8 bytes (CountMinSketchAgg).
    sketch.estimateCount(item.getBytes)
  }
}

object CmsProbe {
  /** Column-level CMS point query backed by [[CmsEstimate]]. */
  def cmsEstimate(sketch: Column, item: Column): Column =
    ColumnBridge.column(
      CmsEstimate(ColumnBridge.expression(sketch), ColumnBridge.expression(item)))
}
