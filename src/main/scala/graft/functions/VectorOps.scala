package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns, backed by
  * the codegen'd [[DotProduct]] expression (ArrayMath.scala) — a tight
  * generated loop over ArrayData, no UDF boxing, no per-row allocation.
  * (The earlier `zip_with`+`aggregate` formulation was semantically
  * identical but interpreted — higher-order lambdas don't codegen — and
  * dominated pairwise-similarity benchmarks.)
  *
  * Accumulation is a sequential left fold in DOUBLE. The DuckDB oracles
  * mirror it exactly with `list_reduce(list_prepend(0.0, …))`
  * (graft.queries.Det.sqlDot/sqlNormSq) — same IEEE additions of the same
  * operands in the same order — so rounded comparisons are bit-stable.
  *
  * Scale note: all per-row expressions — embarrassingly parallel, no
  * shuffle; dimension is bounded (64 here), so cost is O(rows × dim).
  */
object VectorOps {
  /** Cast to array<double> for stable accumulation. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product of two equal-length numeric arrays, in double. */
  def dot(a: Column, b: Column): Column =
    ArrayMath.dotCodegen(asDouble(a), asDouble(b))

  /** Squared L2 norm (dot(v,v): the same x*x products folded in the same
    * order as the previous transform-based formulation — bit-identical). */
  def normSq(v: Column): Column = {
    val dv = asDouble(v)
    ArrayMath.dotCodegen(dv, dv)
  }

  /** L2 norm. */
  def l2Norm(v: Column): Column = sqrt(normSq(v))

  /** Cosine similarity: dot / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))
}
