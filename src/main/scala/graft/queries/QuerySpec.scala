package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One verifiable query: a Spark implementation plus (optionally) the
  * equivalent DuckDB SQL the driver's oracle runs on the same parquet
  * tables. `oracle = None` → the driver records a weaker rows-only check
  * (used for ops whose hash functions aren't portable to DuckDB).
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

/** Materialize a (small, already-aggregated) result on the driver and
  * sever it from persisted/temp state — THE idiom every scratch-staging
  * query ends with, so its `finally` can drop tables, unpersist frames,
  * and delete tmp trees before the DataFrame is returned. One named
  * helper instead of N hand-rolled collect/createDataFrame pairs. */
object Eager {
  def apply(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
  }
}

/** Determinism helpers for the DuckDB hash-compare gate (SURVEY §7.4).
  *
  * Floating-point sums are order-dependent, and Spark's shuffle order is
  * not DuckDB's scan order — so every money/avg aggregate goes through an
  * exact DECIMAL accumulator (order-independent, bit-exact on both
  * engines) and is cast back to DOUBLE at the end. Per-row double→decimal
  * conversion rounds identically on both sides (correct rounding of the
  * same binary value), so the whole pipeline is engine-independent.
  *
  * Scale note: `sum(CAST(x AS DECIMAL))` is still a partial+final
  * hash aggregate — map-side combine works, no extra shuffle; DECIMAL adds
  * ~2× per-value cost over double-sum, acceptable for deterministic
  * verification and irrelevant to shuffle volume at 100 TB.
  */
object Det {
  /** Order-independent exact sum of a double expression, as double. */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)

  /** Order-independent avg: exact sum divided by count (identical IEEE
    * division on both engines given identical operands). */
  def davg(c: Column, scale: Int): Column =
    dsum(c, scale) / count(lit(1))

  /** DuckDB mirror of [[dsum]]. The final decimal→double conversion is
    * routed through VARCHAR: DuckDB's direct DECIMAL→DOUBLE cast
    * divides the int128 payload by 10^scale in floating point — TWO
    * roundings, up to 1 ulp off (≈4e-6 at 3e10, caught by the round-6
    * sf1 sweep on q06) — while Spark's BigDecimal.doubleValue() rounds
    * once, correctly. Exact digits → string → correctly-rounded parse
    * matches Spark bit-for-bit. The per-row double→decimal cast needs
    * no such detour (verified identical over 573 k rows at sf1).
    * STRING, not VARCHAR: some queries (q231) run this same SQL through
    * spark.sql() too, where bare VARCHAR needs a length — STRING is the
    * alias both dialects accept. */
  def sqlDsum(expr: String, scale: Int): String =
    s"CAST(CAST(sum(CAST($expr AS DECIMAL(30,$scale))) AS STRING) AS DOUBLE)"

  /** DuckDB mirror of [[davg]]. */
  def sqlDavg(expr: String, scale: Int): String =
    s"(${sqlDsum(expr, scale)} / count(*))"

  /** Timestamp-at-midnight → 'yyyy-MM-dd' string (tz/precision-proof). */
  def dstr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  // ---- DuckDB mirrors of graft.functions.VectorOps -------------------
  // Spark's `aggregate(xs, 0.0, _+_)` is a sequential left fold seeded
  // with 0.0. `list_reduce` folds left from the first element, so we
  // prepend the 0.0 seed — making the DuckDB sum bit-identical to
  // Spark's (same IEEE additions of the same operands in the same
  // order), which keeps round(·, n) stable at rounding boundaries.

  /** Sequential left-fold sum of a DuckDB DOUBLE[] expression. */
  def sqlFoldSum(listExpr: String): String =
    s"list_reduce(list_prepend(0.0, $listExpr), (acc, x) -> acc + x)"

  /** DuckDB mirror of VectorOps.dot (inputs must be DOUBLE[] exprs). */
  def sqlDot(a: String, b: String): String =
    sqlFoldSum(s"list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])")

  /** DuckDB mirror of VectorOps.normSq. */
  def sqlNormSq(v: String): String =
    sqlFoldSum(s"list_transform($v, x -> x * x)")

  /** DuckDB mirror of VectorOps.l2Norm. */
  def sqlL2Norm(v: String): String = s"sqrt(${sqlNormSq(v)})"

  /** DuckDB mirror of VectorOps.cosine. */
  def sqlCosine(a: String, b: String): String =
    s"(${sqlDot(a, b)} / (${sqlL2Norm(a)} * ${sqlL2Norm(b)}))"
}
