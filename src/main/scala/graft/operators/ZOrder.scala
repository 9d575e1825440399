package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout —
  * the clustering primitive behind data skipping on TWO correlated
  * filter columns at once (Delta/Iceberg OPTIMIZE ZORDER BY; the
  * reference's Athena tier gets the same effect from sorted parquet
  * row-group min/max stats). Sorting by the interleaved key keeps rows
  * close in BOTH dimensions inside the same file/row-group, so a scan
  * filtered on either column prunes most row groups; a plain
  * lexicographic sort only prunes on the leading column.
  *
  * All operators here are codegen'd Catalyst built-ins (shifts, masks,
  * ors folded into whole-stage codegen) — the key costs a few ALU ops
  * per row, no UDF. 16 input bits per dimension (the classic
  * part1by1 spread: 8/4/2/1 shift-mask ladder) → up to 32-bit z values;
  * callers bucket their dimensions into that range first (pmod or
  * range-rank), which is also what bounds skew: equal-width buckets on
  * a heavy-tailed key need a rank pass instead of pmod.
  *
  * The SQL mirrors are generated from the SAME ladder so an external
  * engine (DuckDB here; Athena in the reference architecture) computes
  * bit-identical keys — layout decisions made by one engine remain
  * valid for every reader.
  */
object ZOrder {

  /** (shift, mask) ladder spreading 16 bits to even positions. */
  private val ladder = Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL,
    2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of `c` to even bit positions (part1by1). */
  def spread(c: Column): Column =
    ladder.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** Morton key of two ≤16-bit dimensions: a's bits even, b's odd. */
  def interleave(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** SQL-text mirror of [[spread]] (valid Spark SQL and DuckDB). */
  def spreadSql(e: String): String =
    ladder.foldLeft(s"($e & 65535)") { case (x, (s, m)) =>
      s"(($x | ($x << $s)) & $m)"
    }

  /** SQL-text mirror of [[interleave]]. */
  def interleaveSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"
}
