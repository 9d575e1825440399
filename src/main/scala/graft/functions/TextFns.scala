package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the dedup / fingerprint / language-ID operators
  * (SURVEY §2.3): whitespace tokenization, word n-gram shingling, and
  * salted-md5 min-hashing. Everything is a codegen'd built-in expression
  * (split / transform / md5 / array_min) — per-row, shuffle-free, and
  * portable to the DuckDB oracle byte-for-byte (md5 hex is engine-neutral,
  * unlike xxhash64 whose seeds differ).
  */
object TextFns {
  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Word 3-gram shingles over a token array column named in `tokExpr`
    * (Spark arrays are 0-based; the oracle's 1-based form is identical). */
  def shingles3(tokExpr: String): Column =
    expr(s"transform(sequence(0, size($tokExpr)-3), i -> concat($tokExpr[i], ' ', $tokExpr[i+1], ' ', $tokExpr[i+2]))")

  /** MinHash under salt `saltExpr`: min over the shingle array of
    * md5(shingle || ':' || salt). Lexicographic min over fixed-width hex
    * == numeric min over the 128-bit hash — one draw of a uniform hash
    * family per salt. */
  def minhash(shinglesExpr: String, saltExpr: String): Column =
    expr(s"array_min(transform($shinglesExpr, x -> md5(concat(x, ':', cast($saltExpr as string)))))")
}
