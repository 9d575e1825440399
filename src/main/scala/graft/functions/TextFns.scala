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
    * (Spark arrays are 0-based; the oracle's 1-based form is identical).
    * Under 3 tokens → empty array: a bare sequence(0, size-3) would go
    * DESCENDING for size < 3 (Spark sequence semantics) and emit
    * null-concat garbage shingles for any caller that forgets the
    * size filter. */
  def shingles3(tokExpr: String): Column =
    expr(s"""IF(size($tokExpr) < 3, cast(array() as array<string>),
            |transform(sequence(0, size($tokExpr)-3),
            |  i -> concat($tokExpr[i], ' ', $tokExpr[i+1], ' ', $tokExpr[i+2])))""".stripMargin)

  /** One salted md5 pass over a shingle array: 32 hex chars per shingle.
    * Two salts give 2×128 = 256 digest bits per shingle, which
    * [[chunkMin]] splits into eight independent 32-bit hash functions —
    * 2 md5 evaluations per shingle instead of one per hash function
    * (md5 dominated the round-2 q24 profile at 8 salted passes). Backed
    * by the [[ArrayMd5]] expression: one compiled loop per row instead
    * of an interpreted per-element transform lambda. */
  def saltedHashes(shinglesExpr: String, salt: Int): Column =
    ArrayMd5.arrayMd5(expr(shinglesExpr), lit(s":$salt"))

  /** 32-bit minhash: min over chunk `chunkExpr` (0-based, 8 hex chars) of
    * each digest in a [[saltedHashes]] array. Disjoint digest chunks are
    * independent uniform hashes; lexicographic min over fixed-width hex
    * == numeric min. */
  def chunkMin(hashArrExpr: String, chunkExpr: String): Column =
    expr(s"array_min(transform($hashArrExpr, x -> substring(x, 1 + 8*($chunkExpr), 8)))")
}
