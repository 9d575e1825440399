package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.BloomMightContain

/** Bloom runtime filter for joins whose small side is too big to
  * broadcast-hash but whose KEY SET blooms small (SURVEY §4's shuffle
  * budget applied to the mid-size-dimension join).
  *
  * The economics at 100 TB: a sort-merge join shuffles BOTH sides in
  * full. When the probe side joins a dimension of ~10M keys — beyond
  * `autoBroadcastJoinThreshold`, so Spark picks SMJ — most probe rows
  * frequently match nothing and are shuffled only to be dropped by the
  * join. Building the dimension's key bloom (distributed treeAggregate;
  * the driver holds only the final ~12 MB bitset at 1% fpp) and
  * prefiltering the probe side BEFORE its Exchange removes ~99% of the
  * dead rows from the shuffle. This is precisely the rewrite Spark's own
  * AQE runtime filtering performs internally; expressed here as an
  * explicit operator it applies to any plan shape, is visible in
  * `.explain`, and its filter participates in ordinary predicate
  * pushdown (the probe can reach the scan when the key is a top-level
  * column).
  *
  * Correctness is unconditional: blooms admit false positives only, and
  * the caller keeps the exact join downstream, so extra survivors are
  * removed there; no true match is ever dropped.
  */
object RuntimeFilter {

  /** The serialized key bloom of `keyCol` (must be bigint-typed). */
  def keyBloom(dim: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = dim.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** A Column probing `key` against a serialized bloom. */
  def mightContain(key: Column, bfBytes: Array[Byte]): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), bfBytes))

  /** `probe` reduced to rows whose `probeKey` might match a key of
    * `dim.dimKey` — run the exact join on the result. */
  def prefilter(probe: DataFrame, probeKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame =
    probe.filter(mightContain(probe(probeKey), keyBloom(dim, dimKey, expectedItems, fpp)))
}
