package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Victim-partition predicates for CDC delete rewrites.
  *
  * The delete path of the CDC index maintainers ([[StreamIvfCdc]],
  * [[StreamBm25Cdc]]) locates the exact set of leaf partitions holding
  * deleted keys, then re-reads ONLY those partitions to stage the
  * rewrite. Through round 9 that filter was built as an OR-chain of
  * per-pair conjunctions (`(a===x1 && b===y1) || (a===x2 && b===y2) ||
  * …`) — precise and partition-prunable, but a Catalyst expression TREE
  * whose depth grows linearly with victim count. At contract scale
  * (tens of victims) that is invisible; a production right-to-be-
  * forgotten sweep with 10⁴–10⁵ victim partitions makes PLANNING itself
  * the bottleneck (analysis/optimization walk the whole Or-chain per
  * rule, and the chain defeats the In/InSet fast path).
  *
  * [[pairPredicate]] is the scale-safe form: ONE `In` node over the
  * "/"-joined rendering of the two partition columns. Properties:
  *  - references only partition columns → statically partition-prunable
  *    (the scan's PartitionFilters evaluate it against the partition
  *    catalog; non-victim dirs are never listed into the read);
  *  - constant expression depth — the literal list is a flat value
  *    vector on a single node, and past
  *    `spark.sql.optimizer.inSetConversionThreshold` (default 10)
  *    Catalyst rewrites it to an O(1)-membership `InSet`;
  *  - exact pairs, never the `a IN (…) AND b IN (…)` cross product that
  *    would stage partitions the swap then discards.
  *
  * The "/" separator matches the `a=x/b=y` leaf-dir shape the swap path
  * already uses, and is unambiguous for the integral partition values
  * these indexes write (negative ids like `batch_id=-1` included —
  * integers render identically whether the partition value was
  * discovered as INT or LONG).
  */
object CdcVictims {
  /** Exact membership of `(colA, colB)` in `pairs`, partition-prunable
    * and O(1)-depth at any victim count. NULL-safe by construction:
    * plain `concat` (NOT `concat_ws`, which SKIPS null inputs and would
    * render a null `a` beside `b` as just "b" — a silent-mismatch trap)
    * propagates a null partition value to a NULL key, which `isin`
    * evaluates to null → the row never matches — the correct outcome,
    * since a victim list of concrete pairs can never name a null
    * partition. */
  def pairPredicate(colA: String, colB: String, pairs: Seq[(Long, Long)]): Column = {
    require(pairs.nonEmpty, "victim pair list must be non-empty")
    concat(col(colA).cast("string"), lit("/"), col(colB).cast("string"))
      .isin(pairs.map { case (a, b) => s"$a/$b" }: _*)
  }
}
