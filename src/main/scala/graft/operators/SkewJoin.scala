package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins (SURVEY §4; driver
  * mandate: "salting for skew").
  *
  * AQE's skew-join optimization already splits oversized sort-merge
  * partitions at runtime, so REACH FOR THIS ONLY when AQE can't help:
  * a shuffled hash join you must keep (AQE skew handling targets SMJ),
  * a deterministic pre-partitioned write, or a key so hot a single
  * partition exceeds executor memory before AQE sees sizes.
  *
  * Shape: the large/skewed side gains a salt in [0, salts); the small
  * side is replicated `salts`× with every salt value; the join key
  * becomes (key, salt). One hot key's probe rows now spread over
  * `salts` reducers instead of one. Replication multiplies the small
  * side's shuffle volume by `salts` — size it as (hot-key rows ÷
  * target-partition rows), not "big".
  *
  * The salt derives from the row's POSITION (monotonically_increasing_id
  * → round-robin over `salts`), not from row content: a content hash
  * would send fully identical duplicate rows — the classic hot-key shape
  * in dedup/event pipelines, exactly what this operator exists for — all
  * to ONE salt, silently degrading the spread to a no-op while the small
  * side still pays the `salts`× replication. Position-based salting
  * spreads even bit-identical duplicates.
  *
  * RETRY SAFETY: when the large side sits directly above a shuffle, a
  * partition's row ORDER depends on nondeterministic fetch order, so a
  * positional id alone could assign different salts on a stage retry —
  * already-finished reducers of the (key, salt) shuffle would then hold
  * old-epoch rows while recomputed ones use new-epoch salts, silently
  * dropping or duplicating join rows. The fix is the same one Spark
  * itself applies to round-robin repartition (SPARK-23207): impose a
  * deterministic in-partition order (local sort over the row's hashable
  * columns) BEFORE assigning positions. A retried task recomputes the
  * same partition CONTENT (hash-partitioned shuffle output is
  * content-deterministic), sorts it into the same order, and therefore
  * reproduces the same salts. Identical duplicate rows sort adjacent
  * and still spread round-robin over the salt range.
  */
object SkewJoin {

  val SaltCol = "__graft_salt"

  /** Position-derived salt in [0, salts) — see class doc. Exposed for
    * SkewJoinSpec. */
  private[graft] def saltExpr(salts: Int) =
    pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int")

  /** Inner/left-semi-style equi-join of a skewed `large` side against a
    * `small` side on `key`, salted `salts` ways. Returns columns of both
    * inputs (the salt is dropped). */
  def saltedEquiJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // Right/full outer would emit each unmatched small-side row once PER
    // SALT REPLICA — silently wrong. Large-side-preserving types are fine
    // (each large row carries exactly one salt).
    val allowed = Set("inner", "cross", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "leftanti", "left_anti")
    require(allowed.contains(joinType.toLowerCase(java.util.Locale.ROOT).replace(" ", "")),
      s"saltedEquiJoin supports inner/left-side join types, got '$joinType' " +
        "(outer-preserving the replicated side would duplicate its unmatched rows)")
    require(!large.columns.contains(SaltCol) && !small.columns.contains(SaltCol),
      s"inputs must not already carry a $SaltCol column")
    // Deterministic in-partition order first (retry safety — class doc).
    // MapType columns aren't orderable and are exceedingly rare on a
    // join's large side; order by the sortable prefix.
    val sortable = large.schema.fields
      .filterNot(f => f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toIndexedSeq
    val ordered =
      if (sortable.nonEmpty) large.sortWithinPartitions(sortable: _*) else large
    val l = ordered.withColumn(SaltCol, saltExpr(salts))
    val r = small
      .withColumn(SaltCol, explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, SaltCol), joinType).drop(SaltCol)
  }
}
