package graft

import org.apache.spark.sql.SparkSession

/** Scoped session-conf overrides shared by every component that sizes a
  * bounded stage's shuffles to its FRAME volume rather than the session
  * default (streaming state stores, iterative driver loops over
  * pair-list-sized frames). One copy of the save/set/restore idiom —
  * the restore must run on every exit path or the session default leaks
  * into unrelated queries.
  */
object Confs {
  /** Run `f` with `spark.sql.shuffle.partitions` pinned to `n`,
    * restoring the prior value after. Placement-only: results must not
    * depend on the partition count — callers pin it purely to trade
    * empty-partition task overhead against parallelism for a stage
    * whose volume they know. */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, old)
  }
}
