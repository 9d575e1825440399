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
  def withShufflePartitions[T](spark: SparkSession, n: Int)(f: => T): T =
    withConf(spark, "spark.sql.shuffle.partitions", n.toString)(f)

  /** Run `f` with one session conf pinned, restoring the prior value
    * (or unsetting, if it had none) after — every exit path. */
  def withConf[T](spark: SparkSession, key: String, value: String)(f: => T): T = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try f finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
