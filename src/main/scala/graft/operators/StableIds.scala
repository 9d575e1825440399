package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense global row numbering over an arbitrary total order — the
  * scalable replacement for the two classic anti-patterns:
  * `row_number() OVER (ORDER BY ...)` with no partition key (Spark
  * funnels every row through ONE task) and `monotonically_increasing_id`
  * (dense in neither value nor order, unstable across repartitions).
  *
  * Construction: range-repartition on the sort key (each partition owns
  * a contiguous key range), sort within partitions, count rows per
  * partition (a count-only aggregate — key bytes never shuffle twice),
  * prefix-sum the counts into per-partition offsets (numPartitions-sized
  * — a driver-scale frame), broadcast the offsets back, and add the
  * within-partition row_number. Every step is distributed except the
  * prefix sum over ≤ numPartitions rows.
  *
  * The assigned ids depend ONLY on the total order (offsets compensate
  * for wherever the range boundaries land), so the result is stable
  * across runs, cluster sizes, and partition counts — the property
  * checkpointed training pipelines need from a row id. The sort key
  * must be a total order (include a unique tiebreaker column).
  */
object StableIds {

  /** Append a dense 0-based `row_id` ordered by `sortCols`. */
  def withGlobalRowIds(df: DataFrame, numParts: Int, sortCols: Column*): DataFrame = {
    val parted = df
      .repartitionByRange(numParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
    // numParts rows — the single-partition window is driver-scale by
    // construction, not a data-volume sort.
    val offsets = counts.select(col("__pid"),
      coalesce(sum(col("__n")).over(
        Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).as("__off"))
    parted
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("row_id",
        row_number().over(Window.partitionBy(col("__pid")).orderBy(sortCols: _*))
          .cast("long") - 1L + col("__off"))
      .drop("__pid", "__off")
  }
}
