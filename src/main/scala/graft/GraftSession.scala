package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: every entry point (Verify, Bench, tests)
  * builds its session here so the engine's semantics and tuning are
  * identical everywhere a query runs.
  *
  * Notable knobs:
  *  - `shuffle.partitions` sized to the local core count (the driver's
  *    local[32] stand-in for a cluster); at real scale this is AQE's
  *    initial partition number, not a hard setting.
  *  - `nanosAsLong`: the driver's events.parquet carries
  *    TIMESTAMP(NANOS), which Spark 4 otherwise rejects (Tables.events
  *    re-derives a microsecond timestamp).
  *  - `InferFiltersFromGenerate` is excluded: for every explode it
  *    injects `size(arr) > 0 AND isnotnull(arr)` filters that duplicate
  *    the generator input expression. Our dedup/text operators explode
  *    arrays COMPUTED in the same stage (shingles, token lists), so the
  *    inferred filter re-evaluates the expensive array expression twice
  *    per row — and predicate pushdown then drags it below the fan-out
  *    repartition onto the unparallelized scan split (observed: q26's
  *    explode stage 9.1 s → 0.5 s at sf0.1). The filters can never prune
  *    parquet I/O here because the arrays don't exist in storage.
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    Confs.withS3aProfile(
      SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.optimizer.excludedRules",
          "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        .config("spark.sql.extensions", "graft.functions.GraftExtensions"))
}
