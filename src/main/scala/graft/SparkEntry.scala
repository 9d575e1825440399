package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, Curation, DecisionSupport, EmbedTrain, Extras, GraphOps, Indexes, LlmOps, NearDup, QuerySpec, Relational, RobustStats, ScaleOps, Search, SourcesIO, SqlSurface, StreamingOps, TextMedia, TrainPrep}

/** Driver contract — see /root/repo/SURVEY.md §2.11 + §7.
  *
  * `queries` is assembled from per-module QuerySpec lists; each spec
  * carries its own DuckDB oracle SQL (or None for ops whose semantics
  * aren't portably SQL-expressible — the driver then records a weaker
  * rows-only check).
  */
object SparkEntry {
  private def specs: Seq[QuerySpec] =
    Relational.all ++ LlmOps.all ++ NearDup.all ++ TextMedia.all ++
      StreamingOps.all ++ SqlSurface.all ++ Extras.all ++ GraphOps.all ++
      TrainPrep.all ++ SourcesIO.all ++ Analytics.all ++ DecisionSupport.all ++
      ScaleOps.all ++ Search.all ++ Indexes.all ++ RobustStats.all ++
      EmbedTrain.all ++ Curation.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the TPC-H-Q1-shaped pricing aggregate — scan + filter + two-phase
    * agg — the reference pipeline's analytical core. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q06.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(sp => sp.name -> sp.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(sp => sp.oracle.map(sp.name -> _)).toMap

  /** Query name → owning module family (short labels), for the bench
    * headline's per-family subtotals: a family-level regression must be
    * visible from the captured headline alone, without the detail file
    * (round-7 ask #8 — q01–q23 is only ~5% of the suite's wall time). */
  def families: Map[String, String] = {
    val fams: Seq[(Seq[QuerySpec], String)] = Seq(
      Relational.all -> "rel", LlmOps.all -> "llm", NearDup.all -> "ndup",
      TextMedia.all -> "text", StreamingOps.all -> "strm",
      SqlSurface.all -> "sql", Extras.all -> "extra", GraphOps.all -> "graph",
      TrainPrep.all -> "prep", SourcesIO.all -> "io",
      Analytics.all -> "analyt", DecisionSupport.all -> "dss",
      ScaleOps.all -> "scale", Search.all -> "srch", Indexes.all -> "idx",
      RobustStats.all -> "robust", EmbedTrain.all -> "embed",
      Curation.all -> "cur")
    fams.flatMap { case (qs, f) => qs.map(_.name -> f) }.toMap
  }
}
