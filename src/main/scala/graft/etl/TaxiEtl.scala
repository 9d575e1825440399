package graft.etl

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's single executable program, re-expressed as a callable
  * pipeline (/root/reference/workflow-examples/pyspark-taxi-trip.py:37-51):
  * read parquet → append a timestamp column → count (the job's lifecycle
  * log line) → repartition(2) → parquet overwrite. q01/q04 verify the
  * individual operator semantics; this is the end-to-end write path —
  * the one job a reference user actually ships — as one function.
  *
  * The reference stamps driver wall-clock (`lit(datetime.now())`); the
  * timestamp is a parameter here so runs are reproducible (SURVEY §7.4).
  * Scale: the write inherits whatever parallelism the plan has until the
  * explicit repartition; `nOut` is the reference's hardcoded 2 — at
  * 100 TB you size it to target file sizes instead (or drop it and let
  * AQE coalesce), which is why it's a parameter and not a constant.
  */
object TaxiEtl {
  def run(
      spark: SparkSession,
      sfDir: String,
      outPath: String,
      ts: String = "2022-01-01 00:00:00",
      nOut: Int = 2): Long = {
    val df = Tables.lineitem(spark, sfDir)
      .withColumn("current_ts", to_timestamp(lit(ts)))
    val n = df.count()
    df.repartition(nOut).write.mode(SaveMode.Overwrite).parquet(outPath)
    n
  }
}
