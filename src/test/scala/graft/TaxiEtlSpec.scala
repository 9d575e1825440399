package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.TaxiEtl

/** Round-trip contract for the Tier A ETL pipeline: write → re-read →
  * the multiset of source rows is preserved (count + key/price
  * checksums, invariant to the round-robin repartition), the literal
  * timestamp column arrives intact, and the layout contract (2 output
  * files) holds.
  */
class TaxiEtlSpec extends SparkTestBase {

  test("taxi ETL round-trip preserves the multiset and layout") {
    val out = Files.createTempDirectory("graft_taxi_etl_spec").toString + "/out"
    val n = TaxiEtl.run(spark, sf, out)
    val src = Tables.lineitem(spark, sf)
    assert(n === src.count())

    val back = spark.read.parquet(out)
    assert(back.count() === n)
    val Array(srcSum) = src
      .agg(sum("l_orderkey"), queries.Det.dsum(col("l_extendedprice"), 2)).collect()
    val Array(backSum) = back
      .agg(sum("l_orderkey"), queries.Det.dsum(col("l_extendedprice"), 2)).collect()
    assert(backSum === srcSum)
    assert(back.select(input_file_name().as("f")).distinct().count() === 2L)
    assert(back.select(date_format(col("current_ts"), "yyyy-MM-dd HH:mm:ss"))
      .distinct().head.getString(0) === "2022-01-01 00:00:00")
  }

  test("overwrite mode replaces prior output (the reference job is rerunnable)") {
    val out = Files.createTempDirectory("graft_taxi_etl_spec2").toString + "/out"
    TaxiEtl.run(spark, sf, out)
    TaxiEtl.run(spark, sf, out) // second run must not fail or double rows
    assert(spark.read.parquet(out).count() === Tables.lineitem(spark, sf).count())
  }
}
