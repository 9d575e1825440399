package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Hive-style partitioned layout + partition pruning: writing the fact
  * table partitioned by ship year and filtering on the partition column
  * must prune at PLANNING time (PartitionFilters on the scan, only the
  * matching directories listed) — the difference between reading one
  * year and reading 100 TB.
  */
class PartitionPruningSpec extends SparkTestBase {

  private lazy val dir: String = {
    val out = Files.createTempDirectory("graft_part").toString + "/lineitem_by_year"
    Tables.lineitem(spark, sf)
      .withColumn("ship_year", year(col("l_shipdate")))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("ship_year")
      .parquet(out)
    out
  }

  test("partition filter prunes directories at planning time") {
    val q = spark.read.parquet(dir).filter(col("ship_year") === 1996)
    val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("ship_year"), p)
    // The pruned scan must agree with the unpartitioned predicate.
    val expected = Tables.lineitem(spark, sf)
      .filter(year(col("l_shipdate")) === 1996).count()
    assert(q.count() === expected)
  }

  test("partitioned round-trip preserves the full multiset") {
    val back = spark.read.parquet(dir)
    assert(back.count() === Tables.lineitem(spark, sf).count())
    val Array(a) = back.agg(sum("l_orderkey")).collect()
    val Array(b) = Tables.lineitem(spark, sf).agg(sum("l_orderkey")).collect()
    assert(a === b)
  }
}
