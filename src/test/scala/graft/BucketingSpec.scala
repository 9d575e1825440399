package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** The bucketed-join contract: once both sides are bucketed by the join
  * key with equal bucket counts, the equi-join plan contains NO shuffle
  * exchange — the write-time partitioning is reused — and results equal
  * the plain join's.
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed fact-fact join runs without a shuffle and matches plain join") {
    val o = Tables.orders(spark, sf)
    val l = Tables.lineitem(spark, sf)
    Bucketing.writeBucketed(o, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(
      l.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 4)

    // Disable auto-broadcast: at test scale the dim side fits under the
    // threshold and Spark would never exercise the bucket-join path that
    // matters at 100 TB, where neither fact side broadcasts.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = spark.table("lineitem_b").join(spark.table("orders_b"), "o_orderkey")
        .select(count(lit(1)).as("n"))
      q.collect() // finalize AQE so the executed plan is inspectable
      val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      // The only exchange is the global-count SinglePartition combine —
      // the join itself reuses the on-disk bucket partitioning.
      assert(!p.contains("Exchange hashpartitioning"),
        "bucketed join still shuffles:\n" + p)
      assert(q.head.getLong(0) ===
        l.join(o, l("l_orderkey") === o("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
