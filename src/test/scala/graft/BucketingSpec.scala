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

  test("q359 maintained-index probe: index rows never cross a shuffle") {
    // The 100 TB contract of a persisted index: at probe time the
    // corpus-sized member table must NOT move — meta and batch shuffle
    // TO the index's on-disk bucketing, never the reverse. Pinned by
    // walking the physical plan: the bucketed members scan may not
    // appear inside any ShuffleExchange subtree. Broadcast and AQE are
    // disabled for the capture — at test scale Spark would broadcast
    // the tiny index and never exercise the shape that matters.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions.size
    import graft.queries.{Indexes, NearDup}
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_lshm_spec").toString
    val tbl = "graft_lshm_spec_tbl"
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      val docs = Tables.documents(spark, sf)
        .select($"doc_id", graft.functions.TextFns.tokens($"text").as("t"))
        .filter(size($"t") >= 3)
      Indexes.stageMaintainedLsh(spark, docs, tmp, tbl, NearDup.MaxLshBucket)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val probe = Indexes.maintainedLshProbe(spark, tbl, s"$tmp/meta",
        docs.filter($"doc_id" % 4 === 0), NearDup.MaxLshBucket)
      val plan = probe.queryExecution.executedPlan
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      def isMembersScan(p: SparkPlan) = p match {
        case f: FileSourceScanExec => f.bucketedScan
        case _ => false
      }
      // Root-first ancestor path down to the bucketed members scan.
      def pathTo(p: SparkPlan): Option[List[SparkPlan]] =
        if (isMembersScan(p)) Some(List(p))
        else p.children.view.flatMap(pathTo).headOption.map(p :: _)
      val path = pathTo(plan).getOrElse(
        fail("members scan lost its bucketed layout:\n" + plan))
      // Index rows may shuffle only AFTER their first (closest-to-root)
      // join — above it they are probe results, not index rows. Below
      // it (through the meta semi-join down to the scan) any exchange
      // means the corpus-sized side moved.
      val firstJoin = path.indexWhere(_.isInstanceOf[BaseJoinExec])
      assert(firstJoin >= 0, "probe plan lost its joins:\n" + plan)
      path.drop(firstJoin + 1).foreach { p =>
        assert(!p.isInstanceOf[ShuffleExchangeExec],
          "maintained-index rows crossed a shuffle below their join:\n" + plan)
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      graft.Fs.deleteTree(tmp)
    }
  }
}
