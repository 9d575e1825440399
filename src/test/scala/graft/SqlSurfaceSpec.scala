package graft

import graft.queries.SqlSurface

/** The SQL entry point's catalog contract: views resolve, SQL text runs,
  * and the per-session memoization NEVER pins views to a stale data dir
  * — switching sfDir in the same session must re-register.
  */
class SqlSurfaceSpec extends SparkTestBase {

  test("registered views serve SQL text") {
    SqlSurface.registerViews(spark, sf)
    assert(spark.sql("SELECT count(*) AS n FROM lineitem").head.getLong(0) > 0L)
    assert(spark.catalog.tableExists("events"))
  }

  test("switching data dirs re-registers; same dir is memoized") {
    SqlSurface.registerViews(spark, sf)
    val n1 = spark.sql("SELECT count(*) FROM customer").head.getLong(0)
    // Different dir → views must repoint, not serve stale data.
    val sf2 = "/root/testdata/sf0.01"
    SqlSurface.registerViews(spark, sf2)
    val n2 = spark.sql("SELECT count(*) FROM customer").head.getLong(0)
    assert(n2 > n1, s"views still serve the old dir ($n1 vs $n2)")
    // And back again (exercises the memo-update path, not just first set).
    SqlSurface.registerViews(spark, sf)
    assert(spark.sql("SELECT count(*) FROM customer").head.getLong(0) === n1)
  }
}
