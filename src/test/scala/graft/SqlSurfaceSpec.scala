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
    // Synthesize a second data dir from the fixture itself (every table
    // copied, customer doubled) rather than assuming another testdata
    // scale factor exists on this host — and assert only INEQUALITY of
    // counts, the one property registration must preserve.
    val sf2 = java.nio.file.Files.createTempDirectory("graft_sqlsurface").toString
    try {
      Seq("region", "nation", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings", "events").foreach { t =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$sf/$t.parquet"),
          java.nio.file.Paths.get(s"$sf2/$t.parquet"))
      }
      val c = spark.read.parquet(s"$sf/customer.parquet")
      c.unionAll(c).coalesce(1).write.parquet(s"$sf2/customer.tmp")
      val written = java.nio.file.Files.list(java.nio.file.Paths.get(s"$sf2/customer.tmp"))
      val dataFile =
        try written.filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst.get
        finally written.close()
      java.nio.file.Files.copy(dataFile, java.nio.file.Paths.get(s"$sf2/customer.parquet"))

      // Different dir → views must repoint, not serve stale data.
      SqlSurface.registerViews(spark, sf2)
      val n2 = spark.sql("SELECT count(*) FROM customer").head.getLong(0)
      assert(n2 !== n1, s"views still serve the old dir ($n1 vs $n2)")
      // And back again (exercises the memo-update path, not just first set).
      SqlSurface.registerViews(spark, sf)
      assert(spark.sql("SELECT count(*) FROM customer").head.getLong(0) === n1)
    } finally graft.Fs.deleteTree(sf2)
  }
}
