package graft

import org.apache.spark.sql.functions._

import graft.queries.Analytics

/** Semantic invariants for the round-4 analytics queries — properties
  * the DuckDB hash-compare can't express (it only proves Spark and
  * DuckDB agree, not that both are right).
  */
class AnalyticsSpec extends SparkTestBase {

  test("q118: sketch-union estimate equals the exact distinct count") {
    val viaSketch = Analytics.q118.run(spark, sf)
      .select("n_regionkey", "n_segments").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey")
      .agg(countDistinct("c_mktsegment").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(viaSketch.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      // Segment universe (5) is far below coupon-mode capacity → exact.
      assert(viaSketch(k) === n, s"region $k")
    }
  }

  test("q119: SCD2 versions are contiguous and exactly one current row per user") {
    val rows = Analytics.q119.run(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val versions = rs.map(_.getLong(1)).sorted.toSeq
      assert(versions === (1L to versions.length).toSeq,
        s"user $u versions not contiguous: $versions")
      assert(rs.count(_.getBoolean(5)) === 1, s"user $u current-row count")
      // effective_to of version k == effective_from of version k+1.
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(4) === b.getString(3),
          s"user $u: run ${a.getLong(1)} not contiguous with next")
        case _ =>
      }
    }
  }

  test("q119: adjacent runs never share an event_type") {
    Analytics.q119.run(spark, sf).collect()
      .groupBy(_.getLong(0)).foreach { case (u, rs) =>
        rs.sortBy(_.getLong(1)).sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getString(2) !== b.getString(2),
              s"user $u: runs ${a.getLong(1)},${b.getLong(1)} share a type")
          case _ =>
        }
      }
  }

  test("q120: funnel stages are monotonically non-increasing") {
    val r = Analytics.q120.run(spark, sf).head()
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel not monotone: $v >= $c >= $p")
    assert(v > 0, "no users entered the funnel at sf0.001")
  }

  test("cms: probe matches exact counts, unseen item estimates 0, SQL surface works") {
    import spark.implicits._
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = Tables.events(spark, sf)
      .agg(count_min_sketch(col("event_type"), lit(0.0001d), lit(0.999d), lit(42)).as("sk"))
    sk.createOrReplaceTempView("cms_probe_sk")
    // SQL-registered expression (GraftExtensions), probed per known type
    // plus one value never added.
    val probes = (exact.keys.toSeq.sorted :+ "never_seen").map { t =>
      t -> spark.sql(
        s"SELECT graft_cms_estimate(sk, '$t') FROM cms_probe_sk").head().getLong(0)
    }.toMap
    exact.foreach { case (t, n) => assert(probes(t) === n, s"type $t") }
    assert(probes("never_seen") === 0L)
    // Null intolerance: null item or null sketch → null.
    assert(spark.sql(
      "SELECT graft_cms_estimate(sk, CAST(NULL AS STRING)) FROM cms_probe_sk")
      .head().isNullAt(0))
  }

  test("q124: clean fixture has zero orphans; doctored parents surface as orphans") {
    val clean = Analytics.q124.run(spark, sf).collect()
    assert(clean.length === 5)
    clean.foreach(r => assert(r.getLong(2) === 0L, s"edge ${r.getString(0)}"))
    // Doctor a copy: drop half the orders — lineitem->orders and
    // orders->customer edges must now disagree in opposite ways
    // (lineitem orphans appear; orders' checked count halves).
    val tmp = java.nio.file.Files.createTempDirectory("graft_ri").toString
    try {
      Seq("region", "nation", "customer", "supplier", "part", "lineitem", "events",
        "documents", "embeddings").foreach { t =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$sf/$t.parquet"),
          java.nio.file.Paths.get(s"$tmp/$t.parquet"))
      }
      Tables.orders(spark, sf).where(col("o_orderkey") % 2 === 0)
        .write.parquet(s"$tmp/orders.parquet")
      val doctored = Analytics.q124.run(spark, tmp).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(doctored("lineitem->orders")._2 > 0L, "expected lineitem orphans")
      assert(doctored("customer->nation")._2 === 0L)
    } finally graft.Fs.deleteTree(tmp)
  }

  test("q125: incremental dedup only attributes batch docs to corpus docs") {
    val rows = graft.queries.NearDup.q125.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 4 === 0, "output must be batch docs only")
      if (!r.isNullAt(2)) {
        assert(r.getBoolean(1))
        assert(r.getLong(2) % 4 !== 0, "dup_of must point into the corpus")
      } else assert(!r.getBoolean(1))
    }
  }

  test("q134: PIT join matches every purchase to exactly one validity interval") {
    val rows = Analytics.q134.run(spark, sf).collect()
    val nPurchases = Tables.events(spark, sf)
      .where(col("event_type") === "purchase").count()
    assert(rows.length.toLong === nPurchases,
      "intervals must partition each user's timeline (no gaps, no overlaps)")
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
  }

  test("q121: interpolated values lie between their bracketing neighbors") {
    val rows = Analytics.q121.run(spark, sf).collect()
    // Walk in hour order; for each interpolated (observed=false) row with
    // a value, it must lie within [min, max] of nearest observed values.
    val vals = rows.map(r =>
      (r.getString(0), r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    vals.zipWithIndex.filter { case ((_, obs, fill), _) => !obs && fill.isDefined }
      .foreach { case ((h, _, Some(fill)), i) =>
        val prev = vals.take(i).reverse.collectFirst { case (_, true, Some(v)) => v }
        val next = vals.drop(i + 1).collectFirst { case (_, true, Some(v)) => v }
        (prev, next) match {
          case (Some(a), Some(b)) =>
            val (lo, hi) = (math.min(a, b), math.max(a, b))
            assert(fill >= lo - 1e-6 && fill <= hi + 1e-6,
              s"hour $h: $fill outside [$lo, $hi]")
          case _ => fail(s"hour $h interpolated without both neighbors")
        }
      case _ =>
      }
  }

  test("q285: attribution credit is conserved — exactly 1e6 ppm per converted purchase") {
    import spark.implicits._
    val total = Analytics.q285.run(spark, sf).collect()
      .map(_.getLong(2)).sum
    // Independently count purchases with >= 1 click/view touch in the
    // trailing 7 days; each must have distributed exactly 1,000,000 ppm.
    val ev = Tables.events(spark, sf)
    val conv = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("conv_id"), $"user_id", $"ts".as("conv_ts"))
    val touch = ev.filter($"event_type".isin("click", "view"))
      .select($"user_id", $"ts".as("touch_ts"))
    val converted = conv.join(touch, Seq("user_id"))
      .filter($"touch_ts" < $"conv_ts" &&
        $"touch_ts" >= $"conv_ts" - org.apache.spark.sql.functions.expr("INTERVAL 7 DAYS"))
      .select($"conv_id").distinct().count()
    assert(total === converted * 1000000L,
      s"credit leaked: $total ppm vs $converted conversions")
  }
}
