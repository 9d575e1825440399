package graft

import java.nio.file.Files
import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.queries.{Analytics, RobustStats, ScaleOps, TextMedia}

/** Degenerate-input guards for the q417–q428 additions. QueriesSpec pins
  * determinism and atomic schemas on real testdata; these pin the edges
  * no sampled corpus reaches: q419's zero-rank-variance NULL branch,
  * q424's unseen-state (test-only event type) left-join path, q425's
  * zero-σ z-scores on an all-identical corpus, and q427's single-hot-key
  * reading against the TARGET partition mean.
  */
class Round7cEdgeSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q419: zero rank variance yields NULL rho, not NaN or a cast error") {
    val dir = tmpDir("graft_q419_edge")
    // Every customer: exactly one order at the same price -> one joint
    // cell -> both marginal variances are 0 -> the nullif guard fires.
    spark.createDataFrame((1L to 16L).map(i =>
        (i, i, "O", 100.0, Timestamp.valueOf("1996-01-01 00:00:00"), "1-URGENT")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/orders.parquet")
    val r = RobustStats.q419.run(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_customers") === 16L)
    assert(r(0).isNullAt(r(0).fieldIndex("rho_milli")))
  }

  test("q424: a test-only event type predicts NULL and scores zero, never crashes") {
    val dir = tmpDir("graft_q424_edge")
    // Pick user ids on each side of the md5 split boundary the query
    // itself uses (first two hex of md5(user_id) < "cd" -> train).
    val trainUid = (1L to 200L).find(u => md5hex(u.toString).take(2) < "cd").get
    val testUid = (1L to 200L).find(u => md5hex(u.toString).take(2) >= "cd").get
    def ev(id: Long, uid: Long, t: String, sec: Int) =
      (id, Timestamp.valueOf(f"1996-01-01 00:00:$sec%02d"), uid, t, 1.0, "{}")
    // Train user: a->b, b->a. Test user: a->b (model predicts b: correct)
    // and zz->a where 'zz' never appears as a train state.
    spark.createDataFrame(Seq(
        ev(1, trainUid, "a", 1), ev(2, trainUid, "b", 2), ev(3, trainUid, "a", 3),
        ev(4, testUid, "a", 1), ev(5, testUid, "b", 2),
        ev(6, testUid, "zz", 3), ev(7, testUid, "a", 4)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/events.parquet")
    val rows = Analytics.q424.run(spark, dir).collect()
      .map(r => r.getAs[String]("cur") -> r).toMap
    val a = rows("a")
    assert(a.getAs[String]("predicted") === "b")
    assert(a.getAs[Long]("n_correct") === 1L)
    val zz = rows("zz")
    assert(zz.isNullAt(zz.fieldIndex("predicted")))
    assert(zz.getAs[Long]("n_correct") === 0L)
    assert(zz.getAs[Long]("acc_ppm") === 0L)
  }

  test("q425: an all-identical corpus yields NULL deltas via the zero-sigma guard") {
    val dir = tmpDir("graft_q425_edge")
    spark.createDataFrame((1L to 30L).map(i =>
        (i, "same words every time", "en", s"src${i % 3}", 20L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    val rows = TextMedia.q425.run(spark, dir).collect()
    assert(rows.length === 3) // 3 sources -> 3 pairs, emitted not crashed
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("delta_micro")),
        "zero-variance shares must yield NULL delta, not NaN-derived 0")
    }
  }

  test("q429: a single-source corpus yields NULL F (k-1 = 0 guard), not an error") {
    val dir = tmpDir("graft_q429_edge")
    spark.createDataFrame((1L to 20L).map(i =>
        (i, s"doc number $i content", "en", "only_src", 100L + i)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    val r = RobustStats.q429.run(spark, dir).collect()(0)
    assert(r.getAs[Long]("k") === 1L)
    assert(r.isNullAt(r.fieldIndex("f_milli")))
  }

  test("q455: a histogram too narrow for a second mode returns the null row, not a crash") {
    val dir = tmpDir("graft_q455_edge")
    // All lengths inside one 32-char bin -> no bin >= 3 away -> m2 empty.
    spark.createDataFrame((1L to 20L).map(i =>
        (i, "x", "en", "src", 40L + (i % 8))))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    val rows = RobustStats.q455.run(spark, dir).collect()
    assert(rows.length === 1)
    assert(rows(0).isNullAt(rows(0).fieldIndex("valley_min")))
  }

  test("q427: a single hot key reads 32e6 ppm against the target mean") {
    val dir = tmpDir("graft_q427_edge")
    spark.createDataFrame((1 to 64).map(i =>
        (7L, 1L, 1L, i, 1.0, 100.0, 0.0, 0.0, "N", "O",
          Timestamp.valueOf("1996-01-01 00:00:00"))))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/lineitem.parquet")
    val r = ScaleOps.q427.run(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_nonempty_partitions") === 1L)
    assert(r.getAs[Long]("max_rows") === 64L)
    assert(r.getAs[Long]("mean_rows") === 2L)   // 64 div 32 target
    assert(r.getAs[Long]("imbalance_ppm") === 32000000L)
    assert(r.getAs[Long]("n_skewed") === 1L)
  }
}
