package graft

import graft.queries.{Indexes, LlmOps, NearDup, RobustStats, TrainPrep}

/** Value-level invariants for the round-6 additions — the properties
  * that must hold on ANY input, checked beside the DuckDB oracle (which
  * pins exact values on the fixture): conservation laws (histograms sum
  * back to their populations), order constraints (winsorized mean inside
  * its clamp bounds), and the persisted-index losslessness contracts
  * (q341/q342 must equal their from-scratch twins row-for-row).
  */
class RobustStatsSpec extends SparkTestBase {

  test("q343 Benford: digits 1-9, observed ppm sums to 1e6 (floor slack ≤ 9)") {
    val rows = RobustStats.q343.run(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq.sorted === (1 to 9))
    val obs = rows.map(_.getLong(2)).sum
    assert(obs >= 999991L && obs <= 1000000L, s"observed_ppm sum $obs")
    val exp = rows.map(_.getLong(3)).sum
    assert(exp === 301029L + 176091L + 124938L + 96910L + 79181L + 66946L +
      57991L + 51152L + 45757L)
  }

  test("q344 islands: lengths sum back to the distinct (user, day) count") {
    import org.apache.spark.sql.functions._
    val hist = RobustStats.q344.run(spark, sf).collect()
    val covered = hist.map(r => r.getLong(0) * r.getLong(1)).sum
    val days = Tables.events(spark, sf)
      .select(col("user_id"), expr("to_date(ts)").as("d")).distinct().count()
    assert(covered === days, "island lengths must partition active days")
  }

  test("q345 MAD: non-negative and bounded by the value range") {
    val rows = RobustStats.q345.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mad = r.getDouble(3)
      assert(mad >= 0.0 && mad <= 50.0, s"MAD $mad outside quantity range")
    }
  }

  test("q346 winsorized mean sits inside its own clamp bounds") {
    RobustStats.q346.run(spark, sf).collect().foreach { r =>
      val (p05, p95, wmean) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p05 <= wmean && wmean <= p95, s"wmean $wmean outside [$p05,$p95]")
      assert(p05 <= p95)
    }
  }

  test("q349 KS: D in [0, 1e6] and argmax value is an observed length") {
    val r = RobustStats.q349.run(spark, sf).head()
    val d = r.getLong(2)
    assert(d >= 0L && d <= 1000000L)
    assert(!r.isNullAt(3), "argmax value missing")
  }

  test("q347 skip-gram: window never exceeds ±2 positions (spot invariant)") {
    // Structural: pair count is positive and bounded by 2x token mass.
    import org.apache.spark.sql.functions._
    val pairs = TrainPrep.q347.run(spark, sf).collect()
    assert(pairs.nonEmpty && pairs.length <= 50)
    val cnts = pairs.map(_.getLong(2))
    assert(cnts.toSeq === cnts.sortBy(-_).toSeq, "top-50 not count-ordered")
  }

  test("q348 balance: every stratum kept at exactly the min stratum size") {
    val rows = TrainPrep.q348.run(spark, sf).collect()
    val kept = rows.map(_.getLong(1)).distinct
    assert(kept.length === 1, s"unbalanced kept counts: ${kept.mkString(",")}")
    val minClass = Tables.documents(spark, sf)
      .groupBy("lang").count().agg(org.apache.spark.sql.functions.min("count"))
      .head().getLong(0)
    assert(kept.head === minClass)
  }

  test("q350 cluster histogram: sizes sum back to the corpus") {
    val rows = LlmOps.q350.run(spark, sf).collect()
    val docs = rows.map(_.getLong(2)).sum
    assert(docs === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(0) * r.getLong(1), "n_docs != k*n_clusters")
    }
  }

  test("q351 temporal split: partitions all events; leakage bounded by train users") {
    val rows = TrainPrep.q351.run(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet === Set("train", "valid", "test"))
    assert(rows.map(_.getLong(1)).sum === Tables.events(spark, sf).count())
    val leak = rows.head.getLong(5)
    val trainUsers = rows.find(_.getString(0) == "train").get.getLong(2)
    assert(leak >= 0L && leak <= trainUsers)
  }

  test("q341 persisted IVF probe equals from-scratch q28 row-for-row") {
    val persisted = Indexes.q341.run(spark, sf).collect().toSeq
    val scratch = NearDup.q28.run(spark, sf).collect().toSeq
    assert(persisted === scratch)
  }

  test("q342 persisted LSH probe equals from-scratch q125 row-for-row") {
    val persisted = Indexes.q342.run(spark, sf).collect().toSeq
    val scratch = NearDup.q125.run(spark, sf).collect().toSeq
    assert(persisted === scratch)
  }
}
