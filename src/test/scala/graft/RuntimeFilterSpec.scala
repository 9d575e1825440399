package graft

import org.apache.spark.sql.functions._

import graft.operators.RuntimeFilter

/** Contract of the bloom runtime filter (q190's operator): no false
  * negatives ever, fpp in the advertised ballpark, the prefiltered
  * exact join equal to the plain join, and the probe present in the
  * optimized plan as an ordinary Filter (pushdown-eligible).
  */
class RuntimeFilterSpec extends SparkTestBase {

  test("prefilter never drops a true match and bounds false positives") {
    import spark.implicits._
    val dim = (0L until 500L).map(_ * 7L).toDF("k")          // multiples of 7
    val probe = (0L until 10000L).toDF("p")
    val kept = RuntimeFilter.prefilter(probe, "p", dim, "k",
      expectedItems = 500, fpp = 0.01).as[Long].collect().toSet
    val truth = (0L until 10000L).filter(v => v % 7 == 0 && v / 7 < 500).toSet
    assert(truth.subsetOf(kept), "bloom dropped a true match (false negative)")
    // ~9500 non-members probed at fpp=0.01 → expect ≲ ~200 survivors even
    // with generous slack; a broken bloom (all-true) would keep all 10000.
    assert(kept.size - truth.size <= 500,
      s"false-positive volume implausible: ${kept.size - truth.size}")
  }

  test("prefiltered exact join equals the plain join") {
    import spark.implicits._
    val dim = (0L until 300L).map(i => (i * 3L, s"d$i")).toDF("k", "tag")
    val probe = (0L until 2000L).map(i => (i, i % 5)).toDF("p", "grp")
    val plain = probe.join(dim, $"p" === $"k")
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"k").as("s"))
      .orderBy($"grp").collect()
    val pre = RuntimeFilter.prefilter(probe, "p", dim, "k", expectedItems = 300)
      .join(dim, $"p" === $"k")
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"k").as("s"))
      .orderBy($"grp").collect()
    assert(pre.toSeq === plain.toSeq)
  }

  test("probe appears as a plan Filter with the codegen'd expression") {
    import spark.implicits._
    // A parquet-backed probe: over a LocalRelation the optimizer simply
    // EVALUATES the bloom at plan time (ConvertToLocalRelation), which is
    // its own kind of proof but not the plan shape q190 relies on.
    val dim = (0L until 100L).toDF("k")
    val probe = Tables.lineitem(spark, sf).select($"l_orderkey".as("p"))
    val plan = RuntimeFilter.prefilter(probe, "p", dim, "k", expectedItems = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_might_contain"),
      s"expected bloom probe in executed plan:\n$plan")
  }
}
