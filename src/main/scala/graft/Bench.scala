package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}}. The driver runs
  * this per-round at sf0.1 → BENCH_r{N}.json (BASELINE.md anchor).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen once so per-query numbers measure the engine,
    // not first-call classloading. Warms against the BENCHED data dir —
    // entry()'s fixed sf0.001 path may not exist on a foreign host, and
    // a silently failed warm-up would inflate the first query's cold time.
    try graft.queries.Relational.q06.run(spark, sfDir).count()
    catch { case scala.util.control.NonFatal(_) => () }
    // Measure via a noop sink, not count(): under a count() Catalyst may
    // eliminate final sorts and unreferenced projections (q15's
    // TakeOrderedAndProject, q01's global sort), under-measuring
    // output-side work. The noop sink consumes every row of every column.
    //
    // Each query is timed twice: cold (includes per-query Catalyst
    // analysis + whole-stage codegen compile — comparable to the prior
    // rounds' methodology, and what `value` totals) and warm (steady
    // state — the number that scales to a long-running cluster, where
    // planning amortizes to nothing against 100 TB of IO).
    // A failed query must not masquerade as a fast one: a heavy query
    // that starts failing FAST would otherwise LOWER the baseline-
    // compared total, making a regression read as an improvement. So the
    // headline "value"/"total_warm" sum ONLY successful runs; failed
    // names land in "errors" and their time-to-failure is kept separately
    // in "failed_secs" for diagnosis. An empty errors list is the
    // bench's all-green signal — and the only state where "value" is
    // comparable to prior rounds.
    val errors = scala.collection.mutable.LinkedHashSet[String]()
    def run(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case scala.util.control.NonFatal(_) => errors += name; false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // Optional subset (comma-separated name prefixes, same contract as
    // Verify's third arg) — e.g. SPARK_GRAFT_QUERIES=q24,q59 for the
    // scale-curve smoke. Unset = the full contract (driver mode).
    val prefixes = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def selected(name: String): Boolean =
      prefixes.forall(_.exists(name.startsWith))
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(r => selected(r._1)).map { case (name, fn) =>
      val (cold, okCold) = run(name, fn)
      val (warm, okWarm) = run(name, fn)
      (name, cold, warm, okCold, okWarm)
    }
    def jmap(sel: Seq[(String, Double)]): String =
      sel.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val good = results.filter(r => r._4 && r._5)
    val qs = jmap(good.map(r => r._1 -> r._2))
    val qw = jmap(good.map(r => r._1 -> r._3))
    // Time of the run that actually FAILED (the cold one if both did) —
    // not the other run's duration, which would misdirect diagnosis.
    val failedSecs = jmap(results.filterNot(r => r._4 && r._5)
      .map(r => r._1 -> (if (!r._4) r._2 else r._3)))
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = good.map(_._2).sum
    val totalWarm = good.map(_._3).sum
    // Full-precision detail line (full query names, cold + warm maps) —
    // for local diagnosis; too long for the driver's capture window.
    println(s"""{"metric":"detail","value":$total,"unit":"sec","queries":$qs,"total_warm":$totalWarm,"queries_warm":$qw,"errors":$errs,"failed_secs":$failedSecs,"sf":"$sfDir"}""")
    // Final line is the one the driver parses, and it only keeps the LAST
    // ~2000 chars of output (BENCH_r03.json's tail cut the r3 line mid-key
    // → parsed:null). So the headline line must stay compact: per-query
    // keys are the unique qNN prefix (q01_scan_project_lit → "q01"; scheme
    // documented in BASELINE.md), values rounded to ms — AND the map is
    // budgeted: past ~170 queries even the short form outgrows the
    // window, so the line keeps the SLOWEST entries that fit in ~1.4 KB
    // and counts the rest in "omitted" (their times are still in the
    // detail line and inside the totals). A head-truncated line parses
    // as nothing; a truncated MAP still parses as a valid benchmark.
    def short(name: String): String = name.takeWhile(_ != '_')
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // The q01–q23 anchor set (BASELINE.md's band is recomputed from the
    // captured line) is kept unconditionally and first — a sub-median
    // anchor query must never fall into "omitted" or the captured file
    // can't reproduce the anchor subtotal. Everything else packs
    // slowest-first into what remains of the budget.
    val anchorKeys = (1 to 23).map(i => f"q$i%02d").toSet
    val (anchor, rest) = good.partition(r => anchorKeys(short(r._1)))
    val ordered = (anchor.sortBy(-_._2) ++ rest.sortBy(-_._2))
      .map(r => "\"" + short(r._1) + "\":" + r3(r._2))
    // The errors array shares the same ~2 KB capture window as the map:
    // budget it too (a mass failure would otherwise head-truncate the
    // line exactly when the error signal matters), and shrink the map
    // budget by whatever the errors actually used.
    val errKept = scala.collection.mutable.ListBuffer[String]()
    var errUsed = 0
    errors.foreach { e =>
      val q = "\"" + e + "\""
      if (errUsed + q.length + 1 <= 400) { errKept += q; errUsed += q.length + 1 }
    }
    val errsBudgeted = errKept.mkString("[", ",", "]")
    val errsOmitted = errors.size - errKept.length
    val budget = math.max(0, 1400 - errsBudgeted.length)
    val kept = scala.collection.mutable.ListBuffer[String]()
    var used = 0
    ordered.foreach { e =>
      if (used + e.length + 1 <= budget) { kept += e; used += e.length + 1 }
    }
    val omitted = ordered.length - kept.length
    val qsShort = kept.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qsShort,"omitted":$omitted,"total_warm":${r3(totalWarm)},"errors":$errsBudgeted,"errors_omitted":$errsOmitted,"sf":"$sfDir"}""")
    spark.stop()
  }
}
