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
    // Pressure instrumentation (round-6: BENCH_r05 recorded 3–12× swings
    // on unchanged code, adjudicated as shared-heap pressure): per-query
    // GC time is measured alongside wall time, so a pressure-inflated
    // number is VISIBLE in the artifact instead of indistinguishable
    // from a plan regression. Between queries the cache is cleared —
    // one query's leaked persisted block must never tax the next one's
    // measurement.
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def run(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean, Double) = {
      spark.catalog.clearCache()
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case scala.util.control.NonFatal(_) => errors += name; false }
      ((System.nanoTime() - t0) / 1e9, ok, (gcMillis() - g0) / 1e3)
    }
    // Optional subset (comma-separated name prefixes, same contract as
    // Verify's third arg) — e.g. SPARK_GRAFT_QUERIES=q24,q59 for the
    // scale-curve smoke. Unset = the full contract (driver mode).
    val prefixes = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def selected(name: String): Boolean =
      prefixes.forall(_.exists(name.startsWith))
    // Execution ORDER is part of the methodology: the q01–q23 anchor set
    // runs FIRST, on the freshest possible JVM — exactly the conditions
    // the round-1 anchor was recorded under, when those 23 were the whole
    // contract. Plain lexicographic order had drifted q14 to AFTER the
    // q103/q126/q138 heavies as the contract grew past 300 queries, so
    // the anchor subtotal silently absorbed 340 queries of accumulated
    // JVM state (BENCH_r05's 12.98 s q14 vs the 0.17 s anchor). Everything
    // after the anchors stays in name order for reproducibility.
    def anchorFirst(name: String): (Int, String) = {
      val short = name.takeWhile(_ != '_')
      (if (short.length == 3 && short.drop(1).forall(_.isDigit)
           && short.drop(1).toInt <= 23) 0 else 1, name)
    }
    val results = SparkEntry.queries.toSeq.sortBy(r => anchorFirst(r._1))
        .filter(r => selected(r._1)).map { case (name, fn) =>
      val (cold, okCold, gcCold) = run(name, fn)
      val (warm, okWarm, gcWarm) = run(name, fn)
      (name, cold, warm, okCold, okWarm, gcCold, gcWarm)
    }
    def jmap(sel: Seq[(String, Double)]): String =
      sel.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val good = results.filter(r => r._4 && r._5)
    val qs = jmap(good.map(r => r._1 -> r._2))
    val qw = jmap(good.map(r => r._1 -> r._3))
    val qg = jmap(good.map(r => r._1 -> r._6))
    // Time of the run that actually FAILED (the cold one if both did) —
    // not the other run's duration, which would misdirect diagnosis.
    val failedSecs = jmap(results.filterNot(r => r._4 && r._5)
      .map(r => r._1 -> (if (!r._4) r._2 else r._3)))
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = good.map(_._2).sum
    val totalWarm = good.map(_._3).sum
    val gcCold = good.map(_._6).sum
    val gcWarm = good.map(_._7).sum
    // Full-precision detail line (full query names, cold + warm + GC
    // maps) — for local diagnosis; too long for the driver's capture
    // window.
    println(s"""{"metric":"detail","value":$total,"unit":"sec","queries":$qs,"total_warm":$totalWarm,"queries_warm":$qw,"gc_cold_secs":$qg,"errors":$errs,"failed_secs":$failedSecs,"sf":"$sfDir"}""")
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
    // gc_cold/gc_warm: total seconds the JVM spent in GC inside the
    // cold/warm measurement windows — the headline's pressure gauge. A
    // high total with low GC is real plan cost; a high total with
    // comparable GC is heap pressure, not a regression.
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qsShort,"omitted":$omitted,"total_warm":${r3(totalWarm)},"gc_cold":${r3(gcCold)},"gc_warm":${r3(gcWarm)},"errors":$errsBudgeted,"errors_omitted":$errsOmitted,"sf":"$sfDir"}""")
    spark.stop()
  }
}
