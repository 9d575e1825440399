package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Anchor-drift bisection probe (round-11 verdict ask #6: the q01–q23
  * idle-host subtotal drifted 18.33 → 18.89 → 20.91 s over r1/r10/r11;
  * the anchor queries are registry-independent, so the suspects are
  * per-run fixed costs — 508-spec registry construction, session conf,
  * first-scan footer reads). This main times the 23 anchor queries
  * under the EXACT artifact methodology (fresh JVM, warm-up q06,
  * per-query clearCache, noop sink, cold+warm) in two registry modes:
  *
  *  - `--full-registry`: resolve the anchors through
  *    `SparkEntry.queries`, which class-initializes all 18 query
  *    modules (508 QuerySpecs, every oracle string) — what Bench does;
  *  - default (minimal): touch ONLY the two modules that own q01–q23
  *    (Relational + LlmOps) — the round-1 world, when those 23 were
  *    the whole contract.
  *
  * If the two modes' subtotals match, the registry is innocent and the
  * drift is in-session (conf growth, first-scan costs, JIT churn); if
  * full-registry is slower, the +2 s is registry-construction fallout
  * (classload/metaspace/heap) and the registry build time printed
  * separately says how much is one-time. Throwaway diagnostic — keep
  * out of Bench's path. */
object ProbeAnchor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val full = args.contains("--full-registry")
    val t0 = System.nanoTime()
    val anchors: Seq[(String, (SparkSession, String) => DataFrame)] =
      if (full) {
        val m = SparkEntry.queries
        m.keys.toSeq.sorted
          .filter { n =>
            val s = n.takeWhile(_ != '_')
            s.length == 3 && s.drop(1).forall(_.isDigit) && s.drop(1).toInt <= 23
          }
          .map(n => n -> m(n))
      } else {
        (graft.queries.Relational.all ++ graft.queries.LlmOps.all)
          .filter { q =>
            val s = q.name.takeWhile(_ != '_')
            s.length == 3 && s.drop(1).forall(_.isDigit) && s.drop(1).toInt <= 23
          }
          .sortBy(_.name).map(q => q.name -> q.run)
      }
    val regSecs = (System.nanoTime() - t0) / 1e9
    require(anchors.size == 23, s"expected 23 anchors, got ${anchors.size}")
    try graft.queries.Relational.q06.run(spark, sfDir).count()
    catch { case scala.util.control.NonFatal(_) => () }
    def time(fn: (SparkSession, String) => DataFrame): Double = {
      spark.catalog.clearCache()
      val t = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t) / 1e9
    }
    val cold = anchors.map { case (n, fn) => n -> time(fn) }
    val warm = anchors.map { case (n, fn) => n -> time(fn) }
    def r3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = cold.map { case (n, v) =>
      "\"" + n.takeWhile(_ != '_') + "\":" + r3(v) }.mkString("{", ",", "}")
    println(s"""{"mode":"${if (full) "full" else "minimal"}","registry_secs":${r3(regSecs)},"anchor_cold":${r3(cold.map(_._2).sum)},"anchor_warm":${r3(warm.map(_._2).sum)},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
