package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Throwaway stage-timing probe for the r12 optimization round.
  * NOT part of the contract — deleted before the round closes.
  */
object ProbeOpt {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try Relational.q06.run(spark, sfDir).count()
    catch { case scala.util.control.NonFatal(_) => () }

    val which = sys.env.getOrElse("PROBE", "louvain")
    which match {
      case "louvain" =>
        val edges = time("tradeEdges build+persist") {
          val e = GraphOps.tradeEdges(spark, sfDir)
            .persist(StorageLevel.MEMORY_AND_DISK)
          e.count(); e
        }
        val gw = time("basketPairCounts(sup>=8) persist") {
          val g = GraphOps.basketPairCounts(edges).filter($"sup" >= 8)
            .persist(StorageLevel.MEMORY_AND_DISK)
          g.count(); g
        }
        println(s"[probe] gw edges = ${gw.count()}")
        val p1 = time("louvainRoundsWeighted(4)") {
          val p = GraphOps.louvainRoundsWeighted(gw, 4); noop(p); p
        }
        val lbl = time("louvainTwoLevelLabels(2) full") {
          val l = GraphOps.louvainTwoLevelLabels(gw, 2); noop(l); l
        }
        time("modularityCensusWeighted(two-level)") {
          noop(GraphOps.modularityCensusWeighted(gw, lbl))
        }
        time("splitByComponents(p1)") {
          val mb = GraphOps.maybeBroadcast(p1.count())
          noop(GraphOps.splitByComponents(gw, p1, mb))
        }
        time("q507 end-to-end") {
          noop(graft.SparkEntry.queries("q507_louvain_two_level")(spark, sfDir))
        }
        time("q509 end-to-end") {
          noop(graft.SparkEntry.queries("q509_leiden_two_level")(spark, sfDir))
        }
      case "kmeans" =>
        val long = time("long build+persist") {
          val l = graft.Tables.fanOut(graft.Tables.embeddings(spark, sfDir), col("vec_id"))
            .select($"vec_id", posexplode($"embedding").as(Seq("dim", "xf")))
            .select($"vec_id", $"dim", $"xf".cast("double").as("x"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          println(s"rows=${l.count()}"); l
        }
        val evens = long.filter($"vec_id" % 2 === 0)
        val init = graft.Tables.embeddings(spark, sfDir).filter($"vec_id" % 2 === 0)
          .select($"vec_id", ($"vec_id" % 4).as("cid"))
        def meansOf(pts: DataFrame, assign: DataFrame) =
          pts.join(assign, Seq("vec_id"))
            .groupBy($"cid", $"dim")
            .agg((Det.dsum($"x", 6) / count($"x")).as("c"))
        val m1 = time("meansOf(evens, init)") {
          val m = meansOf(evens, init).localCheckpoint(); m.count(); m }
        val a1 = time("kmeansAssign(evens, m1)") {
          val a = TrainPrep.kmeansAssign(evens, m1).localCheckpoint(); a.count(); a }
        time("kmeansAssign again (warm)") {
          noop(TrainPrep.kmeansAssign(evens, m1))
        }
        time("q501 end-to-end") {
          noop(graft.SparkEntry.queries("q501_incremental_kmeans_update")(spark, sfDir))
        }
      case "proj" =>
        // Interleaved A/B of the projection cap: window row_number vs
        // bounded bottom-k, same JVM, alternating — robust to ambient
        // load drift.
        import org.apache.spark.sql.expressions.Window
        val edges = GraphOps.tradeEdges(spark, sfDir)
          .persist(StorageLevel.MEMORY_AND_DISK)
        edges.count()
        def projWindow(): Unit = {
          val capped = edges
            .withColumn("rn", row_number().over(
              Window.partitionBy($"cust").orderBy($"supp")))
            .filter($"rn" <= 16)
            .select($"cust", $"supp")
          noop(capped.groupBy($"cust")
            .agg(sort_array(collect_list($"supp")).as("ss"))
            .filter(size($"ss") >= 2)
            .select(explode(expr(
              """flatten(transform(sequence(0, size(ss)-2),
                |  i -> transform(sequence(i+1, size(ss)-1),
                |    j -> struct(ss[i] AS u, ss[j] AS v))))""".stripMargin)).as("p"))
            .groupBy($"p.u".as("u"), $"p.v".as("v"))
            .agg(count(lit(1)).as("sup"))
            .filter($"sup" >= 8))
        }
        def projBottomK(): Unit =
          noop(GraphOps.basketPairCounts(edges).filter($"sup" >= 8))
        def projUdaf(): Unit = {
          val bottom16 = udaf(graft.functions.BottomKLong(16))
          noop(edges.groupBy($"cust")
            .agg(bottom16($"supp").as("ss"))
            .filter(size($"ss") >= 2)
            .select(explode(expr(
              """flatten(transform(sequence(0, size(ss)-2),
                |  i -> transform(sequence(i+1, size(ss)-1),
                |    j -> struct(ss[i] AS u, ss[j] AS v))))""".stripMargin)).as("p"))
            .groupBy($"p.u".as("u"), $"p.v".as("v"))
            .agg(count(lit(1)).as("sup"))
            .filter($"sup" >= 8))
        }
        for (i <- 1 to 6) {
          time(s"window    #$i") { projWindow() }
          time(s"udaf      #$i") { projUdaf() }
          time(s"native    #$i") { projBottomK() }
        }
        edges.unpersist()
      case "chunk" =>
        for (i <- 1 to 4) {
          time(s"chunkstore 32-part #$i") {
            graft.streaming.StreamChunkStore.runOnce(spark, sfDir).count()
          }
          time(s"chunkstore  8-part #$i") {
            graft.Confs.withShufflePartitions(spark, 8) {
              graft.streaming.StreamChunkStore.runOnce(spark, sfDir).count()
            }
          }
        }
        for (i <- 1 to 2) {
          time(s"q480 32-part #$i") {
            noop(graft.SparkEntry.queries("q480_stream_lsh_cdc_delete")(spark, sfDir))
          }
          time(s"q480  8-part #$i") {
            graft.Confs.withShufflePartitions(spark, 8) {
              noop(graft.SparkEntry.queries("q480_stream_lsh_cdc_delete")(spark, sfDir))
            }
          }
        }
      case "wedge" =>
        val edges0 = GraphOps.tradeEdges(spark, sfDir)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val g = GraphOps.coPurchaseEdges(edges0)
          .persist(StorageLevel.MEMORY_AND_DISK)
        println(s"[probe] |E| = ${g.count()}")
        def current(): Unit = noop(GraphOps.edgeSupport(g))
        def hinted(): Unit = {
          val deg = g.select($"u".as("n")).unionAll(g.select($"v".as("n")))
            .groupBy($"n").agg(count(lit(1)).as("deg"))
          val du = struct($"du", $"u")
          val dv = struct($"dv", $"v")
          val or = g
            .join(broadcast(deg.select($"n".as("u"), $"deg".as("du"))), Seq("u"))
            .join(broadcast(deg.select($"n".as("v"), $"deg".as("dv"))), Seq("v"))
            .select(when(du < dv, $"u").otherwise($"v").as("lo"),
              when(du < dv, $"v").otherwise($"u").as("hi"))
            .localCheckpoint()
          val tri = or.as("e1")
            .join(broadcast(or.select($"lo".as("hi"), $"hi".as("z"))).as("e2"), Seq("hi"))
            .select($"lo".as("x"), $"hi".as("y"), $"z")
            .join(broadcast(or.select($"lo".as("x"), $"hi".as("z"))), Seq("x", "z"), "left_semi")
          val cn = tri.select(explode(array(
              struct(least($"x", $"y").as("u"), greatest($"x", $"y").as("v")),
              struct(least($"y", $"z").as("u"), greatest($"y", $"z").as("v")),
              struct(least($"x", $"z").as("u"), greatest($"x", $"z").as("v")))).as("e"))
            .select($"e.u", $"e.v")
            .groupBy($"u", $"v").agg(count(lit(1)).as("cn"))
          noop(g.join(cn, Seq("u", "v"), "left").na.fill(0L, Seq("cn")))
          or.unpersist(blocking = false)
        }
        for (i <- 1 to 4) {
          time(s"edgeSupport current #$i") { current() }
          time(s"edgeSupport hinted  #$i") { hinted() }
        }
        g.unpersist(); edges0.unpersist()
      case "louvab" =>
        // Interleaved A/B of the 4-sweep weighted Louvain loop on the
        // real sf projection: OLD window sweeps + join probe vs the
        // optimized loop.
        import org.apache.spark.sql.expressions.Window
        val edges0 = GraphOps.tradeEdges(spark, sfDir)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val gw = GraphOps.basketPairCounts(edges0).filter($"sup" >= 8)
          .persist(StorageLevel.MEMORY_AND_DISK)
        gw.count()
        def oldRounds(): Unit = {
          val wTot = {
            val cell = gw.agg(sum($"sup")).head
            if (cell.isNullAt(0)) 0L else cell.getLong(0)
          }
          val bi = gw.select($"u".as("src"), $"v".as("dst"), $"sup".as("w"))
            .unionAll(gw.select($"v".as("src"), $"u".as("dst"), $"sup".as("w")))
            .localCheckpoint()
          val str = bi.groupBy($"src".as("n")).agg(sum($"w").as("kn"))
            .localCheckpoint()
          val mb = GraphOps.maybeBroadcast(str.count())
          def sweep(com: DataFrame, r: Int): DataFrame = {
            val w = Window.partitionBy($"n").orderBy($"score".desc, $"com")
            val tot = com.join(mb(str), Seq("n")).groupBy($"com")
              .agg(sum($"kn").as("tot"))
            val knc = bi.join(mb(com.select($"n".as("src"), $"com")), Seq("src"))
              .groupBy($"dst", $"com").agg(sum($"w").as("k"))
              .select($"dst".as("n"), $"com", $"k")
            val cand = knc
              .unionByName(com.select($"n", $"com").withColumn("k", lit(0L)))
              .groupBy($"n", $"com").agg(max($"k").as("k"))
            val moved = cand
              .filter(pmod($"n", lit(2)) === lit(r % 2))
              .join(mb(str), Seq("n"))
              .join(mb(tot), Seq("com"))
              .join(mb(com.select($"n", $"com".as("cur"))), Seq("n"))
              .withColumn("score",
                expr(s"CAST(2 * ${wTot}L AS DECIMAL(20,0)) * k" +
                  " - CAST(tot - CASE WHEN com = cur THEN kn ELSE 0L END AS DECIMAL(20,0)) * kn"))
              .withColumn("rn", row_number().over(w))
              .filter($"rn" === 1)
              .select($"n", $"com")
            com.filter(pmod($"n", lit(2)) =!= lit(r % 2)).select($"n", $"com")
              .unionByName(moved)
          }
          var com = str.select($"n", $"n".as("com")).localCheckpoint()
          var quiet = 0
          var r = 1
          while (r <= 4 && quiet < 2) {
            val prev = com
            com = sweep(prev, r).localCheckpoint()
            if (r < 4) {
              val movedAny = !com
                .join(prev.select($"n", $"com".as("prev_com")), Seq("n"))
                .filter($"com" =!= $"prev_com").isEmpty
              quiet = if (movedAny) 0 else quiet + 1
            }
            prev.unpersist(blocking = false)
            r += 1
          }
          noop(com)
          com.unpersist(blocking = false)
          bi.unpersist(blocking = false)
          str.unpersist(blocking = false)
        }
        def newRounds(): Unit = {
          val out = GraphOps.louvainRoundsWeighted(gw, 4)
          noop(out)
          out.unpersist(blocking = false)
        }
        for (i <- 1 to 5) {
          time(s"old 4-sweep loop #$i") { oldRounds() }
          time(s"new 4-sweep loop #$i") { newRounds() }
          time(s"new loop 8-part  #$i") {
            graft.Confs.withShufflePartitions(spark, 8) { newRounds() }
          }
        }
        gw.unpersist(); edges0.unpersist()
      case "fixture" =>
        import org.apache.spark.sql.expressions.Window
        val g = Seq((1L, 2L, 3L), (1L, 3L, 3L), (1L, 4L, 3L), (2L, 3L, 3L),
          (2L, 4L, 3L), (3L, 4L, 3L), (5L, 6L, 2L), (5L, 7L, 2L))
          .toDF("u", "v", "sup")
        val wTot = 22L
        val bi = g.select($"u".as("src"), $"v".as("dst"), $"sup".as("w"))
          .unionAll(g.select($"v".as("src"), $"u".as("dst"), $"sup".as("w")))
          .localCheckpoint()
        val str = bi.groupBy($"src".as("n")).agg(sum($"w").as("kn"))
          .localCheckpoint()
        val com0 = str.select($"n", $"n".as("com")).localCheckpoint()
        val mb = GraphOps.maybeBroadcast(7)
        // OLD window sweep, inline:
        def oldSweep(com: DataFrame, r: Int): DataFrame = {
          val w = Window.partitionBy($"n").orderBy($"score".desc, $"com")
          val tot = com.join(mb(str), Seq("n")).groupBy($"com")
            .agg(sum($"kn").as("tot"))
          val knc = bi.join(mb(com.select($"n".as("src"), $"com")), Seq("src"))
            .groupBy($"dst", $"com").agg(sum($"w").as("k"))
            .select($"dst".as("n"), $"com", $"k")
          val cand = knc
            .unionByName(com.select($"n", $"com").withColumn("k", lit(0L)))
            .groupBy($"n", $"com").agg(max($"k").as("k"))
          val moved = cand
            .filter(pmod($"n", lit(2)) === lit(r % 2))
            .join(mb(str), Seq("n"))
            .join(mb(tot), Seq("com"))
            .join(mb(com.select($"n", $"com".as("cur"))), Seq("n"))
            .withColumn("score",
              expr(s"CAST(2 * ${wTot}L AS DECIMAL(20,0)) * k" +
                " - CAST(tot - CASE WHEN com = cur THEN kn ELSE 0L END AS DECIMAL(20,0)) * kn"))
            .withColumn("rn", row_number().over(w))
            .filter($"rn" === 1)
            .select($"n", $"com")
          com.filter(pmod($"n", lit(2)) =!= lit(r % 2)).select($"n", $"com")
            .unionByName(moved)
        }
        var oc = com0
        var nc = com0
        for (r <- 1 to 4) {
          oc = oldSweep(oc, r).localCheckpoint()
          nc = GraphOps.louvainSweepWeighted(bi, str, nc, wTot, r, mb)
            .localCheckpoint()
          println(s"[probe] sweep $r old: " + oc.orderBy($"n").collect().map(x => (x.getLong(0), x.getLong(1))).mkString(" "))
          println(s"[probe] sweep $r new: " + nc.select($"n", $"com").orderBy($"n").collect().map(x => (x.getLong(0), x.getLong(1))).mkString(" "))
        }
      case "tail" =>
        // Where does a trivial query's ~0.5 s go? Run a few cheap ones
        // twice and a raw scan for comparison.
        for (n <- Seq("q01_scan_project_lit", "q02_count_global", "q05_filter_predicates",
            "q06_pricing_agg", "q11_window_rank")) {
          val fn = graft.SparkEntry.queries(n)
          time(s"$n cold") { noop(fn(spark, sfDir)) }
          time(s"$n warm") { noop(fn(spark, sfDir)) }
        }
        time("raw lineitem noop scan") {
          noop(spark.read.parquet(s"$sfDir/lineitem.parquet"))
        }
        time("raw lineitem noop scan again") {
          noop(spark.read.parquet(s"$sfDir/lineitem.parquet"))
        }
      case other =>
        // Time any single query end-to-end, twice.
        val fn = graft.SparkEntry.queries.collectFirst {
          case (n, f) if n.startsWith(other) => (n, f)
        }.get
        time(s"${fn._1} cold") { noop(fn._2(spark, sfDir)) }
        time(s"${fn._1} warm") { noop(fn._2(spark, sfDir)) }
    }
    spark.stop()
  }
}
