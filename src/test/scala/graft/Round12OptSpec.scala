package graft

import org.apache.spark.sql.functions._

/** Focused tests for the r12 OPTIMIZATION round's operator-internal
  * rewrites — each asserts the optimized form equals the reference
  * form it replaced, on data that exercises the rewrite's risk:
  * partial/merge paths, duplicates, ties, hub skew.
  */
class Round12OptSpec extends SparkTestBase {

  test("BottomKLongAgg ≡ sorted-prefix of collect_list across partial/merge paths") {
    import spark.implicits._
    // 40 groups × up to 400 members incl. DUPLICATE values, spread
    // over 7 input partitions so partial buffers really merge; one hub
    // group (g = 0) with 4000 rows exercises the bounded buffer.
    val df = spark.range(0, 20000)
      .select((when($"id" % 5 === 0, 0L).otherwise($"id" % 40)).as("g"),
        (($"id" * 2654435761L) % 997L).as("v"))
      .repartition(7)
    val got = df.groupBy($"g")
      .agg(graft.functions.BottomKLongAgg.bottomKLong($"v", 16).as("bk"))
    val want = df.groupBy($"g")
      .agg(slice(sort_array(collect_list($"v")), 1, 16).as("bk"))
    val joined = got.as("a").join(want.as("b"), Seq("g"))
      .filter(expr("a.bk <> b.bk"))
    assert(joined.isEmpty,
      "bottom-k disagrees with sorted collect_list prefix: " +
        joined.limit(3).collect().mkString(", "))
  }

  test("BottomKLongAgg: groups under k keep every element; empty-ish groups survive") {
    import spark.implicits._
    val df = Seq((1L, 5L), (1L, 3L), (2L, 9L)).toDF("g", "v").repartition(3)
    val rows = df.groupBy($"g")
      .agg(graft.functions.BottomKLongAgg.bottomKLong($"v", 16).as("bk"))
      .orderBy($"g").collect()
    assert(rows(0).getSeq[Long](1) == Seq(3L, 5L))
    assert(rows(1).getSeq[Long](1) == Seq(9L))
  }

  test("basketPairCounts (bottom-k cap) ≡ the window rn<=16 reference form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Includes a hub customer with 60 suppliers (cap must bite) and
    // many small baskets.
    val edges = spark.range(0, 3000)
      .select((when($"id" % 3 === 0, 7L).otherwise($"id" % 211)).as("cust"),
        (($"id" * 131L) % 397L).as("supp"))
      .distinct()
    val got = graft.queries.GraphOps.basketPairCounts(edges)
    val capped = edges
      .withColumn("rn", row_number().over(
        Window.partitionBy($"cust").orderBy($"supp")))
      .filter($"rn" <= 16)
      .select($"cust", $"supp")
    val want = capped.groupBy($"cust")
      .agg(sort_array(collect_list($"supp")).as("ss"))
      .filter(size($"ss") >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ss)-2),
          |  i -> transform(sequence(i+1, size(ss)-1),
          |    j -> struct(ss[i] AS u, ss[j] AS v))))""".stripMargin)).as("p"))
      .groupBy($"p.u".as("u"), $"p.v".as("v"))
      .agg(count(lit(1)).as("sup"))
    assert(got.as("a").join(want.as("b"), Seq("u", "v"), "full_outer")
      .filter(expr("a.sup IS DISTINCT FROM b.sup")).isEmpty,
      "bottom-k projection disagrees with the window reference")
  }

  test("louvain argmax-as-aggregate \u2261 the window argmax, sweep by sweep (ties included)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // A 4-clique {1,2,3,4} (every sweep is an all-ways tie \u2014 the
    // smallest-community order decides every move) plus the {5,6,7}
    // equal-weight star (node 5's candidates tie at equal score).
    // Reference = the pre-r12 WINDOW sweep, inlined verbatim; the
    // optimized sweep must reproduce its labels after EVERY round.
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
    val mb = graft.queries.GraphOps.maybeBroadcast(7)
    def refSweep(com: org.apache.spark.sql.DataFrame, r: Int) = {
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
    var ref = com0
    var opt = com0
    for (r <- 1 to 4) {
      ref = refSweep(ref, r).localCheckpoint()
      opt = graft.queries.GraphOps.louvainSweepWeighted(bi, str, opt, wTot, r, mb)
        .localCheckpoint()
      val diff = opt.select($"n", $"com".as("ca"))
        .join(ref.select($"n", $"com".as("cb")), Seq("n"))
        .filter($"ca" =!= $"cb")
      assert(diff.isEmpty, s"sweep $r diverged: " +
        diff.collect().mkString(", "))
    }
  }

  test("q126/q378 long-surrogate keying decodes to the exact string ids") {
    import spark.implicits._
    // The bijection and its renderer: 2·cust → "c:<cust>", 2·supp+1 →
    // "s:<supp>" — including multi-digit keys whose STRING order
    // differs from numeric order ("c:10" < "c:2"), which is why the
    // decode happens BEFORE the final orderBy.
    val ids = Seq(2L * 1, 2L * 10, 2L * 2, 2L * 7 + 1, 2L * 10 + 1).toDF("node")
    val dec = ids.select(concat(
        when(pmod($"node", lit(2)) === 0, lit("c:")).otherwise(lit("s:")),
        expr("node div 2").cast("string")).as("node"))
      .orderBy($"node").collect().map(_.getString(0))
    assert(dec.toSeq == Seq("c:1", "c:10", "c:2", "s:10", "s:7"), dec.mkString(","))
  }
}
