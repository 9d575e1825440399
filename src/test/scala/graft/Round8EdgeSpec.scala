package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.queries.{DecisionSupport, GraphOps, Indexes, NearDup, RobustStats, TextMedia}

/** Degenerate-input and file-level guards for the round-8 additions and
  * the q433–q461 band the round-7 verdict flagged as comment-only:
  * the fairness trio's one-class nullif guards (q458–q460), q454's
  * 16-supplier cap actually excluding capped-out items from the model,
  * q461's boundary classes, q463's pair-census exhaustion, q464's
  * planted-repeat coverage, q467's over-cap bucket resurrection, and
  * deleteFromIvf's untouched-partition file identity.
  */
class Round8EdgeSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** documents fixture rows: (doc_id, text, lang, source, n_chars). */
  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String, String, Long)]): Unit =
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")

  private def words(n: Int, prefix: String = "w"): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("q458: a perfectly-classified source pins gap 0; a failing one flags review") {
    val dir = tmpDir("graft_q458_edge")
    // s1: 4 docs, truth=T (n_chars>=300) and pred=T (>=55 words) — all
    // correct. s2: 4 docs where pred is always wrong (long text, small
    // n_chars and vice versa) — accuracy 0.
    writeDocs(dir,
      (1L to 4L).map(i => (i, words(60), "en", "s1", 400L)) ++
      (5L to 6L).map(i => (i, words(60), "en", "s2", 100L)) ++
      (7L to 8L).map(i => (i, words(10), "en", "s2", 400L)))
    val rows = RobustStats.q458.run(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("s1").getAs[Long]("gap_ppm") === 0L)
    assert(rows("s1").getAs[Boolean]("review_flag") === false)
    assert(rows("s2").getAs[Long]("acc_ppm") === 0L)
    assert(rows("s2").getAs[Long]("gap_ppm") === 1000000L)
    assert(rows("s2").getAs[Boolean]("review_flag") === true)
  }

  test("q459: zero selections everywhere -> NULL impact ratios via nullif, not /0") {
    val dir = tmpDir("graft_q459_edge")
    // Every text under 55 words -> pred false for all docs in all groups
    // -> best_sel_ppm = 0 -> the nullif(best,0) guard must fire.
    writeDocs(dir,
      (1L to 3L).map(i => (i, words(10), "en", "s1", 400L)) ++
      (4L to 6L).map(i => (i, words(12), "en", "s2", 100L)))
    val rows = RobustStats.q459.run(spark, dir).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("sel_ppm") === 0L)
      assert(r.isNullAt(r.fieldIndex("impact_ratio_ppm")), r.toString)
      assert(r.isNullAt(r.fieldIndex("adverse_impact")), r.toString)
    }
  }

  test("q460: an all-positive group yields NULL FPR; an all-one-class corpus yields NULL pooled rates") {
    val dir = tmpDir("graft_q460_edge")
    // s1: all truth=T (no negatives -> FPR undefined); s2 mixed so the
    // pooled rates exist and s1's TPR gap is still computable.
    writeDocs(dir,
      (1L to 4L).map(i => (i, words(60), "en", "s1", 400L)) ++
      Seq((5L, words(60), "en", "s2", 400L), (6L, words(10), "en", "s2", 100L)))
    val rows = RobustStats.q460.run(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val s1 = rows("s1")
    assert(s1.getAs[Long]("tpr_ppm") === 1000000L)
    assert(s1.isNullAt(s1.fieldIndex("fpr_ppm")), s1.toString)
    assert(s1.isNullAt(s1.fieldIndex("fpr_gap_ppm")), s1.toString)
    // greatest() skips the NULL fpr gap — the violation verdict still lands.
    assert(!s1.isNullAt(s1.fieldIndex("odds_violation")), s1.toString)

    // Whole corpus one class: pooled FPR is NULL too — emitted, no crash.
    val dir2 = tmpDir("graft_q460_edge2")
    writeDocs(dir2, (1L to 6L).map(i =>
      (i, words(60), "en", s"s${i % 2}", 400L)))
    val rows2 = RobustStats.q460.run(spark, dir2).collect()
    assert(rows2.length === 2)
    rows2.foreach(r => assert(r.isNullAt(r.fieldIndex("fpr_gap_ppm")), r.toString))
  }

  test("q454: suppliers capped out of a 30-item basket never enter the model") {
    val dir = tmpDir("graft_q454_edge")
    // cust 1 buys suppliers 1..30 (cap keeps 1..16); custs 2..4 each buy
    // {15, 50}, making (15,50) the strongest co-pair.
    val orders =
      (1L to 30L).map(k => (k, 1L)) ++
      Seq((31L, 2L), (32L, 2L), (33L, 3L), (34L, 3L), (35L, 4L), (36L, 4L))
    val lines =
      (1L to 30L).map(k => (k, k)) ++ // order k -> supplier k for cust 1
      Seq((31L, 15L), (32L, 50L), (33L, 15L), (34L, 50L), (35L, 15L), (36L, 50L))
    spark.createDataFrame(orders).toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/orders.parquet")
    spark.createDataFrame(lines).toDF("l_orderkey", "l_suppkey")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    val recs = GraphOps.q454.run(spark, dir).collect()
    // Capped-out suppliers (17..30 — beyond cust 1's first 16) must be
    // absent from every recommendation: they exist only in the capped
    // tail, so the model never saw them.
    assert(recs.nonEmpty)
    recs.foreach { r =>
      val s = r.getAs[Long]("recommended_suppkey")
      assert(s <= 16L || s === 50L, s"capped-out supplier $s recommended")
    }
    // cust 1 owns 1..30, so its only possible recommendation is 50 (via
    // the (15,50) co-pair) — and it must actually surface.
    val c1 = recs.filter(_.getAs[Long]("c_custkey") === 1L)
    assert(c1.map(_.getAs[Long]("recommended_suppkey")).toSeq === Seq(50L))
    assert(c1.head.getAs[Long]("score") === 3L)
  }

  test("q461: a single-supplier corpus is one class-A row with a 100% share") {
    val dir = tmpDir("graft_q461_edge")
    spark.createDataFrame(Seq((1L, 7L, 100.0, 0.0), (2L, 7L, 50.0, 0.0)))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    val rows = DecisionSupport.q461.run(spark, dir).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("cls") === "A")
    assert(rows(0).getAs[Long]("n_suppliers") === 1L)
    assert(rows(0).getAs[Long]("revenue_share_ppm") === 1000000L)
  }

  test("q463: pair-census exhaustion stops the trainer early, no crash") {
    val dir = tmpDir("graft_q463_edge")
    // Vocabulary {aa}: round 1 merges (a,a); afterwards every word is a
    // single symbol and the census is empty — the loop must stop at one
    // merge instead of crashing on rounds 2..8.
    writeDocs(dir, (1L to 5L).map(i => (i, "aa aa aa", "en", "s", 8L)))
    val rows = TextMedia.q463.run(spark, dir).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("merged") === "aa")
    // one distinct word "aa" with corpus frequency 15, one pair per word
    assert(rows(0).getAs[Long]("pair_cnt") === 15L)
  }

  test("q464: spans cover a planted 40-char shared substring exactly, in both docs") {
    val dir = tmpDir("graft_q464_edge")
    val shared = "thequickbrownfoxjumpsoverthelazydogagain" // 40 chars
    assert(shared.length === 40)
    def filler(prefix: String, n: Int): String =
      (0 until n).map(i => f"$prefix$i%03d").mkString // 4-char unique blocks
    val fillA = filler("x", 25) // 100 chars
    val fillB = filler("y", 12) // 48 chars
    val docA = fillA + shared + filler("v", 10)
    val docB = fillB + shared + filler("u", 10)
    val docC = filler("z", 40) // no repeats anywhere
    writeDocs(dir, Seq(
      (1L, docA, "en", "s", docA.length.toLong),
      (2L, docB, "en", "s", docB.length.toLong),
      (3L, docC, "en", "s", docC.length.toLong)))
    val rows = NearDup.q464.run(spark, dir).collect()
    assert(rows.length === 2, rows.mkString("\n"))
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // 1-based span over [off+1, off+40], 17 repeated 24-gram positions.
    val a = byDoc(1L)
    assert(a.getAs[Long]("span_start") === 101L)
    assert(a.getAs[Long]("span_end") === 140L)
    assert(a.getAs[Long]("span_len") === 40L)
    assert(a.getAs[Long]("n_grams") === 17L)
    val b = byDoc(2L)
    assert(b.getAs[Long]("span_start") === 49L)
    assert(b.getAs[Long]("span_end") === 88L)
    assert(!byDoc.contains(3L))
  }

  test("q467: deletion resurrects an over-cap bucket and the probe matches again") {
    val cap = NearDup.MaxLshBucket
    // 70 identical corpus docs (ids % 4 != 0) overflow every band bucket
    // (70 > 64 -> tombstoned at build); erasing ids % 5 == 2 drops the
    // bucket back under cap, so the probe doc must match post-delete —
    // the member rows the build never wrote have to come back from the
    // signature log.
    val corpusIds = (1L to 200L).filter(_ % 4 != 0).take(70)
    val erased = corpusIds.filter(_ % 5 == 2)
    assert(corpusIds.size > cap, "fixture must overflow the cap at build")
    assert(corpusIds.size - erased.size <= cap,
      "fixture must fall back under cap after the delete")
    val dir = tmpDir("graft_q467_edge")
    val text = "alpha beta gamma delta epsilon"
    writeDocs(dir,
      corpusIds.map(i => (i, text, "en", "s", text.length.toLong)) ++
      Seq((4L, text, "en", "s", text.length.toLong), // probe, same text
          (8L, "zeta eta theta iota kappa", "en", "s", 25L))) // probe, unique
    val rows = Indexes.q467.run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val hit = rows(4L)
    assert(hit.getAs[Boolean]("is_dup") === true, hit.toString)
    assert(hit.getAs[Long]("dup_of") ===
      corpusIds.filter(_ % 5 != 2).min, hit.toString)
    assert(hit.getAs[Long]("n_erased_left") === 0L)
    assert(rows(8L).getAs[Boolean]("is_dup") === false)
  }

  test("q475: CDC maintainer killed mid-stream + restarted answers exactly-once") {
    // Upsert replays overwrite their own (cid, batch_id) partitions;
    // delete replays find no remaining victims — the drained index must
    // answer exactly like an uninterrupted run (≡ from-scratch rebuild
    // on the reduced corpus, which the oracle gate already pins for
    // runOnce; here the two paths are pinned against each other).
    val uninterrupted = Indexes.q475.run(spark, sf).collect().toSeq
    val restarted = graft.streaming.StreamIvfCdc
      .runWithRestart(spark, sf).collect().toSeq
    assert(restarted === uninterrupted)
    assert(uninterrupted.forall(_.getAs[Long]("n_erased_left") === 0L))
  }

  test("deleteFromIvf: untouched partitions keep their files byte-identical") {
    val dir = tmpDir("graft_ivfdel_edge")
    val ivf = s"$dir/ivf"
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    // cids 0..3; deleted ids live only in cids 1 and 3.
    val base = spark.createDataFrame((0L until 100L).map(i => (i, i % 4)))
      .toDF("vec_id", "cid")
    base.write.partitionBy("cid").parquet(ivf)
    def listing(cid: Long): Seq[(String, Long)] = {
      val walk = Files.list(Paths.get(s"$ivf/cid=$cid"))
      try walk.iterator().asScala
        .filter(f => f.getFileName.toString.endsWith(".parquet"))
        .map(f => (f.getFileName.toString, Files.size(f))).toSeq.sorted
      finally walk.close()
    }
    val before0 = listing(0L)
    val before2 = listing(2L)
    val before1 = listing(1L)
    val deadPred = ($"vec_id" % 8 === 1) || ($"vec_id" % 8 === 3) // cids {1,3}
    val assignDead = base.filter(deadPred).select($"cid".cast("long").as("cid"))
    val dead = Indexes.deleteFromIvf(spark, ivf, assignDead, deadPred)
    assert(dead === Seq(1L, 3L))
    // Unaffected partitions: same files, same sizes — never rewritten.
    assert(listing(0L) === before0)
    assert(listing(2L) === before2)
    // Affected partition: physically rewritten (different files).
    assert(listing(1L).map(_._1).intersect(before1.map(_._1)).isEmpty)
    // Logical state: erased rows gone, survivors all present.
    val left = spark.read.parquet(ivf).select($"vec_id").as[Long].collect().sorted
    assert(left.toSeq === (0L until 100L).filter(i => i % 8 != 1 && i % 8 != 3))
  }
}
