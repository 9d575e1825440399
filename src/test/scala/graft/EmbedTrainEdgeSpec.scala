package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.queries.EmbedTrain

/** Degenerate-input guards for the contrastive-train-prep family
  * (q352–q358). The generic QueriesSpec pins determinism and atomic
  * schemas on real testdata; these suites pin the EDGES no sampled
  * corpus exercises: the one-centroid corpus that would go quadratic
  * without the q352 pool cap, the all-same-label bucket (zero
  * negatives), the single-parity snapshot (q356's NULL-m1 branch), the
  * all-singleton cluster corpus (q357 emits nothing), and the
  * zero-heldout split (q358's nullif path).
  */
class EmbedTrainEdgeSpec extends SparkTestBase {

  private def writeEmb(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = Files.createTempDirectory("graft_emb_edge").toString
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q352: all-same-label corpus yields zero hard negatives") {
    // Centroid ids 2–9 must exist; every vector shares label 7, so no
    // cross-label pair survives the la =!= lb filter anywhere.
    val dir = writeEmb((1L to 64L).map(i =>
      (i, Array(1.0f, (i % 7).toFloat, (i % 3).toFloat), 7)))
    assert(EmbedTrain.q352.run(spark, dir).count() === 0L)
  }

  test("q352 core: one-centroid corpus stays linear — negatives only from the capped pool") {
    // The degenerate IVF outcome: EVERY vector lands in one bucket. An
    // uncapped miner would stream n² cross-label pairs; the pool cap
    // bounds the candidate side at `cap` rows, so the pair volume is
    // n·cap by construction. Observable contract: every emitted neg_id
    // is one of the cap lowest vec_ids in the bucket.
    import spark.implicits._
    val n = 5000
    val cap = 8
    val assigned = spark.createDataFrame((1 to n).map { i =>
      (1L, i.toLong, i % 2, Seq(1.0, (i % 13).toDouble, (i % 5).toDouble))
    }).toDF("cid", "vec_id", "label", "emb")
      .withColumn("nrm", graft.functions.VectorOps.l2Norm($"emb"))
    val out = EmbedTrain.hardNegatives(spark, assigned, cap)
    val negIds = out.select($"neg_id").distinct().as[Long].collect().toSet
    assert(negIds.nonEmpty)
    assert(negIds.forall(_ <= cap.toLong),
      s"neg ids $negIds escaped the $cap-lowest-id pool — cap not enforced")
    assert(out.count() <= n.toLong * 3, "per-anchor top-3 bound violated")
  }

  test("BottomKLong: k smallest survive regardless of grouping, state bounded by construction") {
    import spark.implicits._
    val bottom4 = udaf(graft.functions.BottomKLong(4))
    val got = spark.range(1, 10001).select((lit(10001) - col("id")).as("v"))
      .repartition(8) // partial buffers merge across mappers
      .agg(bottom4(col("v")).as("b")).as[Seq[Long]].head()
    assert(got === Seq(1L, 2L, 3L, 4L))
    // Under-cap group: exact multiset, order ascending.
    val small = spark.createDataset(Seq(5L, 3L, 9L)).toDF("v")
      .agg(bottom4(col("v")).as("b")).as[Seq[Long]].head()
    assert(small === Seq(3L, 5L, 9L))
  }

  test("q356: single-parity snapshot takes the NULL-m1 branch, drift undefined not wrong") {
    // Only even vec_ids → snapshot 1 is empty; the pivot's m1/n1 are
    // NULL and drift_sq must come out NULL (undefined), never 0.0
    // (which would read as "no drift" — a lie).
    val dir = writeEmb(Seq(2L, 4L, 6L, 8L, 10L).map(i =>
      (i, Array(1.0f, i.toFloat), (i % 4).toInt)))
    val rows = EmbedTrain.q356.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("n_snap0")))
      assert(r.isNullAt(r.fieldIndex("n_snap1")), "phantom snapshot-1 count")
      assert(r.isNullAt(r.fieldIndex("drift_sq")),
        "drift over a missing snapshot must be NULL, not a number")
    }
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("graft_docs_edge").toString
    spark.createDataFrame(rows.map { case (id, text, src) =>
      (id, text, src, "en", text.length) })
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("q357: all-singleton clusters emit zero positive pairs") {
    val dir = writeDocs((1L to 50L).map(i =>
      (i, s"unique document number $i with its own distinct opening line", "web")))
    assert(EmbedTrain.q357.run(spark, dir).count() === 0L)
  }

  test("q358: zero-heldout corpus reports leak_ppm NULL via nullif, not a crash or 0") {
    // Only doc_ids whose md5 bucket < 'cd' (the train split). With no
    // held-out docs the leak ratio is undefined — nullif must keep the
    // division from becoming ÷0.
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex2(s: String) =
      md.digest(s.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
    val trainIds = (1L to 400L).filter(i => hex2(i.toString) < "cd").take(60)
    assert(trainIds.size === 60)
    val dir = writeDocs(trainIds.map(i =>
      (i, s"shared text prefix for everyone in this corpus doc $i", "web")))
    val r = EmbedTrain.q358.run(spark, dir).head()
    assert(r.getLong(r.fieldIndex("n_heldout_docs")) === 0L)
    assert(r.getLong(r.fieldIndex("n_leaked_docs")) === 0L)
    assert(r.isNullAt(r.fieldIndex("leak_ppm")))
  }

  test("q353: NULL event_type rows don't wedge the sampling key (coalesce'd rank)") {
    // The rank key r is concat_ws-based; with a NULL event_type Spark's
    // concat_ws SKIPS the field while DuckDB's || nulls the whole key —
    // both sides now coalesce to '' so the engines agree (engine
    // equality itself is the oracle gate's job; this pins that the
    // Spark side completes and r is never NULL).
    val dir = Files.createTempDirectory("graft_ev_edge").toString
    import spark.implicits._
    val rows = (1 to 40).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(s"2024-03-${10 + i % 5} 08:00:00"),
        (i % 4).toLong, if (i % 7 == 0) null else s"type${i % 3}", i.toDouble, "{}")
    }
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    val out = EmbedTrain.q353.run(spark, dir)
    assert(out.count() > 0L)
    // Deterministic under re-run (the growth-stable draw contract).
    val a = out.collect().toSeq
    val b = EmbedTrain.q353.run(spark, dir).collect().toSeq
    assert(a === b)
  }
}
