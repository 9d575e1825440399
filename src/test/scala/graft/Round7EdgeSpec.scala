package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.queries.{Analytics, Curation, EmbedTrain, Extras, Indexes, RobustStats}

/** Degenerate-input guards for the round-7 additions (q370–q374). The
  * generic QueriesSpec pins determinism and atomic schemas on real
  * testdata; these pin the edges no sampled corpus exercises: the
  * collapsed (zero-variance) embedding space q370's denominator guard
  * exists for, the all-equal-length corpus where every q371 batching
  * strategy must report exactly zero waste, q372's stream-maintained
  * index answering identically to q359's batch-maintained one, q373's
  * var(x)=0 θ→0 branch, and q374 under two identical epochs (perfect
  * head agreement).
  */
class Round7EdgeSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("q370: constant embeddings collapse to zero trace and the guarded zero ratio") {
    val dir = tmpDir("graft_q370_edge")
    spark.createDataFrame((1L to 32L).map(i => (i, Array.fill(8)(0.25f), 1)))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/embeddings.parquet")
    val r = Curation.q370.run(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_vecs") === 32L)
    assert(r.getAs[Long]("dim") === 8L)
    assert(r.getAs[Double]("trace_cov") === 0.0)
    assert(r.getAs[Double]("trace_cov_sq") === 0.0)
    // 0² / greatest(0, eps): the guard must yield 0, not NaN/error.
    assert(r.getAs[Long]("participation_ratio_milli") === 0L)
  }

  test("q371: all-equal lengths waste exactly zero at every bucket count") {
    val dir = tmpDir("graft_q371_edge")
    spark.createDataFrame((1L to 40L).map(i =>
        (i, s"doc $i", "en", "src", 100L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    val rows = EmbedTrain.q371.run(spark, dir).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("waste_chars") === 0L,
        s"padding waste on equal lengths at Q=${r.getAs[Long]("n_buckets")}")
      assert(r.getAs[Long]("waste_ppm") === 0L)
    }
  }

  test("q372: stream-maintained index answers identically to the batch-maintained one") {
    // Same corpus, same probe split; q359 appends epoch 1 in one batch,
    // q372 appends it as two micro-batches — granularity must not change
    // a single verdict (the lifetime-meta liveness argument, observed).
    val batch = Indexes.q359.run(spark, sf).collect().toSeq
    val streamed = Indexes.q372.run(spark, sf).collect().toSeq
    assert(streamed === batch)
  }

  test("q372: kill mid-maintenance + restart from checkpoint is exactly-once") {
    // foreachBatch is at-least-once; the maintainer is killed as soon
    // as the first streamed meta partition appears (possibly mid-batch)
    // and restarted on the same checkpoint. The replayed append must
    // leave the index answering like an uninterrupted run — a doubled
    // meta count would tombstone a live bucket and flip verdicts.
    val clean = Indexes.q372.run(spark, sf).collect().toSeq
    val restarted = graft.streaming.StreamIndexMaintain
      .runWithRestart(spark, sf).collect().toSeq
    assert(restarted === clean)
  }

  test("q375: kill mid-maintenance + restart from checkpoint is exactly-once") {
    // A doubled IVF append would surface as a duplicate vec_id in the
    // probe's top-10; the dynamic (cid, batch_id) overwrite must make
    // the replay replace its own partial output instead.
    val clean = Indexes.q375.run(spark, sf).collect().toSeq
    val restarted = graft.streaming.StreamIvfMaintain
      .runWithRestart(spark, sf).collect().toSeq
    assert(restarted === clean)
    assert(restarted.map(_.getAs[Long]("vec_id")).distinct.size === restarted.size,
      "duplicate vec_id in top-10 — a replayed append doubled members")
  }

  test("q375: stream-maintained IVF answers identically to the from-scratch build") {
    // q341 builds the whole inverted file in one pass; q375 builds
    // epoch 0 then streams epoch 1 in as two micro-batch appends.
    // Assignment is a pure function of the frozen centroids, so the
    // probe must return the same 10 rows.
    val scratch = Indexes.q341.run(spark, sf).collect().toSeq
    val streamed = Indexes.q375.run(spark, sf).collect().toSeq
    assert(streamed === scratch)
  }

  test("q376: identical vectors put every pair in the top bin (collapse signature)") {
    val dir = tmpDir("graft_q376_edge")
    spark.createDataFrame((1L to 20L).map(i => (i, Array(0.5f, 0.25f, 0.125f), 1)))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/embeddings.parquet")
    val rows = Curation.q376.run(spark, dir).collect()
    assert(rows.length === 1, "collapsed space must fill exactly one bin")
    assert(rows(0).getAs[Long]("bin") === 9L)
    assert(rows(0).getAs[Long]("n_pairs") === 190L)
    assert(rows(0).getAs[Long]("share_ppm") === 1000000L)
  }

  test("q373: zero pre-period variance takes the theta=0 branch") {
    val dir = tmpDir("graft_q373_edge")
    // Every user's even-id (pre-period) sum is the same 10.0 → var(x)=0.
    val rows = (1L to 8L).flatMap { u =>
      Seq((2 * u, new Timestamp(86400000L * u), u, "click", 10.0, "{}"),
        (2 * u + 1, new Timestamp(86400000L * u + 1000L), u, "click",
          (u % 3).toDouble, "{}"))
    }
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/events.parquet")
    val out = Analytics.q373.run(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("theta_milli") === 0L)
      assert(r.getAs[Double]("adj_mean_y") === r.getAs[Double]("mean_y"),
        "theta=0 must leave the mean unadjusted")
    }
  }

  test("q379: untouched users ride the materialized state; output equals full recompute") {
    val dir = tmpDir("graft_q379_edge")
    // Users 1..4: only user 4 has delta events (event_id > max/2 = 50).
    // Users 1..3 must come out of the kept (materialized) branch and
    // the whole result must still equal q43's from-scratch rebuild —
    // including user 4's bridge: its delta event lands INSIDE the gap
    // after an epoch-0 session, merging what epoch 0 saw as the tail.
    val base = 1700000000000000L // micros
    val gap = Extras.SessionGapUs
    val rows =
      (1L to 3L).flatMap { u =>
        Seq((u * 10, new Timestamp(base / 1000), u, "click", 1.0, "{}"),
          (u * 10 + 1, new Timestamp((base + 2 * gap) / 1000), u, "click", 2.0, "{}"))
      } ++ Seq(
        (40L, new Timestamp(base / 1000), 4L, "click", 1.0, "{}"),
        // epoch-1 event 20 min after: bridges into the same session.
        (100L, new Timestamp((base + 20L * 60 * 1000000) / 1000), 4L, "click", 5.0, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/events.parquet")
    val maintained = Extras.q379.run(spark, dir).collect().toSeq
    val rebuilt = Extras.q43.run(spark, dir).collect().toSeq
    assert(maintained === rebuilt)
    // The bridge really merged: user 4 has ONE session spanning both epochs.
    val u4 = maintained.filter(_.getAs[Long]("user_id") == 4L)
    assert(u4.size === 1 && u4.head.getAs[Long]("n_events") === 2L)
  }

  test("q374: identical epochs agree perfectly on the head") {
    val dir = tmpDir("graft_q374_edge")
    // Docs 2i and 2i+1 carry the same text → both epochs see identical
    // token counts; ranks tie-break identically on the token itself.
    val text = (1 to 30).map(k => (Seq.fill(31 - k)(s"tok$k")).mkString(" "))
    val rows = (0 until 30).flatMap { i =>
      Seq((2L * i, text(i), "en", "src", text(i).length.toLong),
        (2L * i + 1, text(i), "en", "src", text(i).length.toLong))
    }
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    val r = RobustStats.q374.run(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_common") === 20L)
    assert(r.getAs[Long]("n_entered") === 0L)
    assert(r.getAs[Long]("n_exited") === 0L)
    assert(r.getAs[Long]("jaccard_ppm") === 1000000L)
    assert(r.getAs[Long]("max_rank_shift") === 0L)
    assert(r.getAs[Long]("sum_rank_shift") === 0L)
  }

  test("q388: identical embeddings tie every centroid — sil takes the 0 branch, all to cid 2") {
    val dir = tmpDir("graft_q388_edge")
    spark.createDataFrame((1L to 24L).map(i => (i, Array.fill(8)(0.25f), 1)))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/embeddings.parquet")
    val rows = queries.Indexes.q388.run(spark, dir).collect()
    // c1 = c2 = 1.0 everywhere: one cluster (lowest cid wins the tie),
    // silhouette exactly 0 — not NaN from (c1-c2)/(1-c2) = 0/0.
    assert(rows.length === 1)
    assert(rows(0).getAs[Long]("cluster_id") === 2L)
    assert(rows(0).getAs[Long]("n_members") === 24L)
    assert(rows(0).getAs[Double]("mean_sil") === 0.0)
    assert(rows(0).getAs[Double]("min_sil") === 0.0)
    assert(rows(0).getAs[Double]("max_sil") === 0.0)
  }

  test("q389: all-singleton partitions on both sides yield ARI = 1.0 by convention") {
    val dir = tmpDir("graft_q389_edge")
    // Globally-unique words: unique 40-char prefixes AND unique simhashes,
    // so sum_comb_a = sum_comb_b = 0 and the CASE must return 1.0, not 0/0.
    spark.createDataFrame((1L to 12L).map(i =>
        (i, s"alpha$i beta$i gamma$i delta$i epsilon$i", "en", "src", 40L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    val r = queries.NearDup.q389.run(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_docs") === 12L)
    assert(r.getAs[Long]("sum_comb_a") === 0L)
    assert(r.getAs[Long]("sum_comb_b") === 0L)
    assert(r.getAs[Double]("ari") === 1.0)
  }

  test("q390: an all-empty-text language reports NULL ratios, not a divide error") {
    val dir = tmpDir("graft_q390_edge")
    spark.createDataFrame(Seq(
        (1L, "", "xx", "src", 0L), (2L, "", "xx", "src", 0L),
        (3L, "hello world two", "en", "src", 15L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    val rows = queries.TextMedia.q390.run(spark, dir).collect()
    val xx = rows.filter(_.getAs[String]("lang") == "xx").head
    assert(xx.getAs[Long]("n_chars") === 0L)
    assert(xx.isNullAt(xx.fieldIndex("fertility_ppm")))
    assert(xx.isNullAt(xx.fieldIndex("bpe_per_ws_ppm")))
    val en = rows.filter(_.getAs[String]("lang") == "en").head
    assert(en.getAs[Long]("bpe_tokens") === 3L)
    assert(en.getAs[Long]("fertility_ppm") === 3L * 1000000L / 15L)
  }

  test("q391: a corpus with no co-shingled pairs calibrates to an empty table") {
    val dir = tmpDir("graft_q391_edge")
    spark.createDataFrame((1L to 10L).map(i =>
        (i, s"one$i two$i three$i four$i", "en", "src", 30L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    assert(queries.NearDup.q391.run(spark, dir).collect().isEmpty)
  }

  test("q394: a single source contributes 100% of novelty in one curve point") {
    val dir = tmpDir("graft_q394_edge")
    spark.createDataFrame((1L to 8L).map(i =>
        (i, s"aa$i bb$i cc$i dd$i", "en", "solo", 20L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    val rows = queries.Curation.q394.run(spark, dir).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("source") === "solo")
    assert(rows(0).getAs[Long]("marginal_shingles") === 16L) // 2 per doc
    assert(rows(0).getAs[Long]("cumulative_ppm") === 1000000L)
  }

  test("q395: constant embeddings tie every sub-centroid — one cell, zero distortion") {
    val dir = tmpDir("graft_q395_edge")
    spark.createDataFrame((1L to 20L).map(i => (i, Array.fill(8)(0.5f), 1)))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/embeddings.parquet")
    val rows = queries.Curation.q395.run(spark, dir).collect()
    // All four codebook rows are identical to every vector: the struct-min
    // tie-break must send everything to (2, 2) with exactly zero error.
    assert(rows.length === 1)
    assert(rows(0).getAs[Long]("code1") === 2L)
    assert(rows(0).getAs[Long]("code2") === 2L)
    assert(rows(0).getAs[Long]("n_vecs") === 20L)
    assert(rows(0).getAs[Double]("mean_sq_err") === 0.0)
  }

  test("q392: a single-source corpus has no cross-source duplication") {
    val dir = tmpDir("graft_q392_edge")
    // Shared 40-char prefixes (clusters exist!) but only one source:
    // the matrix must be empty, not self-paired.
    spark.createDataFrame((1L to 10L).map(i =>
        (i, "the same forty character prefix for all docs " + i, "en", "only_src", 50L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    assert(queries.LlmOps.q392.run(spark, dir).collect().isEmpty)
  }
}
