package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode

import graft.queries.NearDup

/** Degenerate-corpus guard for the near-dup bucket caps: a mass-duplicated
  * document puts every signature/band/nibble/shingle into one bucket whose
  * size (200) exceeds every cap, so all three queries must drop the bucket
  * and return empty — completing quickly instead of emitting the
  * 200·199/2 ≈ 20k-pair quadratic per bucket that an uncapped posting
  * list would. (On real data the caps sit above the observed sf0.1 bucket
  * maxima, so results are unchanged — the DuckDB oracle gate covers that.)
  */
class NearDupCapSpec extends SparkTestBase {

  private lazy val cloneDir: String = {
    val dir = Files.createTempDirectory("graft_clones").toString
    val text = "the quick brown fox jumps over the lazy dog again and again " * 3
    val rows = (1L to 200L).map(i => (i, text, "clone", "en", text.length))
    spark.createDataFrame(rows).toDF("doc_id", "text", "source", "lang", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  test("q24 MinHash/LSH drops the degenerate bucket (200 clones, cap 64)") {
    assert(NearDup.q24.run(spark, cloneDir).count() === 0L)
  }

  test("q25 SimHash drops the degenerate bucket (200 clones, cap 128)") {
    assert(NearDup.q25.run(spark, cloneDir).count() === 0L)
  }

  test("q26 n-gram Jaccard drops hot posting lists (200 clones, cap 64)") {
    assert(NearDup.q26.run(spark, cloneDir).count() === 0L)
  }

  test("q125 incremental dedup under a degenerate corpus: hot buckets drop, batch reports clean") {
    // All 200 clones share every band; the corpus side's buckets exceed
    // the cap and are dropped, so batch docs (doc_id % 4 == 0) must come
    // back marked NOT duplicate — the documented degrade-not-OOM
    // trade-off (a hot band carries no discriminating signal).
    val rows = NearDup.q125.run(spark, cloneDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(!r.getBoolean(1),
      s"doc ${r.getLong(0)} matched through a bucket the cap should drop"))
  }

  private lazy val oneBrandDir: String = {
    // The ER degenerate: EVERY part in one brand — brand blocking alone
    // would emit 2000·1999/2 ≈ 2M scored pairs; the sorted-neighborhood
    // window must bound it at < N·W.
    val dir = Files.createTempDirectory("graft_onebrand").toString
    val rows = (1L to 2000L).map(i => (i, s"part name ${i % 97} v$i", "Brand#00"))
    spark.createDataFrame(rows).toDF("p_partkey", "p_name", "p_brand")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/part.parquet")
    dir
  }

  test("q302 JW linkage: all-one-brand corpus stays linear (≤ N·W pairs)") {
    val n = NearDup.q302.run(spark, oneBrandDir)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).head().getLong(0)
    assert(n > 0L)
    assert(n <= 2000L * NearDup.NeighborhoodWindow,
      s"pair stream $n exceeds the sorted-neighborhood bound")
    assert(n < 2000L * 1999L / 2, "quadratic pair stream — window not applied")
  }

  test("q329 bounded-edit verify: all-one-brand corpus stays linear") {
    val n = NearDup.q329.run(spark, oneBrandDir)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).head().getLong(0)
    assert(n > 0L && n <= 2000L * NearDup.NeighborhoodWindow)
  }

  test("caps sit above observed sf bucket maxima so real pairs survive") {
    // The planted near-dup pairs at sf0.001 still come out with caps on.
    assert(NearDup.q24.run(spark, sf).count() > 0L)
    assert(NearDup.q26.run(spark, sf).count() > 0L)
  }
}
