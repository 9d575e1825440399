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

  test("caps sit above observed sf bucket maxima so real pairs survive") {
    // The planted near-dup pairs at sf0.001 still come out with caps on.
    assert(NearDup.q24.run(spark, sf).count() > 0L)
    assert(NearDup.q26.run(spark, sf).count() > 0L)
  }
}
