package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{lit, md5}

/** TrainPrep operators on degenerate documents the driver fixture never
  * contains (empty text, single char, exactly-one-gram) — the rows a
  * real crawl absolutely will contain. Expectations are hand-computed to
  * the SAME semantics the DuckDB oracle implements (e.g. an empty doc
  * has ZERO chunks, not one phantom empty chunk — Spark's truncating
  * `div` vs DuckDB's flooring `//` disagreed there until q67 pinned it).
  */
class TrainPrepEdgeSpec extends SparkTestBase {

  /** A documents.parquet with edge rows, staged in a temp dir. */
  private lazy val dir: String = {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_trainprep_edge").toString
    Seq(
      (0L, "", "en", "src0", 0L),
      (1L, "a", "en", "src0", 1L),
      (2L, "0123456789abcdef", "de", "src1", 16L), // exactly one 16-gram
      (3L, "the a the b", "fr", "src1", 11L),
      (4L, "x" * 100, "en", "src2", 100L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$out/documents.parquet")
    out
  }

  test("q67 chunking: empty doc has zero chunks; short docs one; 100 chars three") {
    val rows = graft.queries.TrainPrep.q67.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(rows(0L)._1 === 0, "empty doc must chunk to zero chunks")
    assert(rows(0L)._2 === 0)
    assert(rows(0L)._3 == null, "no first chunk to digest")
    assert(rows(1L) === ((1, 1, rows(1L)._3)))
    // 100 chars, stride 48: starts 1/49/97 -> lengths 64, 52, 4.
    assert(rows(4L)._1 === 3)
    assert(rows(4L)._2 === 64 + 52 + 4)
  }

  test("q61 scrub: empty doc passes through; stopword-only content collapses") {
    val rows = graft.queries.TrainPrep.q61.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(rows(0L) === ((0, 0, 0)))
    // "the a the b": removes 3 determiner tokens, collapses to "b".
    assert(rows(3L)._1 === 3)
    assert(rows(3L)._3 === 1)
  }

  test("q63 repeat-bigrams: sub-2-token docs are excluded, not crashed on") {
    val ids = graft.queries.TrainPrep.q63.run(spark, dir).collect().map(_.getLong(0)).toSet
    assert(!ids.contains(0L) && !ids.contains(1L), "0/1-token docs must be filtered")
    assert(ids.contains(3L))
  }

  test("q62 contamination: docs shorter than one gram are excluded") {
    // Eval set is doc_id 1-5; only doc 2/3/4 have >= 16 chars here, and
    // all corpus docs are in the eval range except doc 0 (too short) —
    // the query must simply produce no rows rather than failing.
    val out = graft.queries.TrainPrep.q62.run(spark, dir).collect()
    assert(out.length === 0)
  }

  test("q160 span scrub: sub-8-token docs are excluded, not crashed on") {
    assert(graft.queries.TrainPrep.q160.run(spark, dir).collect().isEmpty)
  }

  test("q160 span scrub: duplicated spans drop, tails and unique spans survive verbatim") {
    import spark.implicits._
    val d2 = Files.createTempDirectory("graft_scrub_edge").toString
    // 10/11: identical 9-token docs — the one 8-gram span is corpus-
    // duplicated and must drop, leaving only the sub-span tail.
    // 12: unique 8-token doc, no tail — must survive unchanged.
    Seq(
      (10L, "a b c d e f g h tail", "en", "s", 20L),
      (11L, "a b c d e f g h tail", "en", "s", 20L),
      (12L, "p q r s t u v w", "en", "s", 15L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val rows = graft.queries.TrainPrep.q160.run(spark, d2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getInt(4)))).toMap
    val tailMd5 = spark.range(1)
      .select(md5(lit("tail"))).head.getString(0)
    val fullMd5 = spark.range(1)
      .select(md5(lit("p q r s t u v w"))).head.getString(0)
    assert(rows(10L) === ((1L, 1L, tailMd5, 4)))
    assert(rows(11L) === ((1L, 1L, tailMd5, 4)))
    assert(rows(12L) === ((1L, 0L, fullMd5, 15)))
    graft.Fs.deleteTree(d2)
  }
}
