package graft

import graft.queries.Extras
import graft.streaming.StreamUpsert

/** Batch/streaming equivalence for CDC compaction: the foreachBatch
  * upsert (q91) merged across ≥2 micro-batches under duplicate delivery
  * must equal batch latest-wins compaction (q80) row-for-row — the
  * idempotent-merge contract that makes queue replays safe.
  */
class StreamUpsertSpec extends SparkTestBase {

  test("streamed upsert state equals batch latest-wins compaction") {
    val batch = Extras.q80.run(spark, sf).collect()
    val stream = StreamUpsert.runOnce(spark, sf).collect()
    assert(stream.length === batch.length)
    stream.zip(batch).zipWithIndex.foreach { case ((s, b), i) =>
      assert(s === b, s"row $i differs: stream=$s batch=$b")
    }
  }

  test("one surviving row per key") {
    val out = StreamUpsert.runOnce(spark, sf)
    assert(out.select("user_id").distinct().count() === out.count())
  }

  test("kill after batch 1 + restart from checkpoint is exactly-once") {
    // The reference's retry policy implies resume-from-checkpoint: the
    // query is stopped as soon as the first target version lands
    // (possibly mid-batch-1), restarted against the SAME checkpoint,
    // and the drained result must equal batch latest-wins compaction
    // row-for-row — a lost merge shows up as a stale value, a doubled
    // one cannot hide because replay must be value-idempotent.
    val batch = Extras.q80.run(spark, sf).collect()
    val restarted = StreamUpsert.runWithRestart(spark, sf).collect()
    assert(restarted.length === batch.length,
      "restart lost or duplicated keys")
    restarted.zip(batch).zipWithIndex.foreach { case ((s, b), i) =>
      assert(s === b, s"row $i differs after restart: stream=$s batch=$b")
    }
  }
}
