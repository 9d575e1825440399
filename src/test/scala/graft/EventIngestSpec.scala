package graft


import graft.queries.TextMedia
import graft.streaming.EventIngest

/** Streaming/batch equivalence: the drained Trigger.AvailableNow stream
  * must produce exactly the batch q34 hourly rollup over the same files. */
class EventIngestSpec extends SparkTestBase {

  test("streaming hourly window equals the batch twin (q34) row-for-row") {
    val streamed = EventIngest.runOnce(spark, sf).collect()
    val batch = TextMedia.q34.run(spark, sf).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("a second drain from a fresh checkpoint is deterministic") {
    val a = EventIngest.runOnce(spark, sf).collect()
    val b = EventIngest.runOnce(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
  }
}
