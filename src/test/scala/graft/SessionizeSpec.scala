package graft

import graft.queries.Extras
import graft.streaming.Sessionize

/** Batch/streaming equivalence for sessionization: the
  * flatMapGroupsWithState stream (q44) must produce exactly the sessions
  * the batch lag/cumsum query (q43) produces — same boundaries, counts,
  * and bit-identical value sums (both accumulate the scaled DECIMAL(30,4)
  * representation).
  */
class SessionizeSpec extends SparkTestBase {

  test("streaming sessions equal batch sessions value-for-value") {
    val batch = Extras.q43.run(spark, sf).collect()
    val stream = Sessionize.runOnce(spark, sf).collect()
    assert(stream.length === batch.length)
    stream.zip(batch).zipWithIndex.foreach { case ((s, b), i) =>
      assert(s === b, s"row $i differs: stream=$s batch=$b")
    }
  }

  test("every event lands in exactly one session") {
    val nEvents = Tables.events(spark, sf).count()
    val sessions = Sessionize.runOnce(spark, sf)
    val counted = sessions.agg(org.apache.spark.sql.functions.sum("n_events"))
      .head.getLong(0)
    assert(counted === nEvents)
  }
}
