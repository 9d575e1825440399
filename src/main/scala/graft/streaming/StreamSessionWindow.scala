package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Det.dsum
import graft.queries.Extras.SessionGapUs

/** q324 — the BUILT-IN `session_window` running in STREAMING mode: the
  * declarative twin of q44's hand-rolled flatMapGroupsWithState
  * sessionizer, and the streaming twin of batch q112. The engine
  * maintains merging session state per (user, window) and emits each
  * session in append mode once the watermark proves no more members can
  * arrive — the exact contract a custom stateful sessionizer has to
  * hand-build (open/merge/timeout), obtained from one groupBy
  * expression. Same drained-harness discipline as q44: batch 1 streams
  * the real events, a sentinel heartbeat 2 h past the corpus jumps the
  * watermark, batch 2 flushes the trailing sessions; the sentinel user
  * is filtered from the result. Value-equal to q112's batch oracle (the
  * ≥-gap boundary rule), which is the point: stream and batch
  * formulations of the same sessionization must agree row-for-row.
  * Scale: session state shuffles on user_id exactly once; state size
  * tracks OPEN sessions only (watermark evicts closed ones) — the
  * unbounded-state trap of an unwatermarked dedup/agg does not apply.
  */
object StreamSessionWindow {

  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h = new StreamHarness(spark, sfDir, copies = 1, tag = "sesswin")
    try h.withStreamingPartitions(8) {
      def sessioned(): DataFrame =
        h.eventsStream()
          .withWatermark("ts", "30 minutes")
          .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"), dsum($"value", 4).as("value_sum"))
          .select($"user_id",
            unix_micros($"sw.start").as("session_start_us"),
            (unix_micros($"sw.end") - lit(SessionGapUs)).as("session_end_us"),
            $"n_events", $"value_sum")

      h.drain(sessioned()) // batch 1: real events; trailing sessions open

      val maxTs = h.stagedInput().agg(max($"ts")).head.getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 2L * 3600 * 1000)
      h.appendInput(spark.createDataFrame(
        java.util.List.of(Row(-1L, sentinelTs, -1L, "heartbeat", 0.0, "{}")),
        h.schema))

      h.drain(sessioned()) // batch 2: watermark jumps; sessions flush
      h.cleanupInput()

      h.output()
        .filter($"user_id" >= 0)
        .orderBy($"user_id", $"session_start_us")
    } finally h.cleanup()
  }
}
