package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

import graft.queries.Extras.SessionGapUs

/** Stateful streaming sessionization — `flatMapGroupsWithState` with an
  * event-time timeout, the custom-state tool Structured Streaming offers
  * when windowed aggregation can't express the semantics (a session's
  * extent depends on the data, not on a fixed grid).
  *
  * Contract: value-identical to batch q43 (same gap, same exact-decimal
  * value sums — SessionizeSpec asserts equality, and q44 gates it
  * against the same DuckDB oracle as q43).
  *
  * Scale notes (100 TB): state per user is ONE open session (4 longs),
  * evicted by the event-time timeout as the watermark passes
  * session_end + gap — bounded by active users, not history. Closed
  * sessions emit incrementally (Append mode) to an append-only parquet
  * sink, checkpointed exactly-once. The sort inside a group invocation
  * is per-user-per-batch only.
  *
  * Draining: a finite verification run ends with sessions still open —
  * no later event ever advances the watermark past their timeout. The
  * harness closes them the same way a production pipeline would: a
  * heartbeat event far past the last real timestamp (sentinel user -1,
  * filtered from results) lands as a second file, the stream resumes
  * from the checkpoint, the watermark jumps, and every real session
  * times out and flushes.
  */
object Sessionize {

  /** One emitted session. */
  final case class Session(
      user_id: Long,
      session_start_us: Long,
      session_end_us: Long,
      n_events: Long,
      value_sum: Double)

  /** Open-session state: exact scaled-decimal sum (micro-units of the
    * DECIMAL(30,4) accumulator batch q43 uses), so streaming and batch
    * totals are bit-identical. */
  final case class OpenSession(start: Long, end: Long, n: Long, sumScaled: Long)

  /** Spark's double→DECIMAL(30,4) cast: HALF_UP at scale 4 over the
    * SHORTEST decimal representation (Decimal(double) routes through
    * BigDecimal.valueOf / Double.toString — the exact binary expansion
    * `new BigDecimal(v)` would round half-boundary values differently
    * and break the bit-identity with batch q43). */
  private def scaled4(v: Double): Long =
    JBigDecimal.valueOf(v).setScale(4, RoundingMode.HALF_UP).unscaledValue().longValue()

  private def toSession(uid: Long, s: OpenSession): Session =
    Session(uid, s.start, s.end, s.n, new JBigDecimal(
      java.math.BigInteger.valueOf(s.sumScaled), 4).doubleValue())

  /** Fold one batch of events for a user into session state, emitting
    * sessions closed either by an in-batch gap or by timeout. */
  def onUser(
      uid: Long,
      rows: Iterator[(Long, Long, Double)], // (user_id, ts_us, value)
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession(uid, _)).iterator
      state.remove()
      return out
    }
    val evs = rows.map { case (_, ts, v) => (ts, v) }.toArray.sortBy(_._1)
    var open = state.getOption
    val closed = Array.newBuilder[Session]
    evs.foreach { case (ts, v) =>
      open match {
        case Some(s) if ts - s.end <= SessionGapUs =>
          open = Some(OpenSession(s.start, math.max(s.end, ts), s.n + 1,
            s.sumScaled + scaled4(v)))
        case Some(s) =>
          closed += toSession(uid, s)
          open = Some(OpenSession(ts, ts, 1, scaled4(v)))
        case None =>
          open = Some(OpenSession(ts, ts, 1, scaled4(v)))
      }
    }
    open.foreach { s =>
      state.update(s)
      // Close when the watermark passes end + gap (ms precision).
      state.setTimeoutTimestamp(s.end / 1000 + SessionGapUs / 1000 + 1)
    }
    closed.result().iterator
  }

  /** Run sessionization as a stream over the staged events, drain, flush
    * via the sentinel heartbeat, and return the closed real sessions. */
  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h = new StreamHarness(spark, sfDir, copies = 1, tag = "sessionize")
    try h.withStreamingPartitions(8) {
    def sessionStream(): DataFrame = {
      // Keep the watermarked ts column through to the stateful operator —
      // a typed .map before groupByKey would sever the event-time tag and
      // fail the EventTimeTimeout analysis.
      val typed: Dataset[(Long, java.sql.Timestamp, Long, Double)] = h.eventsStream()
        .withWatermark("ts", "30 minutes")
        .select($"user_id", $"ts", unix_micros($"ts").as("ts_us"), $"value")
        .as[(Long, java.sql.Timestamp, Long, Double)]
      typed
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (uid: Long, it: Iterator[(Long, java.sql.Timestamp, Long, Double)],
           state: GroupState[OpenSession]) =>
            onUser(uid, it.map(t => (t._1, t._3, t._4)), state)
        }.toDF()
    }

    h.drain(sessionStream()) // batch 1: real events; trailing sessions stay open

    // Heartbeat: one sentinel event 2 h past the last real timestamp.
    // The ts field mirrors whatever the source schema carries (long
    // nanos under nanosAsLong, otherwise a real timestamp).
    val sentinelTs: Any =
      if (h.schema("ts").dataType == LongType)
        h.stagedInput().agg(max($"ts")).head.getLong(0) + 2L * 3600 * 1000000000L
      else {
        val maxTs = h.stagedInput().agg(max($"ts")).head.getTimestamp(0)
        new java.sql.Timestamp(maxTs.getTime + 2L * 3600 * 1000)
      }
    h.appendInput(spark.createDataFrame(
      java.util.List.of(Row(-1L, sentinelTs, -1L, "heartbeat", 0.0, "{}")),
      h.schema))

    h.drain(sessionStream()) // batch 2: watermark jumps; sessions time out
    h.cleanupInput()

    h.output()
      .filter($"user_id" >= 0)
      .orderBy($"user_id", $"session_start_us")
    } finally h.cleanup()
  }
}
