package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Chained streaming time-window aggregations (the multiple-stateful-
  * operators capability, SURVEY §2.9 round-5 completion): a 5-minute
  * tumbling aggregate feeding a 15-minute re-aggregate INSIDE one
  * streaming query — `window(window_time(window), "15 minutes")` over
  * the first aggregate's output. This is the streaming form of the
  * pre-aggregation ladder every metrics pipeline runs (raw → minutely →
  * quarter-hourly), and before Spark 3.5-era multi-stateful support it
  * required two queries with an intermediate sink.
  *
  * Both levels run in append mode (chained aggregations REQUIRE it):
  * a 5-min row reaches level 2 only when the watermark passes its
  * window end, and a 15-min row emits only when the watermark passes
  * ITS end — so the drained-run harness closes the tail with TWO
  * heartbeat sentinels, one drain each (each drained batch runs with
  * the watermark computed from the previous batch's stats, so one
  * sentinel buys one jump and a two-level pipeline needs two). The
  * sentinels flow through both aggregates as their own 'heartbeat'
  * groups and are dropped from the batch readout — they must NOT be
  * filtered before the first groupBy, where the filter would push down
  * into the scan and starve the watermark (see the inline note).
  *
  * Scale notes (100 TB): state at level 1 is bounded by watermark
  * eviction over a 5-min key space, level 2 by a 15-min key space —
  * BOTH independent of history length; the 3:1 fan-in means level 2
  * sees 1/3 the rows of level 1's output domain, the same volume taper
  * a batch rollup ladder gets from partial aggregation. Sums carry
  * DECIMAL(30,4) through BOTH levels and cast to double only at the
  * readout — re-summing doubles at level 2 would re-introduce the
  * order-dependence the Det discipline exists to kill.
  */
object StreamChainedWindows {

  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h = new StreamHarness(spark, sfDir, copies = 1, tag = "chainwin")
    try h.withStreamingPartitions(8) {
      def chained(): DataFrame = {
        // NO pre-aggregation heartbeat filter: a deterministic filter
        // before the first groupBy is pushed through the watermark node
        // into the parquet scan, so the sentinel would be dropped at the
        // source and the watermark would NEVER advance (observed: the
        // sentinel file commits to the source log with numInputRows=0).
        // The sentinel therefore flows through BOTH aggregation levels
        // as its own (window, 'heartbeat') group and is dropped from the
        // drained batch output below — StreamJoin's sentinel discipline.
        val lvl1 = h.eventsStream()
          .withWatermark("ts", "1 minute")
          .groupBy(window($"ts", "5 minutes"), $"event_type")
          .agg(count(lit(1)).as("n5"),
            sum($"value".cast("decimal(30,4)")).as("v5"))
        lvl1
          .groupBy(window(window_time($"window"), "15 minutes").as("w15"),
            $"event_type")
          .agg(sum($"n5").as("n_events"),
            sum($"v5").cast("double").as("value_sum"),
            count(lit(1)).as("n_buckets5"))
          .select(
            date_format($"w15.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
            $"event_type", $"n_events", $"value_sum", $"n_buckets5")
      }

      h.drain(chained()) // batch 1: watermark still initial; state fills

      // TWO heartbeats, one drain each: a drained AvailableNow batch runs
      // with the watermark computed from the PREVIOUS batch's stats, so
      // each drain buys exactly one watermark jump — and a two-level
      // stateful pipeline needs two. Jump 1 flushes level 1's tail into
      // level 2; jump 2 flushes level 2's tail into the sink. A single
      // far-future sentinel (the single-operator harnesses' recipe)
      // strands the final 15-min window in level-2 state forever.
      def sentinel(hoursPast: Long): Any =
        if (h.schema("ts").dataType == LongType)
          h.stagedInput().agg(max($"ts")).head.getLong(0) +
            hoursPast * 3600L * 1000000000L
        else {
          val maxTs = h.stagedInput().agg(max($"ts")).head.getTimestamp(0)
          new java.sql.Timestamp(maxTs.getTime + hoursPast * 3600L * 1000)
        }
      Seq(1L, 2L).foreach { hrs =>
        h.appendInput(spark.createDataFrame(
          java.util.List.of(Row(-1L, sentinel(hrs), -1L, "heartbeat", 0.0, "{}")),
          h.schema))
        h.drain(chained())
      }
      h.cleanupInput()

      graft.queries.Eager(h.output()
        .filter($"event_type" =!= "heartbeat")
        .orderBy($"window_start", $"event_type"))
    } finally h.cleanup()
  }
}
