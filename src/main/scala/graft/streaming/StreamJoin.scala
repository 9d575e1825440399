package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Stream-stream interval join — the last §2.9 operator family: two
  * live streams (clicks, purchases) joined on user with a time-bound
  * condition (click within the hour before the purchase).
  *
  * Scale contract: BOTH sides are stateful, and the watermark plus the
  * interval bound let Spark evict join state — a click older than
  * (watermark − 1 h) can never match a future purchase and is dropped;
  * without the time bound, stream-stream join state grows forever.
  * Inner-join matches emit as soon as both rows have arrived (append
  * mode, no end-of-stream flush needed).
  *
  * Both streams read the same watched dir with a filter — one file
  * landing feeds both sides, the reference's SQS "file arrived" shape.
  */
object StreamJoin {

  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h = new StreamHarness(spark, sfDir, copies = 1, tag = "sjoin")
    try h.withStreamingPartitions(8) {
      val clicks = h.eventsStream().filter($"event_type" === "click")
        .select($"user_id".as("c_user"), $"ts".as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = h.eventsStream().filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
        .withWatermark("p_ts", "1 hour")

      h.drain(purchases.join(clicks,
        $"c_user" === $"p_user" &&
          $"c_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") &&
          $"c_ts" <= $"p_ts"))
      h.cleanupInput()

      h.output()
        .groupBy($"p_id")
        .agg(count(lit(1)).as("n_clicks_prior_hour"))
        .select($"p_id".as("purchase_id"), $"n_clicks_prior_hour")
        .orderBy($"purchase_id")
    } finally h.cleanup()
  }

  /** Stream-stream LEFT OUTER interval join: like [[runOnce]] but every
    * purchase survives, clickless ones with a null click side. The outer
    * half is the stateful-streaming hard case: an unmatched purchase can
    * only emit its null row once the watermark PROVES no matching click
    * can still arrive (watermark past p_ts + delay), so a finite drain
    * leaves trailing purchases stuck in state — the harness closes them
    * the same way production pipelines do, with heartbeat rows landing
    * after the real data. One heartbeat per side: each side's filter
    * runs BEFORE its watermark node, so a sentinel that only one filter
    * passes would advance only that side's watermark, and the global
    * watermark (min across nodes) would stay pinned. Sentinels carry
    * user_id -1 and are dropped from the rollup (a sentinel purchase
    * matching the sentinel click is filtered with it). */
  def runLeftOuterOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h = new StreamHarness(spark, sfDir, copies = 1, tag = "sjoinlo")
    try h.withStreamingPartitions(8) {
      def joined(): DataFrame = {
        val clicks = h.eventsStream().filter($"event_type" === "click")
          .select($"user_id".as("c_user"), $"ts".as("c_ts"))
          .withWatermark("c_ts", "1 hour")
        val purchases = h.eventsStream().filter($"event_type" === "purchase")
          .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
          .withWatermark("p_ts", "1 hour")
        purchases.join(clicks,
          $"c_user" === $"p_user" &&
            $"c_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") &&
            $"c_ts" <= $"p_ts",
          "left_outer")
      }

      h.drain(joined()) // batch 1: matches emit; clickless purchases held in state

      // Heartbeats 3 h past the last real event — far enough that every
      // real purchase's no-more-matches point is behind the watermark.
      val sentinelTs: Any =
        if (h.schema("ts").dataType == LongType)
          h.stagedInput().agg(max($"ts")).head.getLong(0) + 3L * 3600 * 1000000000L
        else {
          val maxTs = h.stagedInput().agg(max($"ts")).head.getTimestamp(0)
          new java.sql.Timestamp(maxTs.getTime + 3L * 3600 * 1000)
        }
      h.appendInput(spark.createDataFrame(
        java.util.List.of(
          Row(-1L, sentinelTs, -1L, "click", 0.0, "{}"),
          Row(-2L, sentinelTs, -1L, "purchase", 0.0, "{}")),
        h.schema))

      h.drain(joined()) // batch 2: watermark jumps; null rows flush
      h.cleanupInput()

      h.output()
        .filter($"p_id" >= 0)
        .groupBy($"p_id")
        .agg(sum(when($"c_user".isNotNull, 1L).otherwise(0L)).as("n_clicks_prior_hour"))
        .select($"p_id".as("purchase_id"), $"n_clicks_prior_hour")
        .orderBy($"purchase_id")
    } finally h.cleanup()
  }

  /** Stream-stream FULL OUTER interval join — completes the join-mode
    * matrix (q54 inner, q108 left outer): unmatched PURCHASES flush a
    * null click side AND unmatched CLICKS flush a null purchase side,
    * each only once the watermark proves no partner can still arrive.
    * Same heartbeat discipline as the left-outer run; the sentinel
    * click and sentinel purchase match EACH OTHER (same user, same
    * instant) and leave with the p_id filter. The rollup classifies
    * every emitted row: per-purchase matched-click counts (zero for
    * clickless purchases), and per-user unmatched-click counts —
    * value-identical to the batch full-outer decomposition the oracle
    * states. */
  def runFullOuterOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h = new StreamHarness(spark, sfDir, copies = 1, tag = "sjoinfo")
    try h.withStreamingPartitions(8) {
      def joined(): DataFrame = {
        val clicks = h.eventsStream().filter($"event_type" === "click")
          .select($"user_id".as("c_user"), $"ts".as("c_ts"))
          .withWatermark("c_ts", "1 hour")
        val purchases = h.eventsStream().filter($"event_type" === "purchase")
          .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
          .withWatermark("p_ts", "1 hour")
        purchases.join(clicks,
          $"c_user" === $"p_user" &&
            $"c_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") &&
            $"c_ts" <= $"p_ts",
          "full_outer")
      }

      h.drain(joined()) // batch 1: matches emit; both orphan kinds held

      val sentinelTs: Any =
        if (h.schema("ts").dataType == LongType)
          h.stagedInput().agg(max($"ts")).head.getLong(0) + 3L * 3600 * 1000000000L
        else {
          val maxTs = h.stagedInput().agg(max($"ts")).head.getTimestamp(0)
          new java.sql.Timestamp(maxTs.getTime + 3L * 3600 * 1000)
        }
      h.appendInput(spark.createDataFrame(
        java.util.List.of(
          Row(-1L, sentinelTs, -1L, "click", 0.0, "{}"),
          Row(-2L, sentinelTs, -1L, "purchase", 0.0, "{}")),
        h.schema))

      h.drain(joined()) // batch 2: watermark jumps; both orphan kinds flush
      h.cleanupInput()

      // The only sentinel-bearing row is the sentinel-sentinel match
      // (p_id = -2): real rows have p_id >= 0 or a null purchase side.
      val out = h.output().filter($"p_id".isNull || $"p_id" >= 0)
      val purchases = out.filter($"p_id".isNotNull)
        .groupBy($"p_id")
        .agg(sum(when($"c_user".isNotNull, 1L).otherwise(0L)).as("n"))
        .select(lit("purchase").as("kind"), $"p_id".as("k"), $"n")
      val clickOnly = out.filter($"p_id".isNull && $"c_user" >= 0)
        .groupBy($"c_user")
        .agg(count(lit(1)).as("n"))
        .select(lit("click_only").as("kind"), $"c_user".as("k"), $"n")
      purchases.unionByName(clickOnly).orderBy($"kind", $"k")
    } finally h.cleanup()
  }
}
