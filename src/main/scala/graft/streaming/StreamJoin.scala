package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
