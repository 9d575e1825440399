package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-static enrichment join — the remaining standard streaming
  * join shape after q54's stream-stream interval join: each arriving
  * event is enriched against a STATIC dimension table (here customer,
  * keyed by user id) with a broadcast left join. The static side needs
  * no watermark and holds no state — Spark re-plans it per micro-batch,
  * and broadcasting keeps the stream side shuffle-free, which is the
  * 100 TB/day ingest pattern: dimension lookup at the edge, before
  * anything pays a shuffle.
  *
  * The stream stage emits enriched ROWS (append mode, no aggregate in
  * the stream — enrichment is row-local); the verification rollup over
  * the drained sink happens in batch, and the q95 oracle runs the same
  * left join + rollup in one SQL statement.
  */
object StreamEnrich {

  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h = new StreamHarness(spark, sfDir, copies = 1, tag = "senrich")
    try {
      // Enrichment is stateless — no streaming state at all, so the
      // state-partition sizing question doesn't arise; default
      // partitions are fine and the join is broadcast anyway.
      val dim = graft.Tables.customer(spark, sfDir)
        .select($"c_custkey", $"c_mktsegment")
      h.drain(h.eventsStream()
        .join(broadcast(dim), $"user_id" === $"c_custkey", "left")
        .select($"event_id", $"user_id", $"value",
          coalesce($"c_mktsegment", lit("unknown")).as("segment")))
      h.cleanupInput()
      h.output()
        .groupBy($"segment")
        .agg(count(lit(1)).as("n_events"),
          graft.queries.Det.dsum($"value", 4).as("value_sum"))
        .orderBy($"segment")
    } finally h.cleanup()
  }
}
