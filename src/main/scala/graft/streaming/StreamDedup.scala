package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — `dropDuplicatesWithinWatermark`, the
  * streaming twin of batch `dropDuplicates` (q20): each key's first
  * arrival is emitted immediately (append mode, no end-of-stream flush
  * problem), and the dedup state for a key is dropped once the watermark
  * passes its event time — bounded state, unlike plain streaming
  * `dropDuplicates` whose state grows forever.
  *
  * The harness feeds the events table TWICE (two file copies in the
  * watched dir — the at-least-once delivery a real queue exhibits); the
  * deduped output must equal the single-copy batch counts, which is
  * exactly what the q53 oracle checks. At 100 TB this is the idempotent
  * ingest front of a pipeline: re-delivered files/messages collapse on
  * the id key while state stays watermark-bounded.
  */
object StreamDedup {

  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // No state-partition downsizing here, unlike the other harnesses:
    // dedup state holds EVERY event id inside the watermark (key-count-
    // scaled, not group-scaled), so concentrating it on fewer partitions
    // costs more than the per-partition fixed overhead it saves — the
    // "size state partitions to state volume" rule cuts both ways.
    val h = new StreamHarness(spark, sfDir, copies = 2, tag = "sdedup")
    try {
      h.drain(h.eventsStream()
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id"))
      h.cleanupInput()
      h.output()
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"))
        .orderBy($"event_type")
    } finally h.cleanup()
  }
}
