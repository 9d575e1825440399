package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming CDC upsert via `foreachBatch` — the streaming twin of batch
  * q80 (latest-wins compaction) and the in-engine form of what a
  * merge-on-read table format's MERGE INTO does: each micro-batch is
  * collapsed to one candidate row per key, then merged against the
  * current target state, newest (ts, event_id) winning.
  *
  * The merge target is a versioned parquet dir (target_v{batchId}):
  * read-prev → merge → write-next, never overwriting the version being
  * read — the atomic-swap discipline object stores need. The input is
  * staged as TWO copies of the events file drained with
  * maxFilesPerTrigger=1, so AvailableNow delivers ≥2 micro-batches and
  * the merge path (not just the first write) is genuinely exercised;
  * the duplicate delivery also proves idempotence — re-merging identical
  * rows must not change the survivor, which is what lets a queue replay
  * safely.
  *
  * Scale: per batch, work is one hash agg over the batch (map-side
  * combinable) plus a key-partitioned merge join against target state;
  * state lives in parquet, not executor memory, so the key count is
  * unbounded. The q91 oracle equals q80's batch compaction over the
  * same events.
  */
object StreamUpsert {

  /** One candidate row per key: latest by (ts, event_id) — the SAME
    * ordering key as batch q80's row_number window, so the two paths
    * cannot diverge on a changelog that redelivers a (ts, event_id)
    * with a corrected value. max_by carries the payload without letting
    * it join the comparison. */
  private def latestPerKey(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.groupBy($"user_id")
      .agg(max_by(struct($"ts", $"event_id", $"value"),
        struct($"ts", $"event_id")).as("w"))
      .select($"user_id", $"w.ts".as("ts"), $"w.event_id".as("event_id"),
        $"w.value".as("value"))
  }

  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h = new StreamHarness(spark, sfDir, copies = 2, tag = "supsert")
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_supsert_tgt_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val ckpt = s"$tmp/ckpt"
    try {
      // Upsert state is one row per user (group-scaled): a handful of
      // state-free shuffle partitions beats 32 idle ones per batch.
      h.withStreamingPartitions(8) {
        @volatile var current: Option[String] = None
        val q = h.eventsStream(maxFilesPerTrigger = 1)
          .select($"user_id", $"ts", $"event_id", $"value")
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            val delta = latestPerKey(batch)
            val merged = current match {
              case None => delta
              case Some(prev) =>
                latestPerKey(spark.read.parquet(prev).unionByName(delta))
            }
            val next = s"$tmp/target_v$batchId"
            merged.write.mode("overwrite").parquet(next)
            current = Some(next)
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        h.cleanupInput()
        val target = current.getOrElse(
          sys.error("stream delivered no batches"))
        val result = spark.read.parquet(target)
          .select($"user_id", $"event_id".as("last_event_id"),
            unix_micros($"ts").as("last_ts_us"), $"value".as("last_value"))
          .orderBy($"user_id")
        // Eager: the versioned target dirs are deleted in the finally.
        graft.queries.Eager(result)
      }
    } finally {
      h.cleanup()
      graft.Fs.deleteTree(tmp)
    }
  }
}
