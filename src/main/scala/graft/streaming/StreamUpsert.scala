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

  /** Disk-derived merge-target pointer: the newest `target_v{b}` with
    * b < `below` (`below` < 0 = newest overall). This is what makes the
    * upsert RESTARTABLE: an in-memory pointer dies with the driver,
    * while versions on disk obey the invariant that any version < b was
    * fully committed before batch b first ran (foreachBatch returns —
    * and the checkpoint commits b — only after target_v{b} finished
    * writing). So a replayed batch b merges against the correct
    * pre-b state and idempotently overwrites its own possibly
    * half-written target_v{b}, which this lookup excludes. */
  private def latestTarget(tmp: String, below: Long): Option[String] = {
    val dirs = Option(new java.io.File(tmp).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("target_v"))
      .map(_.getName.stripPrefix("target_v").toLong)
      .filter(v => below < 0 || v < below)
    if (dirs.isEmpty) None else Some(s"$tmp/target_v${dirs.max}")
  }

  /** The per-micro-batch MERGE: collapse the batch to one candidate per
    * key, merge against the latest committed pre-batch target version,
    * write the next version. Pure function of (batch, on-disk state) —
    * no driver memory — so crash/replay at any point re-derives the
    * same output. */
  private def mergeBatch(spark: SparkSession, tmp: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val delta = latestPerKey(batch)
    val merged = latestTarget(tmp, batchId) match {
      case None => delta
      case Some(prev) =>
        latestPerKey(spark.read.parquet(prev).unionByName(delta))
    }
    merged.write.mode("overwrite").parquet(s"$tmp/target_v$batchId")
  }

  private def readTarget(spark: SparkSession, tmp: String): DataFrame = {
    import spark.implicits._
    val target = latestTarget(tmp, -1L).getOrElse(
      sys.error("stream delivered no batches"))
    val result = spark.read.parquet(target)
      .select($"user_id", $"event_id".as("last_event_id"),
        unix_micros($"ts").as("last_ts_us"), $"value".as("last_value"))
      .orderBy($"user_id")
    // Eager: the versioned target dirs are deleted in the finally.
    graft.queries.Eager(result)
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
        val q = h.eventsStream(maxFilesPerTrigger = 1)
          .select($"user_id", $"ts", $"event_id", $"value")
          .writeStream
          .foreachBatch(mergeBatch(spark, tmp) _)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        h.cleanupInput()
        readTarget(spark, tmp)
      }
    } finally {
      h.cleanup()
      graft.Fs.deleteTree(tmp)
    }
  }

  /** Restart-under-failure drill (the engine half of the reference's
    * job-retry policy): start the SAME upsert on a continuous trigger,
    * KILL the query as soon as the first batch's target version lands
    * (possibly mid-batch-1), then restart from the SAME checkpoint with
    * AvailableNow to drain the rest. Exactly-once is the disk-state
    * invariant above — the result must be row-identical to an
    * uninterrupted run (and to batch q80), with no duplicated or lost
    * merges across the kill. */
  def runWithRestart(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h = new StreamHarness(spark, sfDir, copies = 2, tag = "srestart")
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_srestart_tgt_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val ckpt = s"$tmp/ckpt"
    try {
      h.withStreamingPartitions(8) {
        def start(trigger: Trigger) = h.eventsStream(maxFilesPerTrigger = 1)
          .select($"user_id", $"ts", $"event_id", $"value")
          .writeStream
          .foreachBatch(mergeBatch(spark, tmp) _)
          .option("checkpointLocation", ckpt)
          .trigger(trigger)
          .start()
        val q1 = start(Trigger.ProcessingTime("50 milliseconds"))
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (latestTarget(tmp, -1L).isEmpty && q1.isActive
            && System.nanoTime() < deadline) Thread.sleep(50)
        q1.stop()
        // An interrupt mid-batch surfaces as a query exception — that IS
        // the simulated failure, not a test error.
        try q1.awaitTermination()
        catch { case scala.util.control.NonFatal(_) => () }
        val q2 = start(Trigger.AvailableNow())
        q2.awaitTermination()
        h.cleanupInput()
        readTarget(spark, tmp)
      }
    } finally {
      h.cleanup()
      graft.Fs.deleteTree(tmp)
    }
  }
}
