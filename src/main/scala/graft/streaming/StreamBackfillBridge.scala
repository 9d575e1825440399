package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

import graft.queries.Eager

/** Batch-backfill + streaming-tail seam bridge (the lambda-architecture
  * handoff every migrating pipeline performs once): history up to a seam
  * timestamp is aggregated as a BATCH job, the tail is processed as a
  * STREAM whose input re-delivers one hour of pre-seam events (the
  * at-least-once overlap a real queue hands you when you start the
  * stream "a little early" to be safe), and the two halves merge into
  * one rollup that must equal a from-scratch batch aggregate — which is
  * exactly what the oracle computes.
  *
  * The two seam disciplines under test:
  *  - ownership: the stream filters to ts ≥ seam BEFORE aggregating, so
  *    the overlap re-delivery can never double-count (the batch half
  *    owns everything strictly before the seam);
  *  - mergeable partials: both halves emit DECIMAL sum partials and a
  *    count, merged by SUM — the hour window that STRADDLES the seam
  *    gets contributions from both halves, so concatenating finished
  *    rollups would be wrong; only partial-merge is correct. The final
  *    decimal→double cast happens once, after the merge, which is
  *    bit-identical to a one-shot Det.dsum over all events.
  *
  * Scale: the batch half is the ordinary q34 plan over the history
  * partition range; the stream half's state is watermark-bounded; the
  * merge frame is two rollups (window×type), never event-sized.
  */
object StreamBackfillBridge {

  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)

    // Seam = the hour boundary at the midpoint of the event span
    // (derived from data, deterministic; a 2-value bounded collect).
    val r = ev.agg(min($"ts"), max($"ts")).head()
    val mn = r.getTimestamp(0).getTime
    val mx = r.getTimestamp(1).getTime
    val mid = mn + (mx - mn) / 2
    val seam = new Timestamp(mid - mid % 3600000L)
    val overlapStart = new Timestamp(seam.getTime - 3600000L)

    // Batch half: strictly-before-seam hourly partials.
    val batchHalf = ev.filter($"ts" < lit(seam))
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(30, 4))).as("v"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n", $"v")

    // Stream half: stage tail + 1 h pre-seam overlap as the watched dir
    // (the queue's "start early" re-delivery), stream it, OWN ts ≥ seam.
    val tag = java.util.UUID.randomUUID.toString.replace("-", "")
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_bridge_$tag"
    val inDir = s"$tmp/in"
    val ckpt = s"$tmp/ckpt"
    val sinkTable = s"graft_bridge_$tag"
    ev.filter($"ts" >= lit(overlapStart))
      .coalesce(1).write.parquet(inDir)
    try {
      val schema = spark.read.parquet(inDir).schema
      val streamed = spark.readStream.schema(schema).parquet(inDir)
        .filter($"ts" >= lit(seam)) // seam ownership: overlap is dropped HERE
        .withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast(DecimalType(30, 4))).as("v"))
        .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
          $"event_type", $"n", $"v")
      val streamHalf = StreamHarness.withStreamingPartitions(spark, 8) {
        val q = streamed.writeStream
          .outputMode("complete")
          .format("memory")
          .queryName(sinkTable)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        Eager(spark.table(sinkTable))
      }
      // Partial merge: the seam-straddling hour sums across both halves.
      Eager(batchHalf.unionByName(streamHalf)
        .groupBy($"window_start", $"event_type")
        .agg(sum($"n").as("n_events"),
          sum($"v").cast("double").as("value_sum"))
        .orderBy($"window_start", $"event_type"))
    } finally {
      spark.catalog.dropTempView(sinkTable)
      graft.Fs.deleteTree(tmp)
    }
  }
}
