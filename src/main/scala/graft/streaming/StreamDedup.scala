package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

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
    val tag = java.util.UUID.randomUUID.toString.replace("-", "")
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_sdedup_$tag"
    val inDir = s"$tmp/in"
    val outDir = s"$tmp/out"
    Files.createDirectories(Paths.get(inDir))
    // Duplicate delivery: the same table lands twice.
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      Paths.get(s"$inDir/events_a.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      Paths.get(s"$inDir/events_b.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(inDir).schema
    val raw = spark.readStream.schema(schema).parquet(inDir)
    val events =
      if (schema("ts").dataType == LongType)
        raw.withColumn("ts", expr(graft.Tables.nanosTsToMicros))
      else raw

    val deduped = events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

    val q = deduped.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // The duplicated input copies are no longer needed once drained.
    Files.list(Paths.get(inDir)).forEach(p => Files.deleteIfExists(p))
    Files.deleteIfExists(Paths.get(inDir))

    spark.read.parquet(outDir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }
}
