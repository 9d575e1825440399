package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming dead-letter split via `foreachBatch` — batch q99's
  * quarantine pattern under continuous ingest: every micro-batch is
  * classified ONCE (reasons mutually exclusive, first failure wins) and
  * fanned to TWO append sinks — clean rows to the main table, rejects
  * with their reason to the quarantine table — so no row is ever
  * dropped silently, per batch or in total.
  *
  * The input stages TWO copies of the events file drained with
  * maxFilesPerTrigger=1, so AvailableNow delivers ≥2 micro-batches and
  * the split runs per-batch (not once); the duplicate delivery is kept
  * in the gate — every event must land in its sink exactly twice, which
  * the oracle mirrors by doubling the source. The batch frame persists
  * across the two sink writes (one classify pass, not two scans — q99's
  * discipline applied inside the micro-batch).
  *
  * Scale: per batch the work is a per-row classify + two filtered
  * appends; no streaming state at all (the split is stateless), so the
  * pattern's cost is IO-bound and the quarantine table grows only with
  * the reject rate.
  */
object StreamQuarantine {

  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h = new StreamHarness(spark, sfDir, copies = 2, tag = "squar")
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_squar_snk_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val clean = s"$tmp/clean"
    val rej = s"$tmp/quarantine"
    val ckpt = s"$tmp/ckpt"
    try {
      val classified = h.eventsStream(maxFilesPerTrigger = 1)
        .withColumn("reason",
          when($"event_type" === "error", "error_type")
            .when($"value" < 1.0, "low_value"))
      // Sink schemas remembered up front (StreamHarness.output()'s rule):
      // a sink that receives zero rows commits no parquet data files, and
      // schema INFERENCE over such a directory throws instead of
      // returning an empty relation.
      val rejSchema = classified.schema
      val cleanSchema = org.apache.spark.sql.types.StructType(
        rejSchema.filterNot(_.name == "reason"))
      h.withStreamingPartitions(8) {
        val q = classified
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val b = batch.persist()
            try {
              b.filter(col("reason").isNull).drop("reason")
                .write.mode("append").parquet(clean)
              b.filter(col("reason").isNotNull)
                .write.mode("append").parquet(rej)
            } finally { b.unpersist(); () }
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val cleanDf = spark.read.schema(cleanSchema).parquet(clean).select(
        lit("clean").as("sink"), lit("none").as("reason"),
        $"event_id", $"value")
      val rejDf = spark.read.schema(rejSchema).parquet(rej).select(
        lit("quarantine").as("sink"), $"reason", $"event_id", $"value")
      val agg = cleanDf.unionByName(rejDf)
        .groupBy($"sink", $"reason")
        .agg(count(lit(1)).as("n_events"),
          sum($"event_id").as("id_checksum"),
          graft.queries.Det.dsum($"value", 4).as("value_sum"))
        .orderBy($"sink", $"reason")
      graft.queries.Eager(agg) // eager: both sinks live under tmp
    } finally {
      h.cleanup()
      graft.Fs.deleteTree(tmp)
    }
  }
}
