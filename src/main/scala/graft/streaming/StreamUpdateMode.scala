package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Update output mode, made observable: a streaming aggregation in
  * update mode re-emits a key's CUMULATIVE value in every micro-batch
  * where that key changed — the contract serving dashboards and KV
  * upsert sinks rely on (append can't serve them: it holds results back
  * until the watermark closes the window; complete re-ships the world).
  *
  * The harness stages the events table as TWO mtime-ordered files split
  * at an hour boundary mid-corpus and drains with maxFilesPerTrigger=1,
  * so per-day counts arrive in two installments: days before the split
  * day change only in batch 1, days after it only in batch 2, and the
  * SPLIT day changes in both. A foreachBatch upsert sink (versioned
  * parquet, q91's discipline) folds each update batch into (day,
  * n_events, n_upserts) — n_upserts counts the re-emissions.
  *
  * The gate pins BOTH halves of the contract: final n_events per day ==
  * the batch rollup (cumulative re-emission converges), and n_upserts
  * == 2 for exactly the split day, 1 elsewhere (update mode emitted
  * precisely the changed keys per batch, no more, no fewer). The split
  * instant is exact integer-microsecond arithmetic, so the oracle
  * restates it independently. Scale: update-mode state here is
  * calendar-sized; production pipelines add a watermark to evict closed
  * days — semantics unchanged for this in-order feed.
  */
object StreamUpdateMode {

  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_supd_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val inDir = s"$tmp/in"
    Files.createDirectories(Paths.get(inDir))
    try {
      val ev = graft.Tables.events(spark, sfDir).select($"ts", $"event_id")
      // Split at the hour containing the corpus midpoint — exact integer
      // micros, so DuckDB derives the identical instant.
      val splitTs = ev
        .agg(min($"ts").as("mn"), max($"ts").as("mx"))
        .select(date_trunc("hour",
          expr("timestamp_micros((unix_micros(mn) + unix_micros(mx)) div 2)")))
        .head().getTimestamp(0)
      def stage(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val dir = s"$tmp/stage_$name"
        df.coalesce(1).write.mode("overwrite").parquet(dir)
        val st = Files.list(Paths.get(dir))
        try {
          val part = st.filter(p => p.getFileName.toString.endsWith(".parquet"))
            .findFirst.orElseThrow(() => new IllegalStateException("no part file"))
          val dst = Paths.get(s"$inDir/$name.parquet")
          Files.move(part, dst)
          Files.setLastModifiedTime(dst, FileTime.fromMillis(mtimeMs))
        } finally st.close()
      }
      val base = System.currentTimeMillis() - 600000L
      stage(ev.filter($"ts" < splitTs), "b1_before", base)
      stage(ev.filter($"ts" >= splitTs), "b2_after", base + 60000L)
      StreamHarness.withStreamingPartitions(spark, 8) {
        @volatile var current: Option[String] = None
        val q = spark.readStream
          .schema(spark.read.parquet(inDir).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(inDir)
          .groupBy(date_trunc("day", $"ts").as("day"))
          .agg(count(lit(1)).as("n_events"))
          .writeStream
          .outputMode("update")
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            // Update batches carry the new CUMULATIVE count for exactly
            // the keys that changed — latest wins, upserts counted.
            val delta = batch
              .select($"day", $"n_events".as("d_events"), lit(1L).as("d_ups"))
            val merged = current match {
              case None => delta.select($"day", $"d_events".as("n_events"),
                $"d_ups".as("n_upserts"))
              case Some(prev) =>
                spark.read.parquet(prev).join(delta, Seq("day"), "full_outer")
                  .select($"day",
                    coalesce($"d_events", $"n_events").as("n_events"),
                    (coalesce($"n_upserts", lit(0L)) + coalesce($"d_ups", lit(0L)))
                      .as("n_upserts"))
            }
            val next = s"$tmp/target_v$batchId"
            merged.write.mode("overwrite").parquet(next)
            current = Some(next)
            ()
          }
          .option("checkpointLocation", s"$tmp/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val target = current.getOrElse(sys.error("stream delivered no batches"))
        // Eager: the versioned target lives under tmp, deleted on return.
        graft.queries.Eager(spark.read.parquet(target)
          .select(date_format($"day", "yyyy-MM-dd").as("day"),
            $"n_events", $"n_upserts")
          .orderBy($"day"))
      }
    } finally graft.Fs.deleteTree(tmp)
  }
}
