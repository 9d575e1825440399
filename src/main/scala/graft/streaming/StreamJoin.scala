package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
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
    val tag = java.util.UUID.randomUUID.toString.replace("-", "")
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_sjoin_$tag"
    val inDir = s"$tmp/in"
    val outDir = s"$tmp/out"
    Files.createDirectories(Paths.get(inDir))
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      Paths.get(s"$inDir/events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(inDir).schema
    def stream(): DataFrame = {
      val raw = spark.readStream.schema(schema).parquet(inDir)
      if (schema("ts").dataType == LongType)
        raw.withColumn("ts", expr(graft.Tables.nanosTsToMicros))
      else raw
    }
    val clicks = stream().filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = stream().filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
      .withWatermark("p_ts", "1 hour")

    val joined = purchases.join(clicks,
      $"c_user" === $"p_user" &&
        $"c_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") &&
        $"c_ts" <= $"p_ts")

    val q = joined.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    Files.list(Paths.get(inDir)).forEach(p => Files.deleteIfExists(p))
    Files.deleteIfExists(Paths.get(inDir))

    spark.read.parquet(outDir)
      .groupBy($"p_id")
      .agg(count(lit(1)).as("n_clicks_prior_hour"))
      .select($"p_id".as("purchase_id"), $"n_clicks_prior_hour")
      .orderBy($"purchase_id")
  }
}
