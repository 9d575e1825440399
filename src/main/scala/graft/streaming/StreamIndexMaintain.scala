package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.functions.CollectCapped.collectCapped
import graft.functions.TextFns._

/** Streaming MAINTENANCE of the persisted LSH index (q372) — the write
  * half of the story q366 reads: there the stream PROBES a static
  * index; here the stream IS the index builder. Epoch 0 builds the
  * bucketed member table + true-count meta in batch (q359's layout),
  * then epoch-1 documents arrive as a rate-limited file stream and
  * every micro-batch APPENDS its own band buckets — capped member
  * lists into the bucketed table, true counts into meta — inside
  * `foreachBatch`. No streaming state: each batch's signatures are
  * computed statelessly from the docs it carries, and the on-disk
  * meta/member pair absorbs the merge.
  *
  * Why the result is exact for ANY micro-batch granularity: liveness
  * is decided by the probe from the MAINTAINED meta (lifetime
  * Σk ≤ cap — [[graft.queries.Indexes.maintainedLshProbe]]), and a
  * bucket that stays live has per-batch counts ≤ its lifetime total ≤
  * cap, so every batch wrote its COMPLETE member list; a bucket whose
  * members were ever truncated necessarily has Σk > cap and is
  * tombstoned. Splitting the appends finer can therefore never change
  * a probe answer — which is why the oracle is still q342's
  * from-scratch rebuild, the same ≡-rebuild contract q359 proves for
  * the two-epoch batch case. At 100 TB this is continuous ingest:
  * builders append partition-locally, probes re-cap from meta, and
  * compaction (q361) reclaims tombstoned history on its own schedule.
  */
object StreamIndexMaintain {

  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cap = graft.queries.NearDup.MaxLshBucket
    val sfx = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val tbl = s"graft_slshm_$sfx"
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_slshm_$sfx"
    val in = s"$tmp/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    try {
      def buckets(df: DataFrame) = graft.queries.Indexes.bandSigs(df)
        .groupBy($"b", $"band_key")
        .agg(count(lit(1)).as("k"), collectCapped($"doc_id", cap).as("ids"))
      def writeBuckets(e: DataFrame, mode: SaveMode): Unit = {
        e.select($"b", $"band_key", $"k")
          .write.mode(mode).parquet(s"$tmp/meta")
        e.filter($"k" <= cap)
          .select($"b", $"band_key", explode($"ids").as("corpus_id"))
          .write.mode(mode)
          .bucketBy(8, "b", "band_key").sortBy("b", "band_key")
          .option("path", s"$tmp/members").saveAsTable(tbl)
      }
      val docs = Tables.documents(spark, sfDir)
        .select($"doc_id", tokens($"text").as("t"))
        .filter(size($"t") >= 3)
      // BUILD (batch, epoch 0).
      writeBuckets(buckets(docs.filter($"doc_id" % 4 === 1)),
        SaveMode.ErrorIfExists)
      // STAGE epoch 1 as two files → two append micro-batches.
      Seq($"doc_id" % 4 === 2, $"doc_id" % 4 === 3).zipWithIndex.foreach {
        case (pred, i) =>
          val stage = s"$tmp/stage_$i"
          Tables.documents(spark, sfDir).filter(pred)
            .select($"doc_id", $"text")
            .coalesce(1).write.parquet(stage)
          val ls = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
          try ls.filter(_.toString.endsWith(".parquet")).findFirst.ifPresent { p =>
            java.nio.file.Files.move(p,
              java.nio.file.Paths.get(s"$in/docs_$i.parquet"))
            ()
          }
          finally ls.close()
      }
      val schema = spark.read.parquet(in).schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch
            .select(col("doc_id"), tokens(col("text")).as("t"))
            .filter(size(col("t")) >= 3)
          writeBuckets(buckets(b), SaveMode.Append)
        }
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // PROBE the stream-maintained files exactly as q359 probes its
      // batch-maintained ones.
      val matches = graft.queries.Indexes.maintainedLshProbe(
        spark, tbl, s"$tmp/meta", docs.filter($"doc_id" % 4 === 0), cap)
      val out = docs.filter($"doc_id" % 4 === 0).select($"doc_id")
        .join(matches, Seq("doc_id"), "left")
        .select($"doc_id", $"dup_of".isNotNull.as("is_dup"), $"dup_of")
        .orderBy($"doc_id")
      graft.queries.Eager(out) // eager: index and stage live under tmp
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      graft.Fs.deleteTree(tmp)
    }
  }
}
