package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

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
  * the two-epoch batch case.
  *
  * Restart safety (`foreachBatch` is at-least-once; a kill mid-batch
  * replays it): the meta counts are the one replay-sensitive piece —
  * a doubled k could tombstone a live bucket — so each batch writes
  * its meta under its OWN `batch_id` partition with dynamic-partition
  * OVERWRITE: the replay replaces its previous (possibly partial)
  * counts instead of adding to them. Member rows stay plain appends:
  * a replayed member list can only duplicate rows, and the probe's
  * `min(corpus_id)` per doc is duplicate-invariant (asserted by the
  * kill-and-restart test). At 100 TB this is continuous ingest:
  * builders append partition-locally, probes re-cap from meta, and
  * compaction (q361) reclaims tombstoned history on its own schedule.
  */
object StreamIndexMaintain {

  private final case class Staged(spark: SparkSession, sfDir: String,
      tmp: String, tbl: String, cap: Int)

  private def buckets(s: SparkSession, df: DataFrame, cap: Int): DataFrame = {
    import s.implicits._
    graft.queries.Indexes.bandSigs(df)
      .groupBy($"b", $"band_key")
      .agg(count(lit(1)).as("k"), collectCapped($"doc_id", cap).as("ids"))
  }

  /** Idempotent per-batch write: meta under this batch's partition via
    * dynamic overwrite (replay replaces, never double-counts); member
    * rows appended (duplicate-invariant under the probe's min()). */
  private def writeBatch(st: Staged, e: DataFrame, batchId: Long): Unit = {
    import st.spark.implicits._
    e.select($"b", $"band_key", $"k")
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"${st.tmp}/meta")
    e.filter($"k" <= st.cap)
      .select($"b", $"band_key", explode($"ids").as("corpus_id"))
      .write.mode(SaveMode.Append)
      .bucketBy(8, "b", "band_key").sortBy("b", "band_key")
      .option("path", s"${st.tmp}/members").saveAsTable(st.tbl)
  }

  private def docsOf(st: Staged): DataFrame = {
    import st.spark.implicits._
    Tables.documents(st.spark, st.sfDir)
      .select($"doc_id", tokens($"text").as("t"))
      .filter(size($"t") >= 3)
  }

  /** Epoch-0 batch build + epoch-1 files staged into the stream inbox. */
  private def stage(spark: SparkSession, sfDir: String): Staged = {
    import spark.implicits._
    val sfx = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val st = Staged(spark, sfDir,
      s"${System.getProperty("java.io.tmpdir")}/graft_slshm_$sfx",
      s"graft_slshm_$sfx", graft.queries.NearDup.MaxLshBucket)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"${st.tmp}/in"))
    // BUILD (batch, epoch 0): the member table must not pre-exist.
    val e0 = buckets(spark, docsOf(st).filter($"doc_id" % 4 === 1), st.cap)
    e0.select($"b", $"band_key", $"k").withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").parquet(s"${st.tmp}/meta")
    e0.filter($"k" <= st.cap)
      .select($"b", $"band_key", explode($"ids").as("corpus_id"))
      .write.mode(SaveMode.ErrorIfExists)
      .bucketBy(8, "b", "band_key").sortBy("b", "band_key")
      .option("path", s"${st.tmp}/members").saveAsTable(st.tbl)
    // STAGE epoch 1 as two files → two append micro-batches.
    Seq($"doc_id" % 4 === 2, $"doc_id" % 4 === 3).zipWithIndex.foreach {
      case (pred, i) =>
        val stg = s"${st.tmp}/stage_$i"
        Tables.documents(spark, sfDir).filter(pred)
          .select($"doc_id", $"text")
          .coalesce(1).write.parquet(stg)
        val ls = java.nio.file.Files.list(java.nio.file.Paths.get(stg))
        try ls.filter(_.toString.endsWith(".parquet")).findFirst.ifPresent { p =>
          java.nio.file.Files.move(p,
            java.nio.file.Paths.get(s"${st.tmp}/in/docs_$i.parquet"))
          ()
        }
        finally ls.close()
    }
    st
  }

  private def writer(st: Staged): DataStreamWriter[Row] = {
    val schema = st.spark.read.parquet(s"${st.tmp}/in").schema
    st.spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"${st.tmp}/in")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .filter(size(col("t")) >= 3)
        writeBatch(st, buckets(st.spark, b, st.cap), batchId)
      }
      .option("checkpointLocation", s"${st.tmp}/ckpt")
  }

  /** Meta-sliver COMPACTION (round-11 verdict ask #3): the per-batch
    * bucket counts fold by SUM — liveness is decided from the lifetime
    * Σk, so the fold IS the probe's merge (a bucket over the cap stays
    * tombstoned, one under it stays live, batch granularity gone). The
    * MEMBER table is a bucketed Hive table of plain appends, not
    * batch_id partitions — its sliver problem is FILE count, and its
    * rewrite (re-bucket minus tombstoned history) is exactly the q361
    * compaction job; the [[StoreCompaction]] protocol only covers the
    * batch-partitioned epoch tables. Run with the maintainer and
    * probes stopped (the shared quiesce contract). */
  /** The meta fold: lifetime Σk per bucket — nets negative CDC epochs. */
  private[graft] def metaFold(all: DataFrame, gen: Long, out: String): Unit =
    all.groupBy(col("b"), col("band_key")).agg(sum(col("k")).as("k"))
      .withColumn("batch_id", lit(gen))
      .write.partitionBy("batch_id").parquet(out)

  private[graft] def compact(spark: SparkSession, tmp: String): Unit = {
    StoreCompaction.compact(spark, s"$tmp/meta", metaFold)
    ()
  }

  /** PROBE the stream-maintained files exactly as q359 probes its
    * batch-maintained ones, then sever from tmp state. */
  private def probe(st: Staged): DataFrame = {
    import st.spark.implicits._
    StoreCompaction.recover(s"${st.tmp}/meta",
      StoreCompaction.stageDirFor(s"${st.tmp}/meta"))
    val docs = docsOf(st)
    val matches = graft.queries.Indexes.maintainedLshProbe(
      st.spark, st.tbl, s"${st.tmp}/meta",
      docs.filter($"doc_id" % 4 === 0), st.cap)
    graft.queries.Eager(docs.filter($"doc_id" % 4 === 0).select($"doc_id")
      .join(matches, Seq("doc_id"), "left")
      .select($"doc_id", $"dup_of".isNotNull.as("is_dup"), $"dup_of")
      .orderBy($"doc_id"))
  }

  private def cleanup(st: Staged): Unit = {
    st.spark.sql(s"DROP TABLE IF EXISTS ${st.tbl}")
    graft.Fs.deleteTree(st.tmp)
  }

  def runOnce(spark: SparkSession, sfDir: String): DataFrame =
      // r12: per-batch frames here are thousands of rows — exchanges
      // ride the harness's state-volume width (StreamHarness doc).
      StreamHarness.withStreamingPartitions(spark, 8) {
    val st = stage(spark, sfDir)
    try {
      val q = writer(st).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // Maintenance-job compaction with the maintainer drained: the
      // probe re-caps from the consolidated meta, so the oracle gates
      // build → stream → compact → probe.
      compact(spark, st.tmp)
      probe(st)
    } finally cleanup(st)
  }

  /** Kill the maintainer as soon as the first streamed meta partition
    * appears (possibly mid-batch), restart on the SAME checkpoint,
    * drain, probe — the replayed append must leave the index answering
    * exactly like an uninterrupted run (≡ from-scratch rebuild). */
  def runWithRestart(spark: SparkSession, sfDir: String): DataFrame =
      // r12: per-batch frames here are thousands of rows — exchanges
      // ride the harness's state-volume width (StreamHarness doc).
      StreamHarness.withStreamingPartitions(spark, 8) {
    val st = stage(spark, sfDir)
    try {
      val q1 = writer(st).trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      def streamedMeta(): Boolean = {
        val d = new java.io.File(s"${st.tmp}/meta")
        d.exists && d.listFiles != null &&
          d.listFiles.exists(f => f.getName.startsWith("batch_id=") &&
            !f.getName.endsWith("=-1"))
      }
      while (!streamedMeta() && q1.isActive && System.nanoTime() < deadline)
        Thread.sleep(20)
      q1.stop()
      // An interrupt mid-batch surfaces as a query exception — that IS
      // the simulated failure, not a test error.
      try q1.awaitTermination()
      catch { case scala.util.control.NonFatal(_) => () }
      val q2 = writer(st).trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
      probe(st)
    } finally cleanup(st)
  }
}
