package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.Tables
import graft.functions.CollectCapped.collectCapped
import graft.functions.TextFns._

/** Streaming CDC maintenance of the persisted LSH index WITH DELETES
  * (q480) — q372's maintainer given the tombstone verb, with q467's
  * RESURRECTION subtlety under micro-batch delivery: the member table
  * is capped, so erasing docs can pull a tombstoned-hot bucket back
  * under cap, and a correct streaming delete must restore members the
  * appends never wrote. The feed is a change log: `op = 'U'` batches
  * carrying documents, then an `op = 'D'` batch carrying ONLY doc ids
  * (the text is by assumption already gone).
  *
  * Layout (q467's, made stream-appendable):
  *  - `sigs`: the ingest-time signature log, bucketed by (b, band_key),
  *    plain-appended per upsert batch. A replayed append only
  *    duplicates rows, and every consumer reads it through distinct()
  *    — signatures are a pure function of the doc, so dedup is exact.
  *  - `members`: capped per-batch bucket lists, plain-appended —
  *    duplicate-invariant under the probe's min(corpus_id), q372's
  *    argument unchanged.
  *  - `meta`: true per-bucket counts under each batch's OWN batch_id
  *    partition with dynamic overwrite (replay replaces, never
  *    double-counts). Delete batches write NEGATIVE k rows — q466's
  *    negative-stat epochs — so lifetime liveness Σk ≤ cap reflects
  *    the REDUCED bucket size.
  *  - `deleted`: erased ids under the delete batch's batch_id
  *    partition, dynamic overwrite.
  *
  * Delete micro-batch, in order: (1) record the tombstones; (2) write
  * the negative meta epoch from the deduped log's affected-bucket
  * census; (3) RESURRECT: buckets whose lifetime total was > cap
  * before this batch and ≤ cap after get their FULL member list
  * recomputed from the deduped log minus every deleted id, appended to
  * members (duplicates again harmless). Already-live buckets need no
  * rewrite — the probe masks deleted ids with an anti-join (the
  * logical-delete + deferred-compaction model; q361 is the compaction
  * that reclaims the masked rows). Every step is replay-idempotent:
  * (1)/(2) dynamically overwrite their own partition, (3) appends
  * under min()-invariance, and the resurrection test reads meta
  * EXCLUDING this batch's partition so a partial previous attempt
  * cannot shift the before-state.
  *
  * Probe: q359's liveness-from-meta rule over members minus deleted,
  * plus the erased-ids-visible audit pinned 0. Oracle: the
  * from-scratch rebuild on the REDUCED corpus (q467's contract) —
  * stream-deleted ≡ rebuilt-without-them, resurrection included.
  */
object StreamLshCdc {

  private[graft] final case class Staged(spark: SparkSession, sfDir: String,
      tmp: String, sigsTbl: String, membersTbl: String, cap: Int)

  private def docsOf(st: Staged): DataFrame = {
    import st.spark.implicits._
    Tables.fanOut(Tables.documents(st.spark, st.sfDir), col("doc_id"))
      .select($"doc_id", tokens($"text").as("t"))
      .filter(size($"t") >= 3)
  }

  /** Append one upsert batch: signature log + capped members + true
    * meta counts (meta under this batch's partition, replay-safe).
    * Buckets are computed from the batch's OWN signature frame, never
    * read back from the log table: reading a just-appended table from
    * the driver session inside foreachBatch serves the session's STALE
    * relation-cache listing (the micro-batch write invalidates only the
    * cloned session's cache), which silently drops the batch — and the
    * direct census is replay-deterministic anyway (signatures are a
    * pure function of the docs). */
  private def applyUpserts(st: Staged, docs: DataFrame, batchId: Long): Unit = {
    import st.spark.implicits._
    val sig = graft.queries.Indexes.bandSigs(docs)
    sig.write.mode(SaveMode.Append)
      .bucketBy(8, "b", "band_key").sortBy("b", "band_key")
      .option("path", s"${st.tmp}/sigs").saveAsTable(st.sigsTbl)
    val buckets = sig
      .groupBy($"b", $"band_key")
      .agg(count(lit(1)).as("k"), collectCapped($"doc_id", st.cap).as("ids"))
    buckets.select($"b", $"band_key", $"k")
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"${st.tmp}/meta")
    buckets.filter($"k" <= st.cap)
      .select($"b", $"band_key", explode($"ids").as("corpus_id"))
      .write.mode(SaveMode.Append)
      .bucketBy(8, "b", "band_key").sortBy("b", "band_key")
      .option("path", s"${st.tmp}/members").saveAsTable(st.membersTbl)
  }

  /** Apply one tombstone batch: record ids, negative meta epoch,
    * resurrect newly-under-cap buckets from the log. */
  private def applyDeletes(st: Staged, dels: DataFrame, batchId: Long): Unit = {
    import st.spark.implicits._
    dels.withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"${st.tmp}/deleted")
    // The driver session's relation cache predates the streamed appends
    // (the foreachBatch writes invalidate only the cloned session's) —
    // refresh, or the resurrection recompute sees a truncated log.
    st.spark.catalog.refreshTable(st.sigsTbl)
    val log = st.spark.table(st.sigsTbl).distinct()
    val kdel = log.join(broadcast(dels), Seq("doc_id"), "left_semi")
      .groupBy($"b", $"band_key").agg(count(lit(1)).as("kd"))
    kdel.select($"b", $"band_key", (-$"kd").as("k"))
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"${st.tmp}/meta")
    // Resurrection: before-state from meta EXCLUDING this batch's own
    // (possibly partially replayed) partition.
    val prevTot = st.spark.read.parquet(s"${st.tmp}/meta")
      .filter($"batch_id" =!= batchId)
      .groupBy($"b", $"band_key").agg(sum($"k").as("ktot"))
    val resurrected = prevTot.join(kdel, Seq("b", "band_key"))
      .filter($"ktot" > st.cap && $"ktot" - $"kd" <= st.cap)
      .select($"b", $"band_key")
    val allDeleted = st.spark.read.parquet(s"${st.tmp}/deleted")
      .select($"doc_id").distinct()
    log.join(resurrected, Seq("b", "band_key"), "left_semi")
      .join(broadcast(allDeleted), Seq("doc_id"), "left_anti")
      .select($"b", $"band_key", $"doc_id".as("corpus_id"))
      .write.mode(SaveMode.Append)
      .bucketBy(8, "b", "band_key").sortBy("b", "band_key")
      .option("path", s"${st.tmp}/members").saveAsTable(st.membersTbl)
  }

  /** Epoch-0 batch build + the CDC feed staged into the stream inbox. */
  private[graft] def stage(spark: SparkSession, sfDir: String): Staged = {
    import spark.implicits._
    val sfx = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val st = Staged(spark, sfDir,
      s"${System.getProperty("java.io.tmpdir")}/graft_slshc_$sfx",
      s"graft_slshc_sigs_$sfx", s"graft_slshc_mem_$sfx",
      graft.queries.NearDup.MaxLshBucket)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"${st.tmp}/in"))
    applyUpserts(st, docsOf(st).filter($"doc_id" % 4 === 1), batchId = -1L)
    // STAGE the CDC feed: two upsert files then one tombstone file.
    val docs = Tables.documents(spark, sfDir)
    val feed = Seq(
      ("cdc_0", docs.filter($"doc_id" % 4 === 2)
        .select(lit("U").as("op"), $"doc_id", $"text")),
      ("cdc_1", docs.filter($"doc_id" % 4 === 3)
        .select(lit("U").as("op"), $"doc_id", $"text")),
      ("cdc_2", docs.filter($"doc_id" % 4 =!= 0 && $"doc_id" % 5 === 2)
        .select(lit("D").as("op"), $"doc_id",
          lit(null).cast("string").as("text"))))
    feed.foreach { case (name, df) =>
      val stg = s"${st.tmp}/stage_$name"
      df.coalesce(1).write.parquet(stg)
      val ls = java.nio.file.Files.list(java.nio.file.Paths.get(stg))
      try ls.filter(_.toString.endsWith(".parquet")).findFirst.ifPresent { p =>
        java.nio.file.Files.move(p,
          java.nio.file.Paths.get(s"${st.tmp}/in/$name.parquet"))
        ()
      }
      finally ls.close()
    }
    st
  }

  private[graft] def writer(st: Staged): DataStreamWriter[Row] = {
    val schema = st.spark.read.parquet(s"${st.tmp}/in").schema
    st.spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"${st.tmp}/in")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ups = batch.filter(col("op") === "U")
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .filter(size(col("t")) >= 3)
        if (!ups.isEmpty) applyUpserts(st, ups, batchId)
        val dels = batch.filter(col("op") === "D").select(col("doc_id"))
        if (!dels.isEmpty) applyDeletes(st, dels, batchId)
      }
      .option("checkpointLocation", s"${st.tmp}/ckpt")
  }

  /** PROBE the CDC-maintained index: liveness from lifetime meta
    * (deletes included via the negative epochs), deleted ids masked,
    * plus the erased-ids-visible audit. Severed from tmp state. */
  /** CDC-store compaction: meta epochs fold by SUM (netting the delete
    * feed's negative rows — liveness is a lifetime total either way),
    * tombstones fold to their distinct ids; the bucketed member table
    * stays q361's rewrite job (see [[StreamIndexMaintain.compact]]). */
  private def compactStores(spark: SparkSession, tmp: String): Unit = {
    StreamIndexMaintain.compact(spark, tmp)
    StoreCompaction.compact(spark, s"$tmp/deleted", (all, gen, out) =>
      all.select(col("doc_id")).distinct()
        .withColumn("batch_id", lit(gen))
        .write.partitionBy("batch_id").parquet(out))
    ()
  }

  private[graft] def probe(st: Staged): DataFrame = {
    import st.spark.implicits._
    Seq(s"${st.tmp}/meta", s"${st.tmp}/deleted").foreach(r =>
      StoreCompaction.recover(r, StoreCompaction.stageDirFor(r)))
    val docs = docsOf(st)
    val allDeleted = st.spark.read.parquet(s"${st.tmp}/deleted")
      .select($"doc_id".as("corpus_id")).distinct()
    val live = st.spark.read.parquet(s"${st.tmp}/meta")
      .groupBy($"b", $"band_key")
      .agg(sum($"k").as("ktot")).filter($"ktot" <= st.cap)
    st.spark.catalog.refreshTable(st.membersTbl) // see the streamed appends
    val membersLive = st.spark.table(st.membersTbl)
      .join(live, Seq("b", "band_key"), "left_semi")
      .join(broadcast(allDeleted), Seq("corpus_id"), "left_anti")
    val matches = graft.queries.Indexes.bandSigs(docs.filter($"doc_id" % 4 === 0))
      .join(membersLive, Seq("b", "band_key"))
      .groupBy($"doc_id")
      .agg(min($"corpus_id").as("dup_of"))
    val audit = membersLive.filter($"corpus_id" % 5 === 2)
      .agg(count(lit(1)).as("n_erased_left"))
    graft.queries.Eager(docs.filter($"doc_id" % 4 === 0).select($"doc_id")
      .join(matches, Seq("doc_id"), "left")
      .select($"doc_id", $"dup_of".isNotNull.as("is_dup"), $"dup_of")
      .crossJoin(broadcast(audit))
      .orderBy($"doc_id"))
  }

  private[graft] def cleanup(st: Staged): Unit = {
    st.spark.sql(s"DROP TABLE IF EXISTS ${st.sigsTbl}")
    st.spark.sql(s"DROP TABLE IF EXISTS ${st.membersTbl}")
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
      // Post-drain compaction: the meta fold nets the negative delete
      // epochs, and the oracle gates the consolidated index.
      compactStores(spark, st.tmp)
      probe(st)
    } finally cleanup(st)
  }

  /** Kill the maintainer once the first streamed meta partition
    * appears (possibly mid-batch), restart on the SAME checkpoint,
    * drain, probe — replayed upserts dedup through distinct()/min(),
    * replayed deletes overwrite their own partitions and re-derive the
    * before-state without them, so the answer must equal an
    * uninterrupted run's. */
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
      try q1.awaitTermination()
      catch { case scala.util.control.NonFatal(_) => () }
      val q2 = writer(st).trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
      probe(st)
    } finally cleanup(st)
  }
}
