package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.Tables

/** Streaming CDC maintenance of the BM25 inverted index WITH DELETES
  * (q484) — the third cell of the streaming-delete matrix (IVF q475,
  * LSH q480, BM25 here), completing it: the feed is a change log of
  * `op = 'U'` document batches and an `op = 'D'` batch carrying ONLY
  * doc ids (the text is by assumption already erased everywhere else).
  *
  * Upserts are q479's replay-idempotent batch writes (postings + df +
  * globals, each under the batch's own batch_id partition with dynamic
  * overwrite). Deletes combine the q475 and q466 verbs:
  *  - victims are located by a key semi-join against the index's OWN
  *    (doc_id, batch_id, tb) columns — a column-pruned read; at 100 TB
  *    a key-bucketed copy of those columns makes this a pruned lookup;
  *  - NEGATIVE df/globals epoch rows (q466's merge-on-read discipline)
  *    are computed from the victim postings and written under the
  *    delete batch's partition — BEFORE the postings rewrite, which is
  *    what makes the replay exactly-once (below);
  *  - only the exact victim (batch_id, tb) partitions are rewritten
  *    minus the victims — staged and dir-swapped
  *    ([[graft.Fs.swapPartitionDirs]]), untouched partitions never read
  *    or written, with [[graft.Fs.recoverStagedSwap]] run at the top of
  *    every batch so a kill in either swap window recovers.
  *
  * Why negatives-first is the exactly-once ordering: the negative rows
  * must be computed from victim postings still readable in the index.
  * A replay after a crash BEFORE the swap finds the victims intact and
  * dynamically overwrites its own stats partition with the identical
  * rows; a replay AFTER the swap finds no victims and its EMPTY
  * dynamic overwrite replaces no partitions — the earlier negative
  * rows survive untouched. Writing the swap first would leave a crash
  * window in which the victims (and with them the negatives' only
  * source) are already gone while the stats still count them — an
  * unrecoverable double-count. The kill-and-restart test pins drained
  * ≡ uninterrupted.
  *
  * Probe: q479's partition-pruned top-5 (its df > 0 guard now
  * load-bearing: a term whose postings were entirely erased must stop
  * scoring) plus the erased-ids audit pinned 0. Oracle: the
  * from-scratch BM25 on the reduced corpus — q466's contract. */
object StreamBm25Cdc {

  private final case class Staged(spark: SparkSession, sfDir: String, tmp: String)

  /** Apply one CDC micro-batch. */
  private def applyBatch(st: Staged, batch: DataFrame, batchId: Long): Unit = {
    import st.spark.implicits._
    // Crash recovery FIRST, before anything reads the index (see
    // [[graft.Fs.recoverStagedSwap]]; leaf partitions here are
    // two-level batch_id=X/tb=Y dirs).
    graft.Fs.recoverStagedSwap(s"${st.tmp}/post",
      s"${st.tmp}/post.__cdc_delete_stage")
    val ups = batch.filter(col("op") === "U")
    if (!ups.isEmpty)
      StreamBm25Maintain.writeBatchTo(st.tmp,
        StreamBm25Maintain.tokenize(ups.select(col("doc_id"), col("text"))),
        batchId)
    val dels = batch.filter(col("op") === "D").select(col("doc_id"))
    if (!dels.isEmpty) {
      // Tombstones recorded for the probe's audit read (replay-safe:
      // the batch's own partition, dynamically overwritten).
      dels.withColumn("batch_id", lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(s"${st.tmp}/deleted")
      // Victims via the index's own id columns (column-pruned read).
      val victims = st.spark.read.parquet(s"${st.tmp}/post")
        .join(broadcast(dels), Seq("doc_id"), "left_semi")
      val vparts = victims
        .select($"batch_id".cast("long"), $"tb".cast("long")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      if (vparts.nonEmpty) {
        // Exact (batch_id, tb) pairs — partition-prunable AND precise
        // (the q475 rule: the cross product would stage partitions the
        // swap then discards), via one In/InSet node so the expression
        // tree stays O(1)-depth at any victim count (see [[CdcVictims]]).
        val pairPred = CdcVictims.pairPredicate("batch_id", "tb",
          vparts.toSeq)
        val vpost = st.spark.read.parquet(s"${st.tmp}/post")
          .filter(pairPred)
          .join(broadcast(dels), Seq("doc_id"), "left_semi")
        // NEGATIVE stats/globals FIRST (see the object doc for why this
        // ordering is the exactly-once one).
        vpost.groupBy($"term").agg((-count(lit(1))).cast("long").as("df"))
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(s"${st.tmp}/stats")
        vpost.select($"doc_id", $"dl").distinct()
          .agg((-count(lit(1))).as("n_docs"), (-sum($"dl")).as("len_sum"))
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(s"${st.tmp}/globals")
        // Rewrite ONLY the victim partitions minus the victims.
        val stage = s"${st.tmp}/post.__cdc_delete_stage"
        st.spark.read.parquet(s"${st.tmp}/post")
          .filter(pairPred)
          .join(broadcast(dels), Seq("doc_id"), "left_anti")
          .repartition($"tb")
          .write.partitionBy("batch_id", "tb").parquet(stage)
        graft.Fs.swapPartitionDirs(s"${st.tmp}/post", stage,
          vparts.toSeq.sorted.map { case (b, t) => s"batch_id=$b/tb=$t" })
        graft.Fs.deleteTree(stage)
      }
    }
  }

  /** Epoch-0 batch build + the CDC feed staged into the stream inbox:
    * two upsert files (odd ids) then one key-only tombstone file
    * (doc_id % 9 = 4, spanning the batch build AND the streamed adds —
    * q466's erasure set, so its oracle carries over verbatim). */
  private def stage(spark: SparkSession, sfDir: String): Staged = {
    import spark.implicits._
    val st = Staged(spark, sfDir,
      s"${System.getProperty("java.io.tmpdir")}/graft_sbm25c_" +
        java.util.UUID.randomUUID.toString.replace("-", "").take(12))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"${st.tmp}/in"))
    val docs = Tables.documents(spark, sfDir)
    StreamBm25Maintain.writeBatchTo(st.tmp,
      StreamBm25Maintain.tokenize(
        Tables.fanOut(docs, col("doc_id")).filter($"doc_id" % 2 === 0)
          .select($"doc_id", $"text")),
      batchId = -1L)
    val feed = Seq(
      ("cdc_0", docs.filter($"doc_id" % 4 === 1)
        .select(lit("U").as("op"), $"doc_id", $"text")),
      ("cdc_1", docs.filter($"doc_id" % 4 === 3)
        .select(lit("U").as("op"), $"doc_id", $"text")),
      ("cdc_2", docs.filter($"doc_id" % 9 === 4)
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

  private def writer(st: Staged): DataStreamWriter[Row] = {
    val schema = st.spark.read.parquet(s"${st.tmp}/in").schema
    st.spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"${st.tmp}/in")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(st, batch, batchId)
      }
      .option("checkpointLocation", s"${st.tmp}/ckpt")
  }

  /** CDC-store compaction: the maintain-side fold (postings pass
    * through, stats SUM — which merges this feed's NEGATIVE df/globals
    * epochs into net values, the exactly-the-merge-on-read invariance
    * [[StreamBm25Maintain.compact]] documents) plus the tombstone
    * table folded to its distinct ids (the audit reads it distinct, so
    * the fold is its pre-aggregation). */
  private def compactAll(spark: SparkSession, tmp: String): Unit = {
    StreamBm25Maintain.compact(spark, tmp)
    StoreCompaction.compact(spark, s"$tmp/deleted", (all, gen, out) =>
      all.select(col("doc_id")).distinct()
        .withColumn("batch_id", lit(gen))
        .write.partitionBy("batch_id").parquet(out))
    ()
  }

  /** PROBE the CDC-maintained files (q479's shape, df>0 now
    * load-bearing) plus the erased-postings audit. */
  private def probe(st: Staged): DataFrame = {
    import st.spark.implicits._
    StoreCompaction.recover(s"${st.tmp}/deleted",
      StoreCompaction.stageDirFor(s"${st.tmp}/deleted"))
    val erased = st.spark.read.parquet(s"${st.tmp}/deleted")
      .select($"doc_id").distinct()
    val audit = st.spark.read.parquet(s"${st.tmp}/post")
      .join(broadcast(erased), Seq("doc_id"), "left_semi")
      .agg(count(lit(1)).as("n_erased_left"))
    graft.queries.Eager(
      StreamBm25Maintain.topKFromFiles(st.spark, st.tmp)
        .crossJoin(broadcast(audit))
        .orderBy($"query_id", $"rank"))
  }

  private def cleanup(st: Staged): Unit = graft.Fs.deleteTree(st.tmp)

  def runOnce(spark: SparkSession, sfDir: String): DataFrame =
      // r12: per-batch frames here are thousands of rows — exchanges
      // ride the harness's state-volume width (StreamHarness doc).
      StreamHarness.withStreamingPartitions(spark, 8) {
    val st = stage(spark, sfDir)
    try {
      val q = writer(st).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // Compaction AFTER the delete feed drained: the fold nets the
      // negative df/globals epochs against their positives, and the
      // oracle (from-scratch BM25 on the reduced corpus) gates the
      // consolidated store.
      compactAll(spark, st.tmp)
      probe(st)
    } finally cleanup(st)
  }

  /** Kill the maintainer once the first streamed batch partition
    * appears (possibly mid-batch), restart on the SAME checkpoint,
    * drain, probe — upsert replays overwrite their own partitions;
    * delete replays recover any pending swap, rewrite identical (or
    * vacuously empty) negative epochs, and erase nothing twice. */
  def runWithRestart(spark: SparkSession, sfDir: String): DataFrame =
      // r12: per-batch frames here are thousands of rows — exchanges
      // ride the harness's state-volume width (StreamHarness doc).
      StreamHarness.withStreamingPartitions(spark, 8) {
    val st = stage(spark, sfDir)
    try {
      val q1 = writer(st).trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      def streamed(): Boolean = {
        val d = new java.io.File(s"${st.tmp}/post")
        d.exists && d.listFiles != null &&
          d.listFiles.exists(f => f.getName.startsWith("batch_id=") &&
            !f.getName.endsWith("=-1"))
      }
      while (!streamed() && q1.isActive && System.nanoTime() < deadline)
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
