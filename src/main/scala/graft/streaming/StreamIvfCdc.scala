package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.Tables
import graft.functions.VectorOps._

/** Streaming CDC maintenance of the persisted IVF index WITH DELETES
  * (q475) — the verb the q372/q375 maintainers stop short of: the feed
  * is a change log, `op = 'U'` upserts carrying vectors and `op = 'D'`
  * tombstones carrying ONLY the key (by the time a right-to-be-
  * forgotten delete arrives, the payload is by assumption gone).
  * Epoch-0 vectors (even ids) build the inverted file in batch; the
  * stream then applies two upsert micro-batches (odd ids) and one
  * delete micro-batch (vec_id % 7 = 3, spanning the batch build AND
  * the streamed adds) inside `foreachBatch`.
  *
  * Per micro-batch:
  *  - UPSERTS assign against the FROZEN quantizer and land under their
  *    own (cid, batch_id) partitions with dynamic OVERWRITE — q375's
  *    replay-idempotent append, unchanged.
  *  - DELETES locate their victims with a key semi-join against the
  *    index's own (vec_id, cid, batch_id) columns (the inverted file
  *    doubles as the assignment log; a 100 TB deployment would keep a
  *    key-bucketed copy of those three columns to make this lookup a
  *    pruned read instead of an id-column scan), then rewrite ONLY the
  *    affected (cid, batch_id) partitions minus the victims — staged
  *    and dir-swapped ([[graft.Fs.swapPartitionDirs]]), untouched
  *    partitions never read or written.
  *
  * Restart safety: upsert replays regenerate identical partitions
  * (dynamic overwrite); delete replays recover FIRST
  * ([[graft.Fs.recoverStagedSwap]] at the top of every batch): a kill
  * mid-stage-write leaves an uncommitted stage that is discarded and
  * recomputed, and a kill mid-swap leaves survivor rows that exist
  * ONLY in the committed stage — the pending swap is completed before
  * victims are recomputed, after which the replay finds nothing left
  * to erase and rewrites nothing it already rewrote. The
  * kill-and-restart test asserts the drained index answers exactly
  * like an uninterrupted run.
  * Oracle: from-scratch IVF on the reduced corpus (q462's contract) —
  * stream-deleted ≡ rebuilt-without-them, plus the erased-ids audit
  * column pinned 0.
  */
object StreamIvfCdc {

  private final case class Staged(spark: SparkSession, sfDir: String, tmp: String)

  private def baseOf(st: Staged): DataFrame = {
    import st.spark.implicits._
    Tables.embeddings(st.spark, st.sfDir)
      .select($"vec_id", asDouble($"embedding").as("emb"))
      .withColumn("nrm", l2Norm($"emb"))
  }

  private def centOf(st: Staged): DataFrame = {
    import st.spark.implicits._
    baseOf(st).filter($"vec_id".between(2, 9))
      .select($"vec_id".as("cid"), $"emb".as("cemb"), $"nrm".as("cnrm"))
  }

  private def assign(st: Staged, df: DataFrame): DataFrame =
    Tables.fanOut(df, col("vec_id"))
      .crossJoin(broadcast(centOf(st)))
      .withColumn("c", dot(col("emb"), col("cemb")) / (col("nrm") * col("cnrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("c"), -col("cid"))).as("cid"),
        first(col("emb")).as("emb"), first(col("nrm")).as("nrm"))

  private def stage(spark: SparkSession, sfDir: String): Staged = {
    import spark.implicits._
    val st = Staged(spark, sfDir,
      s"${System.getProperty("java.io.tmpdir")}/graft_sivfc_" +
        java.util.UUID.randomUUID.toString.replace("-", ""))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"${st.tmp}/in"))
    // BUILD (batch, epoch 0 = even ids).
    assign(st, baseOf(st).filter($"vec_id" % 2 === 0))
      .withColumn("batch_id", lit(-1L))
      .write.partitionBy("cid", "batch_id").parquet(s"${st.tmp}/ivf")
    // STAGE the CDC feed: two upsert files then one tombstone file —
    // file names order the micro-batches (maxFilesPerTrigger = 1).
    val emb = Tables.embeddings(spark, sfDir)
    val feed = Seq(
      ("cdc_0", emb.filter($"vec_id" % 4 === 1)
        .select(lit("U").as("op"), $"vec_id", $"embedding")),
      ("cdc_1", emb.filter($"vec_id" % 4 === 3)
        .select(lit("U").as("op"), $"vec_id", $"embedding")),
      ("cdc_2", emb.filter($"vec_id" % 7 === 3)
        .select(lit("D").as("op"), $"vec_id",
          lit(null).cast(emb.schema("embedding").dataType).as("embedding"))))
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

  /** Apply one CDC micro-batch to the inverted file. */
  private def applyBatch(st: Staged, batch: DataFrame, batchId: Long): Unit = {
    import st.spark.implicits._
    // Crash recovery FIRST, before anything reads the index: a kill in
    // a previous delete attempt can leave (a) an uncommitted stage
    // (discard it — the replay recomputes) or (b) a committed stage
    // with some partitions' dst deleted but not yet swapped — those
    // survivors exist ONLY in the stage, so the pending swap must
    // complete or the rows are lost AND the replayed stage write would
    // wedge on the leftover dir. See [[graft.Fs.recoverStagedSwap]].
    graft.Fs.recoverStagedSwap(s"${st.tmp}/ivf", s"${st.tmp}/ivf.__cdc_delete_stage")
    val ups = batch.filter(col("op") === "U")
    if (!ups.isEmpty) {
      assign(st, ups
          .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
          .withColumn("nrm", l2Norm(col("emb"))))
        .withColumn("batch_id", lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cid", "batch_id").parquet(s"${st.tmp}/ivf")
    }
    val dels = batch.filter(col("op") === "D").select(col("vec_id"))
    if (!dels.isEmpty) {
      // Victims via the index's own id columns (column-pruned read).
      // Partition-dir values read back as INT — cast for a stable driver type.
      val victims = st.spark.read.parquet(s"${st.tmp}/ivf")
        .join(broadcast(dels), Seq("vec_id"), "left_semi")
        .select($"cid".cast("long"), $"batch_id".cast("long")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      if (victims.nonEmpty) {
        val stage = s"${st.tmp}/ivf.__cdc_delete_stage"
        // Exact (cid, batch_id) victim PAIRS — partition-prunable AND
        // precise, via one In/InSet node (see [[CdcVictims]]; the r09
        // OR-of-literals chain grew the expression tree linearly with
        // victim count, making planning the bottleneck for a large
        // delete sweep). The cross product (cid IN ... AND batch_id IN
        // ...) would also read non-victim partitions that share a cid
        // with one victim and a batch_id with another, staging rows
        // only the swap then discards.
        val pairPred = CdcVictims.pairPredicate("cid", "batch_id",
          victims.toSeq)
        st.spark.read.parquet(s"${st.tmp}/ivf")
          .filter(pairPred)
          .join(broadcast(dels), Seq("vec_id"), "left_anti")
          .write.partitionBy("cid", "batch_id").parquet(stage)
        graft.Fs.swapPartitionDirs(s"${st.tmp}/ivf", stage,
          victims.toSeq.sorted.map { case (c, b) => s"cid=$c/batch_id=$b" })
        graft.Fs.deleteTree(stage)
      }
    }
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

  /** PROBE the CDC-maintained inverted file (q341's shape) plus the
    * erased-ids audit count, severed from tmp state. */
  private def probe(st: Staged): DataFrame = {
    import st.spark.implicits._
    val qv = baseOf(st).filter($"vec_id" === 1)
      .select($"emb".as("qemb"), $"nrm".as("qnrm"))
    val probeCids = centOf(st).crossJoin(broadcast(qv))
      .withColumn("c", dot($"cemb", $"qemb") / ($"cnrm" * $"qnrm"))
      .orderBy($"c".desc, $"cid")
      .limit(2)
      .select($"cid").collect().map(_.getLong(0))
    val left = st.spark.read.parquet(s"${st.tmp}/ivf")
      .filter($"vec_id" % 7 === 3)
      .agg(count(lit(1)).as("n_erased_left"))
    val hits = st.spark.read.parquet(s"${st.tmp}/ivf")
      .filter($"cid".isin(probeCids: _*) && $"vec_id" =!= 1)
      .crossJoin(broadcast(qv))
      .select($"vec_id", $"cid".cast("long").as("cluster_id"),
        round(dot($"emb", $"qemb") / ($"nrm" * $"qnrm"), 4).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id")
      .limit(10)
    graft.queries.Eager(hits.crossJoin(broadcast(left)))
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
      // Post-drain compaction (the delete feed already physically
      // erased its victims, so the member fold is the same
      // pass-through as the append-only maintainer's); the oracle
      // gates the consolidated inverted file.
      StreamIvfMaintain.compact(spark, st.tmp)
      probe(st)
    } finally cleanup(st)
  }

  /** Kill the maintainer once the first streamed partition appears
    * (possibly mid-batch), restart on the SAME checkpoint, drain,
    * probe — upsert replays overwrite their own partitions and delete
    * replays find nothing left to erase, so the answer must equal an
    * uninterrupted run's. */
  def runWithRestart(spark: SparkSession, sfDir: String): DataFrame =
      // r12: per-batch frames here are thousands of rows — exchanges
      // ride the harness's state-volume width (StreamHarness doc).
      StreamHarness.withStreamingPartitions(spark, 8) {
    val st = stage(spark, sfDir)
    try {
      val q1 = writer(st).trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      def streamed(): Boolean = {
        val d = new java.io.File(s"${st.tmp}/ivf")
        d.exists && d.listFiles != null && d.listFiles.exists { cidDir =>
          cidDir.isDirectory && cidDir.listFiles != null &&
            cidDir.listFiles.exists(f => f.getName.startsWith("batch_id=") &&
              !f.getName.endsWith("=-1"))
        }
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
