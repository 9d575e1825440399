package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.Tables

/** Streaming MAINTENANCE of the RAG chunk store (q492) — q491's
  * sliding-window chunker run as continuous ingest, the fourth
  * stream-maintained artifact beside the LSH/IVF/BM25 index families
  * (q372/q375/q479): epoch-0 documents build the chunk table in batch,
  * then epoch-1 documents arrive as a rate-limited file stream and
  * every micro-batch appends its (doc_id, lang, chunk-hash) rows,
  * hash-bucketed by `hb = xxhash64(h) mod 16` — the layout a
  * dedup-on-arrival probe partition-prunes against (bucket of the
  * incoming chunk's hash → one 1/16 slice read, however many batches
  * the stream has appended).
  *
  * Restart safety (`foreachBatch` is at-least-once): chunk rows carry
  * count mass (the census sums them), so a replayed append would
  * double-count — every per-batch write therefore lands under the
  * batch's OWN `batch_id` partition with dynamic-partition OVERWRITE
  * (the q372 meta rule): a replay replaces its previous, possibly
  * partial, output. The per-batch doc-census table rides the same
  * rule. The kill-and-restart test pins drained ≡ uninterrupted.
  *
  * At 100 TB this is the ingestion half of a RAG corpus: chunkers
  * append partition-locally with replay-idempotent commits, the
  * boilerplate census (and any dedup probe) reads merged state without
  * locking the writers. Oracle: q491's from-scratch census over the
  * full corpus — the stream-maintained store must answer identically
  * to a batch rebuild.
  */
object StreamChunkStore {

  private[streaming] val NB = 16 // chunk-hash buckets

  private final case class Staged(spark: SparkSession, sfDir: String, tmp: String)

  private[graft] def writeBatchTo(tmp: String, docs: DataFrame,
      batchId: Long): Unit = {
    import docs.sparkSession.implicits._
    graft.queries.TextMedia.chunkRows(docs)
      .withColumn("hb", pmod(xxhash64($"h"), lit(NB)))
      .withColumn("batch_id", lit(batchId))
      .repartition($"hb")
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "hb").parquet(s"$tmp/chunks")
    docs.groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$tmp/docs")
  }

  /** Epoch-0 batch build + epoch-1 files staged into the stream inbox. */
  private def stage(spark: SparkSession, sfDir: String): Staged = {
    import spark.implicits._
    val st = Staged(spark, sfDir,
      s"${System.getProperty("java.io.tmpdir")}/graft_schunk_" +
        java.util.UUID.randomUUID.toString.replace("-", "").take(12))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"${st.tmp}/in"))
    writeBatchTo(st.tmp,
      Tables.fanOut(Tables.documents(spark, sfDir), col("doc_id"))
        .filter($"doc_id" % 2 === 0)
        .select($"doc_id", $"lang", $"text"),
      batchId = -1L)
    Seq($"doc_id" % 4 === 1, $"doc_id" % 4 === 3).zipWithIndex.foreach {
      case (pred, i) =>
        val stg = s"${st.tmp}/stage_$i"
        Tables.documents(spark, sfDir).filter(pred)
          .select($"doc_id", $"lang", $"text")
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
        writeBatchTo(st.tmp, batch, batchId)
      }
      .option("checkpointLocation", s"${st.tmp}/ckpt")
  }

  /** Chunk-store COMPACTION — the census store's staged-manifest fold
    * applied verbatim (round-11 verdict ask #3: this store is PURELY
    * ADDITIVE, so the [[StoreCompaction]] protocol needs no new
    * semantics): chunk rows keep their identity — the census COUNTS
    * rows, so the fold is a pass-through rewrite under one generation
    * that keeps the `hb` bucket level (probe pruning composes
    * unchanged: one generation × one bucket instead of O(batches)
    * buckets) — and the per-batch doc census folds by sum. Run with
    * the maintainer and probes stopped (the shared quiesce contract). */
  /** The chunk-row fold: pass-through under the generation, keeping
    * the hb bucket level so probe pruning composes unchanged. */
  private[graft] def chunksFold(all: DataFrame, gen: Long, out: String): Unit =
    all.drop("batch_id").withColumn("batch_id", lit(gen))
      .repartition(col("hb"))
      .write.partitionBy("batch_id", "hb").parquet(out)

  /** The doc-census fold: counts merge by sum. */
  private[graft] def docsFold(all: DataFrame, gen: Long, out: String): Unit =
    all.groupBy(col("lang")).agg(sum(col("n_docs")).as("n_docs"))
      .withColumn("batch_id", lit(gen))
      .write.partitionBy("batch_id").parquet(out)

  private[graft] def compact(spark: SparkSession, tmp: String): Unit = {
    StoreCompaction.compact(spark, s"$tmp/chunks", chunksFold)
    StoreCompaction.compact(spark, s"$tmp/docs", docsFold)
    ()
  }

  private def recoverBoth(tmp: String): Unit =
    Seq(s"$tmp/chunks", s"$tmp/docs").foreach(r =>
      StoreCompaction.recover(r, StoreCompaction.stageDirFor(r)))

  /** Dedup-on-arrival probe — the read path the hb bucketing exists
    * for: all stored chunk rows in the bucket of the incoming chunk's
    * hash. The predicate references only the `hb` partition column
    * (the bucket id folds to a constant for a literal hash), so every
    * batch partition's other NB−1 buckets are pruned at planning time:
    * a 1/16 slice read, however many batches the stream has appended —
    * and after [[compact]], O(generations) leaf dirs total. Pinned by
    * PlanAuditSpec against a live store layout. Recovers any
    * interrupted compaction before reading. */
  def bucketProbe(spark: SparkSession, storeTmp: String,
      chunkHash: org.apache.spark.sql.Column): DataFrame = {
    StoreCompaction.recover(s"$storeTmp/chunks",
      StoreCompaction.stageDirFor(s"$storeTmp/chunks"))
    spark.read.parquet(s"$storeTmp/chunks")
      .filter(col("hb") === pmod(xxhash64(chunkHash), lit(NB)))
  }

  /** The q491 census computed from the maintained files alone —
    * byte-identical readout to a from-scratch batch chunking of the
    * full corpus. Severed from tmp state before cleanup. */
  private def probe(st: Staged): DataFrame = {
    import st.spark.implicits._
    recoverBoth(st.tmp)
    val ch = st.spark.read.parquet(s"${st.tmp}/chunks")
      .select($"doc_id", $"lang", $"h")
    val dc = st.spark.read.parquet(s"${st.tmp}/docs")
      .groupBy($"lang").agg(sum($"n_docs").as("n_docs"))
    graft.queries.Eager(graft.queries.TextMedia.chunkCensus(ch, dc))
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
      // Maintenance-job compaction with the maintainer drained (the
      // q500 lifecycle rule): the probe answers from the CONSOLIDATED
      // store, so the oracle gates build → stream → compact → probe.
      compact(spark, st.tmp)
      probe(st)
    } finally cleanup(st)
  }

  /** Kill the maintainer once the first streamed batch partition
    * appears (possibly mid-batch — chunks written, doc census
    * missing), restart on the SAME checkpoint, drain, probe: every
    * replayed write dynamically overwrites its own batch_id partition,
    * so the drained store must answer exactly like an uninterrupted
    * run. */
  def runWithRestart(spark: SparkSession, sfDir: String): DataFrame =
      // r12: per-batch frames here are thousands of rows — exchanges
      // ride the harness's state-volume width (StreamHarness doc).
      StreamHarness.withStreamingPartitions(spark, 8) {
    val st = stage(spark, sfDir)
    try {
      val q1 = writer(st).trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      // Streamed (id >= 0) batch partitions present under a store table,
      // parsed NUMERICALLY — the r09 string test (startsWith/endsWith)
      // could not distinguish a fully-committed batch from the
      // partial-commit window this test exists to replay.
      def batchIds(sub: String): Set[Long] = {
        val fs = Option(new java.io.File(s"${st.tmp}/$sub").listFiles)
          .getOrElse(Array.empty[java.io.File])
        fs.iterator.map(_.getName).filter(_.startsWith("batch_id="))
          .flatMap(n =>
            scala.util.Try(n.stripPrefix("batch_id=").toLong).toOption)
          .filter(_ >= 0L).toSet
      }
      // The kill AIMS for the mid-batch window — chunk rows committed,
      // the batch's doc census not yet (writeBatchTo commits chunks
      // first): a streamed chunks partition with no matching census
      // partition. Falling through to "every staged file fully
      // committed" keeps the test bounded if both commits always land
      // between polls — the restart then replays from a clean seam,
      // the weaker but still valid exactly-once check.
      def midBatch(): Boolean = (batchIds("chunks") -- batchIds("docs")).nonEmpty
      def allDone(): Boolean = {
        val c = batchIds("chunks")
        c.size >= 2 && c.subsetOf(batchIds("docs"))
      }
      while (!midBatch() && !allDone() && q1.isActive &&
          System.nanoTime() < deadline)
        Thread.sleep(1)
      q1.stop()
      try q1.awaitTermination()
      catch { case scala.util.control.NonFatal(_) => () }
      val q2 = writer(st).trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
      probe(st)
    } finally cleanup(st)
  }
}
