package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.Tables

/** Streaming MAINTENANCE of the vocabulary census (q500 — q499's
  * tokenizer-planning table kept current by ingest instead of rebuilt
  * per release): epoch-0 documents build the per-term census in batch,
  * then epoch-1 documents arrive as a rate-limited file stream and
  * every micro-batch appends its own (term, cnt) partial census —
  * ADDITIVE, which is the whole design: term counts merge by sum, so a
  * probe reads merged state without locking writers and the maintainer
  * never rewrites old partitions (contrast the CDC index families,
  * whose delete verb must rewrite).
  *
  * Restart safety (`foreachBatch` is at-least-once): census rows carry
  * COUNT MASS, so a replayed plain append would double-count — every
  * per-batch write lands under the batch's OWN `batch_id` partition
  * with dynamic-partition OVERWRITE (the q372/q492 meta rule): a
  * replay replaces its previous, possibly partial, output.
  *
  * At 100 TB this is the vocabulary table a BPE trainer (q463) reads:
  * per-batch partials are vocabulary-sized (map-side combined before
  * the write), the merge is one sum-aggregate over hash-partitioned
  * term keys, and nothing is ever corpus-quadratic. The one cost the
  * additive path accrues is PARTITION COUNT — [[compact]] periodically
  * folds the batch partials into a consolidated generation (staged,
  * manifested, crash-safe), so the probe reads O(generations) leaf
  * dirs, not O(batches). Oracle: the Zipf head + totals computed from
  * scratch over the full corpus — stream-maintained ≡ rebuilt, with
  * the compacted store in the loop. */
object StreamVocabCensus {

  private final case class Staged(spark: SparkSession, sfDir: String, tmp: String)

  private def termCounts(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(explode(filter(graft.functions.TextFns.tokens($"text"),
        t => char_length(t) > 0)).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("cnt"))
  }

  private[graft] def writeBatchTo(tmp: String, docs: DataFrame,
      batchId: Long): Unit = {
    termCounts(docs)
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$tmp/census")
  }

  /** Epoch-0 batch build + epoch-1 files staged into the stream inbox
    * (the q492 staging shape: even ids batch, odd ids in two files). */
  private def stage(spark: SparkSession, sfDir: String): Staged = {
    import spark.implicits._
    val st = Staged(spark, sfDir,
      s"${System.getProperty("java.io.tmpdir")}/graft_svocab_" +
        java.util.UUID.randomUUID.toString.replace("-", "").take(12))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"${st.tmp}/in"))
    writeBatchTo(st.tmp,
      Tables.fanOut(Tables.documents(spark, sfDir), col("doc_id"))
        .filter($"doc_id" % 2 === 0)
        .select($"doc_id", $"text"),
      batchId = -1L)
    Seq($"doc_id" % 4 === 1, $"doc_id" % 4 === 3).zipWithIndex.foreach {
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
        writeBatchTo(st.tmp, batch, batchId)
      }
      .option("checkpointLocation", s"${st.tmp}/ckpt")
  }

  /** Census-store COMPACTION (round-10 verdict ask #5: purely additive
    * is the right WRITE path, but one `batch_id=N` partition per
    * micro-batch forever makes the partition count itself the probe's
    * read bottleneck at production batch rates). Folds every committed
    * partition into ONE consolidated GENERATION partition whose id is
    * `min(existing) − 1` — strictly more negative each compaction, so a
    * generation can never collide with a stream batch id (≥ 0) or the
    * epoch-0 build (−1), and a post-compaction replayed stream batch
    * still lands in its own fresh partition. The probe's merged answer
    * is invariant (term counts merge by sum — folding is just
    * pre-aggregation), and the store drops from O(batches) to
    * O(generations) leaf dirs (pinned in PlanAuditSpec).
    *
    * Commit protocol (the staged-swap discipline of the index families,
    * extended with a fold MANIFEST because here the swap must DELETE
    * partitions that have no staged replacement): stage the merged
    * census under `stage/data`, write the folded partition names to
    * `stage/folded.txt`, then mark `stage/_SUCCESS` LAST; commit =
    * delete folded partitions, move the staged generation in, drop the
    * stage. A kill mid-stage leaves no marker → [[recoverCompaction]]
    * discards the garbage stage (the store is intact — Spark's own
    * `data/_SUCCESS` lives a level deeper and never commits the fold);
    * a kill mid-commit leaves the marker → recovery re-runs the commit,
    * every step of which is idempotent. Run with the maintainer AND
    * the probes stopped (between stream runs — the maintenance-job
    * shape): probes recover-then-read, which makes them safe at any
    * point EXCEPT concurrent with a live compact() — recovery treats a
    * stage without the top-level marker as a crashed compaction's
    * garbage and deletes it, so a probe racing a mid-stage compactor
    * would pull the in-flight stage out from under it (the fold then
    * fails on the missing dir; no data is lost, but the compaction
    * must be re-run). The quiesce window is per-STORE and seconds
    * long; at 100 TB the same rule is "one compactor at a time, probes
    * drain around it", the standard maintenance-window contract. */
  private[graft] def compact(spark: SparkSession, tmp: String): Unit = {
    StoreCompaction.compact(spark, s"$tmp/census", foldWrite)
    ()
  }

  /** The census FOLD for [[StoreCompaction]]: term counts merge by
    * sum, so the consolidated generation is just the pre-aggregated
    * census. */
  private def foldWrite(all: DataFrame, gen: Long, out: String): Unit = {
    import all.sparkSession.implicits._
    all.groupBy($"term").agg(sum($"cnt").as("cnt"))
      .withColumn("batch_id", lit(gen))
      .write.partitionBy("batch_id").parquet(out)
  }

  /** The staging half of [[compact]], kept as the crash tests' kill
    * point between stage and commit (protocol in [[StoreCompaction]]). */
  private[graft] def stageCompaction(spark: SparkSession, root: String,
      stage: String): Boolean =
    StoreCompaction.stageCompaction(spark, root, stage, foldWrite)

  /** Crash recovery for an interrupted [[compact]] — now the shared
    * [[StoreCompaction.recover]]: no stage → no-op; a stage without
    * the TOP-LEVEL `_SUCCESS` marker is garbage (discard — the store
    * never lost a row); a committed stage re-runs the idempotent
    * commit. Readers ([[mergedCensus]]) call this before listing the
    * store — which is only safe because [[compact]]'s contract
    * quiesces probes for its window: against a LIVE mid-stage
    * compactor the no-marker branch would discard the in-flight stage
    * (see [[compact]]'s doc). */
  private[graft] def recoverCompaction(root: String, stage: String): Unit =
    StoreCompaction.recover(root, stage)

  /** Recover-then-read of the maintained store, merged to per-term
    * totals: the frame every probe aggregates from, factored so the
    * O(generations) scan pin can capture its plan. */
  private[graft] def mergedCensus(spark: SparkSession, tmp: String): DataFrame = {
    import spark.implicits._
    recoverCompaction(s"$tmp/census", s"$tmp/census.__compact_stage")
    spark.read.parquet(s"$tmp/census")
      .groupBy($"term").agg(sum($"cnt").as("freq"))
  }

  /** Zipf head + totals from the maintained partials alone — the q500
    * readout, byte-identical to a from-scratch census of the full
    * corpus. Severed from tmp state before cleanup. */
  private def probe(st: Staged): DataFrame = {
    import st.spark.implicits._
    val merged = mergedCensus(st.spark, st.tmp)
    val totals = merged.agg(count(lit(1)).as("n_types"),
      sum($"freq").as("n_tokens"),
      sum(when($"freq" === 1L, 1L).otherwise(0L)).as("n_hapax"))
    // Top-10 FIRST via orderBy+limit (per-partition heaps + driver
    // merge — TakeOrderedAndProject), THEN the rank window over the
    // 10 surviving rows: a bare global row_number window would sort
    // the whole vocabulary through one partition.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"freq".desc, $"term")
    graft.queries.Eager(merged
      .orderBy($"freq".desc, $"term").limit(10)
      .withColumn("rank", row_number().over(w))
      .crossJoin(broadcast(totals))
      .select($"rank", $"term", $"freq", $"n_types", $"n_tokens", $"n_hapax")
      .orderBy($"rank"))
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
      // Maintenance-job compaction with the maintainer drained: the
      // probe below answers from the CONSOLIDATED store, so the oracle
      // gates the whole lifecycle (build → stream → compact → probe),
      // not just the additive half.
      compact(spark, st.tmp)
      probe(st)
    } finally cleanup(st)
  }

  /** Kill after the first streamed batch partition commits, restart on
    * the SAME checkpoint, drain, probe: the replayed batch dynamically
    * overwrites its own batch_id partition, so the drained census must
    * answer exactly like an uninterrupted run. */
  def runWithRestart(spark: SparkSession, sfDir: String): DataFrame =
      // r12: per-batch frames here are thousands of rows — exchanges
      // ride the harness's state-volume width (StreamHarness doc).
      StreamHarness.withStreamingPartitions(spark, 8) {
    val st = stage(spark, sfDir)
    try {
      val q1 = writer(st).trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      def streamed(): Boolean = {
        val fs = Option(new java.io.File(s"${st.tmp}/census").listFiles)
          .getOrElse(Array.empty[java.io.File])
        fs.iterator.map(_.getName).filter(_.startsWith("batch_id="))
          .flatMap(n =>
            scala.util.Try(n.stripPrefix("batch_id=").toLong).toOption)
          .exists(_ >= 0L)
      }
      while (!streamed() && q1.isActive && System.nanoTime() < deadline)
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
