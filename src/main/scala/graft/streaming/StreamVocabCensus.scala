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

  /** The census store's partition-dir names (`batch_id=N`), the unit
    * both the compactor folds and its manifest records. */
  private def listParts(root: String): Seq[String] =
    Option(new java.io.File(root).listFiles).getOrElse(Array.empty[java.io.File])
      .iterator.filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).toList.sorted

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
    * every step of which is idempotent. Run with the maintainer
    * STOPPED (between stream runs — the maintenance-job shape); probes
    * recover-then-read, so they are safe at any point. */
  private[graft] def compact(spark: SparkSession, tmp: String): Unit = {
    val root = s"$tmp/census"
    val stage = s"$tmp/census.__compact_stage"
    recoverCompaction(root, stage)
    if (stageCompaction(spark, root, stage)) commitCompaction(root, stage)
  }

  /** The staging half of [[compact]], factored so the crash tests can
    * kill between stage and commit. Returns false (staging nothing)
    * when the store is already a single generation. */
  private[graft] def stageCompaction(spark: SparkSession, root: String,
      stage: String): Boolean = {
    import spark.implicits._
    val parts = listParts(root)
    if (parts.length <= 1) false
    else {
      val gen = parts.map(_.stripPrefix("batch_id=").toLong).min - 1L
      spark.read.parquet(root)
        .groupBy($"term").agg(sum($"cnt").as("cnt"))
        .withColumn("batch_id", lit(gen))
        .write.partitionBy("batch_id").parquet(s"$stage/data")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$stage/folded.txt"),
        parts.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$stage/_SUCCESS"))
      true
    }
  }

  /** The commit half of [[compact]]: folded-partition deletes are
    * idempotent, the staged generation moves only while still present
    * under the stage (so a re-run after a mid-commit kill never
    * deletes an already-moved generation), and the stage tree goes
    * last. */
  private def commitCompaction(root: String, stage: String): Unit = {
    val manifest = java.nio.file.Paths.get(s"$stage/folded.txt")
    val folded =
      if (java.nio.file.Files.exists(manifest))
        new String(java.nio.file.Files.readAllBytes(manifest),
          java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toList
      else Nil
    folded.foreach(n => graft.Fs.deleteTree(s"$root/$n"))
    listParts(s"$stage/data").foreach(n =>
      graft.Fs.swapPartitionDirs(root, s"$stage/data", Seq(n)))
    graft.Fs.deleteTree(stage)
  }

  /** Crash recovery for an interrupted [[compact]] — the
    * [[graft.Fs.recoverStagedSwap]] contract specialized to the
    * manifested fold: no stage → no-op; a stage without the TOP-LEVEL
    * `_SUCCESS` marker is garbage (discard — the store never lost a
    * row); a committed stage re-runs the idempotent commit. Readers
    * ([[mergedCensus]]) call this before listing the store. */
  private[graft] def recoverCompaction(root: String, stage: String): Unit = {
    val sp = java.nio.file.Paths.get(stage)
    if (java.nio.file.Files.exists(sp)) {
      if (java.nio.file.Files.exists(sp.resolve("_SUCCESS")))
        commitCompaction(root, stage)
      else graft.Fs.deleteTree(stage)
    }
  }

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

  def runOnce(spark: SparkSession, sfDir: String): DataFrame = {
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
  def runWithRestart(spark: SparkSession, sfDir: String): DataFrame = {
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
