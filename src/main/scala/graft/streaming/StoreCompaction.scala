package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The staged-manifest COMPACTION protocol, factored out of
  * [[StreamVocabCensus]] (whose round-11 fold proved the discipline)
  * so every stream-maintained artifact can fold its per-batch slivers
  * — the round-11 verdict's ask #3: the census store had the
  * compaction, the chunk store and the LSH/IVF/BM25 maintainers still
  * accumulated one `batch_id=N` partition per micro-batch forever,
  * which at production batch rates makes the PARTITION COUNT itself
  * the probe's read bottleneck.
  *
  * The protocol (per store table): fold every committed partition into
  * ONE consolidated GENERATION whose batch id is `min(existing) − 1` —
  * strictly more negative each compaction, so a generation can never
  * collide with a stream batch id (≥ 0) or the epoch-0 build (−1), and
  * a post-compaction replayed stream batch still lands in its own
  * fresh partition. What "fold" means is the STORE's business — the
  * caller supplies `stageWrite(allRows, gen, outDir)`:
  *  - additive count/mass tables (census terms, BM25 df/globals, LSH
  *    bucket meta) re-AGGREGATE: rows merge by sum, and the negative
  *    epoch rows a CDC delete wrote fold right in (the merge-on-read
  *    sum the probes already do — folding is just pre-aggregation);
  *  - row-identity tables (chunk rows, BM25 postings, IVF members)
  *    PASS THROUGH under the generation id, keeping their secondary
  *    partition/bucket columns so probe pruning composes unchanged.
  *
  * Commit protocol (the index families' staged-swap discipline,
  * extended with a fold MANIFEST because the swap must DELETE
  * partitions that have no staged replacement): stage the folded data
  * under `stage/data`, write the folded leaf-partition names to
  * `stage/folded.txt`, then mark `stage/_SUCCESS` LAST; commit =
  * delete folded partitions, move the staged generation in (two-level
  * leaves like `cid=3/batch_id=-2` move per-leaf), drop the stage. A
  * kill mid-stage leaves no marker → [[recover]] discards the garbage
  * stage (the store is intact — Spark's own `data/_SUCCESS` lives a
  * level deeper and never commits the fold); a kill mid-commit leaves
  * the marker → recovery re-runs the commit, every step of which is
  * idempotent. Run with the maintainer AND the probes stopped
  * (between stream runs — the maintenance-job shape): probes
  * recover-then-read, which is safe at any point EXCEPT concurrent
  * with a live compaction, whose unmarked stage recovery would
  * discard (the [[StreamVocabCensus]] quiesce contract, shared by
  * every store on this protocol). */
object StoreCompaction {

  /** The store's conventional stage path beside its table dir. */
  def stageDirFor(root: String): String = s"$root.__compact_stage"

  /** The batch ids present in `root`'s leaf partitions, wherever the
    * `batch_id=` level sits in the layout (`batch_id=N`,
    * `batch_id=N/hb=M`, or `cid=X/batch_id=N`). */
  private[graft] def batchIds(root: String): Seq[Long] =
    graft.Fs.leafPartitionDirs(root).iterator
      .flatMap(_.split('/').find(_.startsWith("batch_id=")))
      .flatMap(n => scala.util.Try(n.stripPrefix("batch_id=").toLong).toOption)
      .toSeq.distinct

  /** Recover-stage-commit in one call; true iff a fold committed.
    * No-ops (false) when the store already holds a single batch id —
    * including a store that is one consolidated generation. */
  def compact(spark: SparkSession, root: String,
      stageWrite: (DataFrame, Long, String) => Unit): Boolean = {
    val stage = stageDirFor(root)
    recover(root, stage)
    val staged = stageCompaction(spark, root, stage, stageWrite)
    if (staged) commitCompaction(root, stage)
    staged
  }

  /** The staging half, factored so crash tests can kill between stage
    * and commit. Returns false (staging nothing) when the store is
    * already a single generation. */
  private[graft] def stageCompaction(spark: SparkSession, root: String,
      stage: String, stageWrite: (DataFrame, Long, String) => Unit): Boolean = {
    val ids = batchIds(root)
    if (ids.length <= 1) false
    else {
      val gen = ids.min - 1L
      stageWrite(spark.read.parquet(root), gen, s"$stage/data")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$stage/folded.txt"),
        graft.Fs.leafPartitionDirs(root).sorted.mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$stage/_SUCCESS"))
      true
    }
  }

  /** The commit half: folded-partition deletes are idempotent, the
    * staged generation moves only while still present under the stage
    * (so a re-run after a mid-commit kill never deletes an
    * already-moved generation), and the stage tree goes last. */
  private[graft] def commitCompaction(root: String, stage: String): Unit = {
    val manifest = java.nio.file.Paths.get(s"$stage/folded.txt")
    val folded =
      if (java.nio.file.Files.exists(manifest))
        new String(java.nio.file.Files.readAllBytes(manifest),
          java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toList
      else Nil
    val rootP = java.nio.file.Paths.get(root)
    folded.foreach { n =>
      graft.Fs.deleteTree(s"$root/$n")
      // Prune now-empty ancestors: a two-level leaf (batch_id=K/hb=M)
      // leaves its batch_id=K shell behind, which would read as a
      // phantom generation in the store listing.
      var parent = java.nio.file.Paths.get(s"$root/$n").getParent
      var empty = true
      while (empty && parent != null && parent != rootP &&
          java.nio.file.Files.isDirectory(parent)) {
        val l = java.nio.file.Files.list(parent)
        empty = try !l.findFirst.isPresent finally l.close()
        if (empty) {
          java.nio.file.Files.delete(parent)
          parent = parent.getParent
        }
      }
    }
    graft.Fs.swapPartitionDirs(root, s"$stage/data",
      graft.Fs.leafPartitionDirs(s"$stage/data"))
    graft.Fs.deleteTree(stage)
  }

  /** Crash recovery for an interrupted [[compact]]: no stage → no-op;
    * a stage without the TOP-LEVEL `_SUCCESS` marker is a crashed
    * staging's garbage (discard — the store never lost a row); a
    * committed stage re-runs the idempotent commit. Readers call this
    * before listing the store (see the object doc for the
    * probe-quiesce caveat). */
  def recover(root: String, stage: String): Unit = {
    val sp = java.nio.file.Paths.get(stage)
    if (java.nio.file.Files.exists(sp)) {
      if (java.nio.file.Files.exists(sp.resolve("_SUCCESS")))
        commitCompaction(root, stage)
      else graft.Fs.deleteTree(stage)
    }
  }
}
