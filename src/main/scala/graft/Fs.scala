package graft

import java.nio.file.{Files, Path}

/** The one recursive temp-tree delete (exists-guarded so finally blocks
  * stay safe even when the failing code never created the tree). Every
  * scratch-dir consumer — ETL round-trips, partitioned-write queries,
  * streaming checkpoints/sinks, test fixtures — goes through here; the
  * previous five hand copies had already drifted on the exists guard.
  */
object Fs {
  def deleteTree(root: Path): Unit =
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }

  def deleteTree(root: String): Unit = deleteTree(java.nio.file.Paths.get(root))

  /** Swap rewritten partition directories into an index tree: for each
    * partition dir name (e.g. "cid=3", "tb=7"), drop `root/name` and
    * move `stage/name` into its place — one O(1) rename per affected
    * partition, the file-commit shape of a deletion's dynamic-partition
    * overwrite (Spark refuses to overwrite a path it reads, so deletes
    * stage survivors first and swap after). A partition whose every row
    * was erased has no staged dir — the delete alone removes it. Dirs
    * NOT named are never touched (the audit pins them byte-identical). */
  def swapPartitionDirs(root: String, stage: String, names: Seq[String]): Unit =
    names.foreach { name =>
      val dst = java.nio.file.Paths.get(s"$root/$name")
      val src = java.nio.file.Paths.get(s"$stage/$name")
      deleteTree(dst)
      if (Files.exists(src)) {
        // Multi-level partition names (e.g. "cid=3/batch_id=1") can
        // target a parent dir that no longer exists — when the victim
        // was its cid's only batch, or during crash recovery.
        Files.createDirectories(dst.getParent)
        Files.move(src, dst)
        ()
      }
    }

  /** The leaf partition dirs under `base` as relative names — public
    * face of [[leafPartDirs]] for the compaction protocol
    * ([[graft.streaming.StoreCompaction]]), which must enumerate a
    * store's `batch_id=N` leaves at ANY partition depth (top-level for
    * batch-first layouts, "cid=3/batch_id=7" for cluster-first). Empty
    * when `base` does not exist. */
  def leafPartitionDirs(base: String): Seq[String] = {
    val p = java.nio.file.Paths.get(base)
    if (Files.isDirectory(p)) leafPartDirs(p, p) else Nil
  }

  /** The partition dirs staged under `base`: every directory reached
    * through `name=value` components only, deepest level (e.g.
    * "cid=3/batch_id=1"), relative to `base`. */
  private def leafPartDirs(base: Path, p: Path): Seq[String] = {
    val kids = {
      val l = Files.list(p)
      try {
        val buf = scala.collection.mutable.ListBuffer[Path]()
        l.forEach(k => { buf += k; () })
        buf.toList
      } finally l.close()
    }
    val sub = kids.filter(k =>
      Files.isDirectory(k) && k.getFileName.toString.contains("="))
    if (sub.nonEmpty) sub.flatMap(leafPartDirs(base, _)).sorted
    else if (p == base) Nil
    else Seq(base.relativize(p).toString)
  }

  /** Crash-recovery for an interrupted stage-and-swap delete: a kill
    * can land (a) mid-stage-write — the stage tree exists but carries
    * no `_SUCCESS`, so it is garbage and the replay must recompute from
    * the intact index; or (b) mid-swap — the stage is committed and
    * some partitions' `deleteTree(dst)` already ran without the
    * matching move, which would PERMANENTLY lose those partitions'
    * survivor rows (the replay finds no victims there, so nothing would
    * restore them). This completes case (b) by swapping in every
    * partition dir still present under the committed stage (per-name
    * the swap re-runs `deleteTree(dst)` first, so a half-processed name
    * converges to the staged survivors; names whose swap finished are
    * gone from the stage and untouched), then removes the stage tree in
    * both cases so the replay's fresh stage write cannot collide.
    * Idempotent; no-op when no stage exists. Callers run it BEFORE
    * reading the index they are about to delete from. */
  def recoverStagedSwap(root: String, stage: String): Unit = {
    val sp = java.nio.file.Paths.get(stage)
    if (Files.exists(sp)) {
      if (Files.exists(sp.resolve("_SUCCESS")))
        swapPartitionDirs(root, stage, leafPartDirs(sp, sp))
      deleteTree(sp)
    }
  }
}
