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
      if (Files.exists(src)) Files.move(src, dst)
    }
}
