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
}
