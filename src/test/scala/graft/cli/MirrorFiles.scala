package graft.cli

import java.nio.file.{Files, Path}

/** Shared mirror-measurement primitives for the landing/lease specs:
  * the byte-untouched delta invariant is asserted through ONE
  * snapshot rule (visible data files only, relative path → mtime), so
  * a future change to the hidden-file skip can't leave one spec
  * pinning a weaker invariant than the other.
  */
object MirrorFiles {

  /** Recursive data-file snapshot: relative path -> mtime. */
  def fileSnapshot(dir: Path): Map[String, Long] = {
    if (!Files.exists(dir)) return Map.empty
    val out = scala.collection.mutable.Map.empty[String, Long]
    def walk(p: Path): Unit = {
      val n = p.getFileName.toString
      if (n.startsWith("_") || n.startsWith(".")) return
      if (Files.isDirectory(p)) Files.list(p).forEach(walk)
      else out(dir.relativize(p).toString) = Files.getLastModifiedTime(p).toMillis
    }
    Files.list(dir).forEach(walk)
    out.toMap
  }

  def deleteRec(p: Path): Unit = {
    if (Files.isDirectory(p)) Files.list(p).forEach(c => deleteRec(c))
    Files.deleteIfExists(p); ()
  }
}
