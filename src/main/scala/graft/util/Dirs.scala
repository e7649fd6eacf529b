package graft.util

import java.nio.file.{Files, Path}

/** Filesystem helpers shared across the engine's driver-side metadata code. */
object Dirs {

  /** List a directory's entries eagerly, closing the underlying stream
    * (a bare `Files.list` leaks a file descriptor if the stream is never
    * closed — fatal on a driver that merges once per micro-batch for days).
    * Missing directories list as empty.
    */
  def listDir(p: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(p)) Nil
    else scala.util.Using.resource(Files.list(p))(_.iterator().asScala.toSeq)
  }

  /** Recursive delete (best-effort; missing paths are fine). */
  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
