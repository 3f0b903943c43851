package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Versioned model-artifact store — the lifecycle discipline
  * [[graft.streaming.StreamManifest]] gives the corpus manifests,
  * applied to trained models: through round 10 the IVF/PQ/BPE artifacts
  * were single-version overwrites, so a bad write DESTROYED the only
  * good copy. Every model now writes to a fresh `v=<n>` directory and
  * becomes visible only when its `_COMMITTED` marker lands (the
  * `_SUCCESS`-marker commit protocol); readers take the newest
  * committed version that passes the model's own manifest validation,
  * so a torn or corrupted write is simply skipped and the previous
  * version keeps serving — the rollback proof in ModelStoreSpec.
  * Retention keeps the newest [[Keep]] committed versions (plus the
  * torn tails newer than them, which the next write's prune sweeps once
  * they are older than a committed successor).
  *
  * Scale: everything here is model-bounded metadata IO (a directory
  * listing plus artifact files ∝ model size, never corpus). Version
  * allocation is JVM-synchronized — the local-mode stand-in for the
  * object-store conditional-put a cluster deployment would use; the
  * on-disk layout (immutable version dirs + marker files) is exactly
  * the layout that protocol needs. */
object ModelStore {

  /** Committed versions retained after each write. */
  val Keep = 3

  private val CommitMarker = "_COMMITTED"
  private val VRe = "^v=(\\d+)$".r

  private def versionOf(p: Path): Option[Int] =
    p.getFileName.toString match {
      case VRe(n) => Some(n.toInt)
      case _ => None
    }

  private def versionDirs(base: String): Seq[(Int, Path)] = {
    val root = Paths.get(base)
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val s = Files.list(root)
      try s.iterator().asScala.toSeq
        .flatMap(p => versionOf(p).map(_ -> p)).sortBy(_._1)
      finally s.close()
    }
  }

  private def isCommitted(p: Path): Boolean =
    Files.exists(p.resolve(CommitMarker))

  /** Committed versions, ascending. */
  def committedVersions(base: String): Seq[Int] =
    versionDirs(base).filter(v => isCommitted(v._2)).map(_._1)

  /** Path of a version directory (exists or not). */
  def versionPath(base: String, v: Int): String = s"$base/v=$v"

  /** Write a new version: allocate max+1 (torn dirs included — a
    * version number is never reused), run the writer into the fresh
    * directory, then commit via the marker file and prune. Returns the
    * committed version number. */
  def write(base: String, writer: String => Unit): Int = synchronized {
    val next = versionDirs(base).lastOption.map(_._1 + 1).getOrElse(1)
    val dir = Paths.get(versionPath(base, next))
    Files.createDirectories(dir)
    writer(dir.toString)
    Files.createFile(dir.resolve(CommitMarker))
    prune(base)
    next
  }

  /** Newest committed version whose content passes `validate` (which
    * must return false — or throw — on a corrupt artifact). A version
    * that fails validation is skipped, NOT deleted: it is evidence, and
    * retention will age it out. */
  def latestValid(base: String,
                  validate: String => Boolean): Option[(Int, String)] =
    versionDirs(base).reverseIterator
      .filter(v => isCommitted(v._2))
      .map { case (v, p) => (v, p.toString) }
      .find { case (_, p) =>
        try validate(p)
        catch { case scala.util.control.NonFatal(_) => false }
      }

  /** Keep the newest [[Keep]] committed versions; delete older
    * committed ones and any uncommitted (torn) directory older than the
    * newest committed version. */
  private def prune(base: String): Unit = {
    val dirs = versionDirs(base)
    val committed = dirs.filter(v => isCommitted(v._2)).map(_._1)
    if (committed.nonEmpty) {
      val keepFrom = committed.takeRight(Keep).head
      val newestCommitted = committed.last
      dirs.foreach { case (v, p) =>
        val drop =
          if (isCommitted(p)) v < keepFrom
          else v < newestCommitted
        if (drop) deleteRecursively(p)
      }
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.iterator().asScala.toSeq.reverseIterator
        .foreach(Files.deleteIfExists(_))
      finally s.close()
    }
}
