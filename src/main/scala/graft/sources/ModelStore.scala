package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

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
  * Retention keeps the newest [[Keep]] committed versions; torn
  * (uncommitted) directories are swept only once they fall BELOW the
  * oldest retained committed version — an uncommitted number inside the
  * retained window may be a concurrent writer mid-write.
  *
  * All IO goes through the Hadoop [[FileSystem]] API, resolved per base
  * URI from the active Spark session's Hadoop conf — so the SAME store
  * serves a bare local path, a `file:///` URI, or the HDFS/object-store
  * paths a cluster's artifacts actually live on (the round-11
  * `java.nio.file` implementation silently saw an empty directory
  * there). Everything here is model-bounded metadata IO (a directory
  * listing plus artifact files ∝ model size, never corpus).
  *
  * Concurrency: version allocation claims its number with an ATOMIC
  * create-exclusive of the version's [[AllocMarker]]
  * (`FileSystem.create(…, overwrite = false)` — the conditional-put
  * primitive; two writers racing the same number see exactly one
  * winner, the loser retries at the next number). Within a JVM, writers
  * AND readers serialize on the object monitor so a reader's
  * list-validate walk can never race a concurrent prune deleting an
  * aged version mid-iteration. */
object ModelStore {

  /** Committed versions retained after each write. */
  val Keep = 3

  /** Deterministic per-(family, corpus-dir) artifact base under the
    * build dir — THE single statement of the local artifact layout,
    * shared by every model family (a layout change, e.g. a configurable
    * cluster base, lands once here). */
  def modelDir(family: String, dir: String): String = {
    val name = new java.io.File(dir).getName
    s"target/$family/${name}_${Integer.toHexString(dir.hashCode)}"
  }

  private val CommitMarker = "_COMMITTED"
  private val AllocMarker = "_ALLOCATED"
  private val VRe = "^v=(\\d+)$".r

  /** The filesystem owning `base` (scheme-resolved: local path, file://,
    * hdfs://, s3a://, …), with the active session's Hadoop conf when one
    * exists. */
  private def fsFor(base: String): (FileSystem, Path) = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
    val p = new Path(base)
    (p.getFileSystem(conf), p)
  }

  private def versionOf(p: Path): Option[Int] =
    p.getName match {
      case VRe(n) => Some(n.toInt)
      case _ => None
    }

  private def versionDirs(fs: FileSystem, root: Path): Seq[(Int, Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap(st => versionOf(st.getPath).map(_ -> st.getPath))
      .sortBy(_._1)

  private def isCommitted(fs: FileSystem, p: Path): Boolean =
    fs.exists(new Path(p, CommitMarker))

  /** Committed versions, ascending. Synchronized against a concurrent
    * in-JVM write's prune. */
  def committedVersions(base: String): Seq[Int] = synchronized {
    val (fs, root) = fsFor(base)
    versionDirs(fs, root).filter(v => isCommitted(fs, v._2)).map(_._1)
  }

  /** Path of a version directory (exists or not). */
  def versionPath(base: String, v: Int): String = s"$base/v=$v"

  /** Atomically claim version `v`: create its directory and then its
    * alloc marker with overwrite=false — the create-exclusive is the
    * conditional put; exactly one of two racing writers wins. */
  private def tryClaim(fs: FileSystem, base: String, v: Int): Boolean = {
    val dir = new Path(versionPath(base, v))
    fs.mkdirs(dir)
    try { fs.create(new Path(dir, AllocMarker), false).close(); true }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException if fs.exists(new Path(dir, AllocMarker)) =>
        false
    }
  }

  /** Write a new version: allocate max+1 (torn dirs included — a
    * version number is never reused) via the atomic claim retry loop,
    * run the writer into the fresh directory, then commit via the
    * marker file and prune. Returns the committed version number. */
  def write(base: String, writer: String => Unit): Int = synchronized {
    val (fs, root) = fsFor(base)
    var next = versionDirs(fs, root).lastOption.map(_._1 + 1).getOrElse(1)
    while (!tryClaim(fs, base, next)) next += 1
    val dir = versionPath(base, next)
    writer(dir)
    // commit guard: if a CONCURRENT writer's prune swept this claimed
    // directory mid-write (cross-JVM — the monitor only serializes
    // writers in-process), the alloc marker is gone and parts of the
    // artifact may have been recreated after the sweep. Committing then
    // would violate the store's core invariant (committed ⇒ fully
    // written), so fail the write loudly instead — the caller retries
    // and the half-written dir stays uncommitted, invisible to readers.
    if (!fs.exists(new Path(dir, AllocMarker)))
      throw new IllegalStateException(
        s"version claim $dir was swept by a concurrent prune mid-write — " +
          "refusing to commit a possibly-partial artifact")
    fs.create(new Path(dir, CommitMarker), false).close()
    prune(fs, root)
    next
  }

  /** Newest committed version whose content passes `validate` (which
    * must return false — or throw — on a corrupt artifact). A version
    * that fails validation is skipped, NOT deleted: it is evidence, and
    * retention will age it out. Synchronized so the walk can never race
    * an in-JVM prune. */
  def latestValid(base: String,
                  validate: String => Boolean): Option[(Int, String)] =
    synchronized {
      val (fs, root) = fsFor(base)
      versionDirs(fs, root).reverseIterator
        .filter(v => isCommitted(fs, v._2))
        .map { case (v, _) => (v, versionPath(base, v)) }
        .find { case (_, p) =>
          try validate(p)
          catch { case scala.util.control.NonFatal(_) => false }
        }
    }

  /** Keep the newest [[Keep]] committed versions; delete older
    * committed ones and any uncommitted (torn) directory older than the
    * OLDEST RETAINED committed version — not merely the newest: an
    * uncommitted number between retained committed versions may be a
    * concurrent writer still writing (cross-JVM), and sweeping it would
    * race that write. Below `keepFrom` a claim is provably stale
    * relative to [[Keep]] full committed generations; the commit guard
    * in [[write]] turns the residual race into a loud failure rather
    * than a torn committed artifact. */
  private def prune(fs: FileSystem, root: Path): Unit = {
    val dirs = versionDirs(fs, root)
    val committed = dirs.filter(v => isCommitted(fs, v._2)).map(_._1)
    if (committed.nonEmpty) {
      val keepFrom = committed.takeRight(Keep).head
      dirs.foreach { case (v, p) =>
        if (v < keepFrom) fs.delete(p, true)
      }
    }
  }
}
