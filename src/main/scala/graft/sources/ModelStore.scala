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
  * Concurrency: version allocation claims its number by writing a
  * UNIQUE writer token into the version's [[AllocMarker]] with
  * `FileSystem.create(…, overwrite = false)`, and the token is re-read
  * immediately before commit — a commit goes through only when the
  * marker still holds THIS writer's token. On filesystems with atomic
  * create-exclusive (HDFS, local/file://) the create IS a conditional
  * put: two writers racing the same number see exactly one winner and
  * the loser retries at the next number, so allocation is fully atomic
  * there. On object stores whose create(overwrite=false) is a
  * non-atomic existence-check + PUT (plain S3A/GCS), two cross-JVM
  * writers CAN both pass the create; the token re-read then aborts
  * every writer whose marker was overwritten, narrowing the double-
  * commit window to a PUT-vs-re-read race — run such stores with a
  * conditional-put mode (e.g. `fs.s3a.create.conditional`) or fence
  * writers externally if that residual window matters. Within a JVM,
  * writers AND readers serialize on the object monitor so a reader's
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

  /** Claim version `v`: create its directory and write THIS writer's
    * token into the alloc marker with overwrite=false. On atomic
    * create-exclusive filesystems (HDFS, local) the create is the
    * conditional put — exactly one of two racing writers wins; the
    * token exists so [[write]]'s pre-commit re-read can also detect a
    * non-atomic store letting two writers through (see object doc). */
  private def tryClaim(fs: FileSystem, base: String, v: Int,
                       token: String): Boolean = {
    val dir = new Path(versionPath(base, v))
    fs.mkdirs(dir)
    try {
      val out = fs.create(new Path(dir, AllocMarker), false)
      try out.write(token.getBytes("UTF-8")) finally out.close()
      true
    }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException if fs.exists(new Path(dir, AllocMarker)) =>
        false
    }
  }

  /** Distinguished from any real token (UUIDs): the marker exists but
    * could not be read — a transient IO failure on a healthy claim OR a
    * foreign writer's half-landed overwrite. [[write]] reports it as
    * such instead of asserting a concurrency bug that may not exist. */
  private val UnreadableToken = "<unreadable-marker>"

  /** The alloc marker's current token: None when the marker is GONE
    * (prune sweep); [[UnreadableToken]] when it exists but cannot be
    * read back (transient IO, a checksummed FS seeing an out-of-band
    * rewrite, or a foreign half-landed PUT); Some(other) when it reads
    * back as a different writer's token — the last two are either way
    * not this writer's claim anymore. */
  private def readToken(fs: FileSystem, dir: Path): Option[String] = {
    val marker = new Path(dir, AllocMarker)
    try {
      val in = fs.open(marker)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](256)
        var n = in.read(chunk)
        while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(new String(buf.toByteArray, "UTF-8"))
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) =>
        if (fs.exists(marker)) Some(UnreadableToken) else None
    }
  }

  /** Write a new version: allocate max+1 (torn dirs included — a
    * version number is never reused) via the atomic claim retry loop,
    * run the writer into the fresh directory, then commit via the
    * marker file and prune. Returns the committed version number. */
  def write(base: String, writer: String => Unit): Int = synchronized {
    val (fs, root) = fsFor(base)
    val token = java.util.UUID.randomUUID().toString
    var next = versionDirs(fs, root).lastOption.map(_._1 + 1).getOrElse(1)
    while (!tryClaim(fs, base, next, token)) next += 1
    val dir = versionPath(base, next)
    writer(dir)
    // commit guard: re-read the alloc marker and require OUR token.
    // Catches two cross-JVM races the in-process monitor can't: (a) a
    // concurrent writer's prune swept this claimed directory mid-write
    // (marker gone — parts of the artifact may have been recreated
    // after the sweep); (b) on an object store without atomic
    // create-exclusive, a second writer claimed the same number and
    // overwrote the marker (foreign token). Committing in either state
    // would violate the store's core invariant (committed ⇒ fully
    // written by one writer), so fail loudly instead — the caller
    // retries and the half-written dir stays uncommitted, invisible to
    // readers.
    readToken(fs, new Path(dir)) match {
      case Some(t) if t == token => ()
      case Some(UnreadableToken) => throw new IllegalStateException(
        s"alloc marker of $dir could not be read back before commit — " +
          "a transient read failure on a healthy claim OR a foreign " +
          "writer's overwrite; refusing to commit either way (a retried " +
          "write allocates a fresh version; if this persists, inspect " +
          "the marker)")
      case Some(_) => throw new IllegalStateException(
        s"version claim $dir was re-claimed by a concurrent writer " +
          "(non-atomic create on this filesystem?) — refusing to commit " +
          "a possibly-interleaved artifact")
      case None => throw new IllegalStateException(
        s"version claim $dir was swept by a concurrent prune mid-write — " +
          "refusing to commit a possibly-partial artifact")
    }
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
