package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Filesystem seam for the lake commit log: every metadata I/O
  * SnapshotTable performs goes through here, so a table whose `dir`
  * carries a URI scheme (`file:/…`, `hdfs://…`, `s3a://…`, `abfs://…`)
  * drives the Hadoop `FileSystem` API — the same client the scan path
  * (LakeFileIndex) already uses — while bare local paths keep the
  * `java.nio` fast path (no Hadoop client overhead, nanosecond mtimes,
  * OS advisory locks).
  *
  * Semantics per backend, called out where they differ:
  *  - **atomic publish** (`atomicMove`): local = `ATOMIC_MOVE` rename.
  *    Hadoop = `FileSystem.rename`, which REFUSES an existing target on
  *    HDFS-like stores — a lost commit race surfaces as
  *    ConcurrentModificationException instead of silent replacement
  *    (strictly safer). On S3A, rename is copy+delete and NOT atomic:
  *    like Delta on S3, single-writer-per-table is the supported
  *    deployment there unless a coordinating catalog fronts the log
  *    (Iceberg solves this with a catalog pointer swap; SURVEY §2.1).
  *  - **commit lock** (`withCommitLock`): local = kernel-released OS file
  *    lock (cross-process). Hadoop = per-path JVM monitor only — cross-
  *    process exclusion degrades to the rename conflict check above,
  *    because object stores expose no lock primitive at all.
  *  - **mtime granularity**: local = nanoseconds where the FS has them;
  *    Hadoop = milliseconds (`FileStatus.getModificationTime`) — the log
  *    cache's (size, mtime) incarnation check is correspondingly coarser.
  */
private[sources] object LakeIO {

  /** URI-scheme'd paths route to Hadoop; bare paths stay on java.nio. */
  private def schemed(raw: String): Boolean =
    raw.matches("^[A-Za-z][A-Za-z0-9+.-]*:/.*")

  private def hconf: Configuration =
    try org.apache.spark.sql.graft.Bridge.hadoopConf(SparkSession.active)
    catch { case _: Exception => new Configuration() }

  final case class LPath(raw: String) {
    def resolve(child: String): LPath = LPath(raw.stripSuffix("/") + "/" + child)
    def fileName: String = raw.substring(raw.lastIndexOf('/') + 1)
    private[LakeIO] def nio: java.nio.file.Path = Paths.get(raw)
    private[LakeIO] def hpath: HPath = new HPath(raw)
    private[LakeIO] def hadoop: Boolean = schemed(raw)
    private[LakeIO] def fs: FileSystem = hpath.getFileSystem(hconf)
    override def toString: String = raw
  }

  def path(parts: String*): LPath =
    LPath(parts.map(_.stripSuffix("/")).mkString("/"))

  def exists(p: LPath): Boolean =
    if (p.hadoop) p.fs.exists(p.hpath) else Files.exists(p.nio)

  def isDirectory(p: LPath): Boolean =
    if (p.hadoop) {
      try p.fs.getFileStatus(p.hpath).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    } else Files.isDirectory(p.nio)

  /** Immediate child names (files and directories). */
  def listNames(p: LPath): Vector[String] =
    if (p.hadoop) p.fs.listStatus(p.hpath).toVector.map(_.getPath.getName)
    else {
      val s = Files.list(p.nio)
      try s.iterator.asScala.map(_.getFileName.toString).toVector
      finally s.close()
    }

  def readString(p: LPath): String =
    if (p.hadoop) {
      val in = p.fs.open(p.hpath)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    } else new String(Files.readAllBytes(p.nio), StandardCharsets.UTF_8)

  def writeString(p: LPath, content: String): Unit =
    if (p.hadoop) {
      val out = p.fs.create(p.hpath, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    } else {
      Files.write(p.nio, content.getBytes(StandardCharsets.UTF_8)); ()
    }

  /** (size bytes, mtime ns) — the log cache's incarnation identity. */
  def sizeAndMtimeNanos(p: LPath): (Long, Long) =
    if (p.hadoop) {
      val st = p.fs.getFileStatus(p.hpath)
      (st.getLen, st.getModificationTime * 1000000L)
    } else
      (Files.size(p.nio),
        Files.getLastModifiedTime(p.nio).to(java.util.concurrent.TimeUnit.NANOSECONDS))

  def mtimeMillis(p: LPath): Long =
    if (p.hadoop) p.fs.getFileStatus(p.hpath).getModificationTime
    else Files.getLastModifiedTime(p.nio).toMillis

  def size(p: LPath): Long =
    if (p.hadoop) p.fs.getFileStatus(p.hpath).getLen else Files.size(p.nio)

  def deleteIfExists(p: LPath): Unit =
    if (p.hadoop) { p.fs.delete(p.hpath, false); () }
    else { Files.deleteIfExists(p.nio); () }

  def createDirectories(p: LPath): Unit =
    if (p.hadoop) { p.fs.mkdirs(p.hpath); () }
    else { Files.createDirectories(p.nio); () }

  // ---- pluggable commit coordination ------------------------------------

  /** Commit-publish coordination seam. The default ([[RenameCommitArbiter]])
    * relies on the store's rename semantics (atomic on local/HDFS,
    * copy+delete and NOT atomic on S3-like stores — single-writer there).
    * [[PointerCommitArbiter]] instead serializes publishes through an
    * atomic-claim location with create-new semantics (a POSIX dir, an
    * NFS mount, a leader-held volume) — the Iceberg catalog-pointer
    * pattern: the claim, not the data-store rename, decides the winner,
    * so multi-writer commits are safe on stores whose rename can race. */
  trait CommitArbiter {
    /** Atomically publish fully-staged `src` as `dst`; must throw
      * ConcurrentModificationException when another writer already owns
      * `dst`, and must never leave a partially-visible `dst`. */
    def publish(src: LPath, dst: LPath): Unit
  }

  object RenameCommitArbiter extends CommitArbiter {
    override def publish(src: LPath, dst: LPath): Unit = atomicMove(src, dst)
  }

  /** Claim-then-write coordination: winning `dst` = atomically creating
    * `<coordDir>/<hash(dst)>.claim` (POSIX create-new, atomic on any real
    * filesystem). Only the claim winner writes `dst`; losers get
    * ConcurrentModificationException WITHOUT touching the data store, so
    * a non-atomic object-store rename can no longer lose a commit.
    * A writer that crashes between claim and write leaves an orphaned
    * claim — [[recover]] releases it once `dst` is verified absent
    * (operator action, same contract as un-sticking a stale catalog
    * pointer). */
  final class PointerCommitArbiter(coordDir: String) extends CommitArbiter {
    private val root = Paths.get(coordDir)
    private def claimFor(dst: LPath): java.nio.file.Path = {
      val h = java.security.MessageDigest.getInstance("SHA-256")
        .digest(dst.raw.getBytes(StandardCharsets.UTF_8))
        .take(16).map("%02x".format(_)).mkString
      root.resolve(s"$h.claim")
    }
    override def publish(src: LPath, dst: LPath): Unit = {
      Files.createDirectories(root)
      try Files.write(claimFor(dst), dst.raw.getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new java.util.ConcurrentModificationException(
            s"commit conflict: ${dst.raw} already claimed by another writer " +
              s"(coordination at $coordDir)")
      }
      // claim won: single-writer from here. Publish by MOVING the staged
      // src (already fully written) rather than re-writing dst in place —
      // a concurrent log reader polling dst must never observe a
      // truncated commit JSON (the CommitArbiter contract: never a
      // partially-visible dst; a rename/PUT lands whole-or-absent even on
      // copy+delete stores, unlike an in-place streaming write).
      if (exists(dst))
        throw new java.util.ConcurrentModificationException(
          s"commit conflict: ${dst.raw} already published (claim was stale)")
      atomicMove(src, dst)
    }
    def recover(dst: LPath): Unit = {
      require(!exists(dst), s"refusing to release claim: ${dst.raw} exists")
      Files.deleteIfExists(claimFor(dst)); ()
    }
  }

  private val arbiters = scala.collection.concurrent.TrieMap.empty[String, CommitArbiter]

  /** Route commit publishes for table paths under `prefix` through
    * `arbiter` (longest-prefix match wins; default = rename). */
  def registerArbiter(prefix: String, arbiter: CommitArbiter): Unit =
    arbiters.put(prefix, arbiter)
  def unregisterArbiter(prefix: String): Unit = { arbiters.remove(prefix); () }

  /** Commit publish: the coordination-aware entry every metadata publish
    * goes through. */
  def publish(src: LPath, dst: LPath): Unit =
    arbiters.keys.filter(dst.raw.startsWith).toSeq.sortBy(-_.length).headOption
      .map(arbiters(_)) match {
      case Some(a) => a.publish(src, dst)
      case None => atomicMove(src, dst)
    }

  /** Atomic publish rename (see object scaladoc for per-store semantics). */
  def atomicMove(src: LPath, dst: LPath): Unit =
    if (src.hadoop) {
      if (!src.fs.rename(src.hpath, dst.hpath)) {
        if (exists(dst))
          throw new java.util.ConcurrentModificationException(
            s"commit conflict: ${dst.raw} already published by another writer")
        throw new java.io.IOException(s"rename failed: ${src.raw} -> ${dst.raw}")
      }
    } else {
      Files.move(src.nio, dst.nio, StandardCopyOption.ATOMIC_MOVE); ()
    }

  /** Recursive *.parquet regular files under `root`. */
  def walkParquet(root: LPath): Vector[LPath] =
    if (root.hadoop) {
      if (!exists(root)) Vector.empty
      else {
        val it = root.fs.listFiles(root.hpath, true)
        val out = Vector.newBuilder[LPath]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getPath.getName.endsWith(".parquet"))
            out += LPath(st.getPath.toString)
        }
        out.result()
      }
    } else {
      if (!Files.isDirectory(root.nio)) Vector.empty
      else {
        val s = Files.walk(root.nio)
        try s.iterator.asScala
          .filter(q => Files.isRegularFile(q) && q.toString.endsWith(".parquet"))
          .map(q => LPath(q.toString)).toVector
        finally s.close()
      }
    }

  /** Fully-qualified canonical spelling: Hadoop `makeQualified` for
    * scheme'd paths, absolute+normalized for local — so the same file
    * reached via `file:///x`, `file:/x`, or a redundant `.`/`..` segment
    * compares equal. Vacuum compares referenced-vs-walked sets through
    * this (an equivalent-but-different spelling must never make a live
    * file look unreferenced). */
  def qualified(p: LPath): String =
    if (p.hadoop) p.fs.makeQualified(p.hpath).toString
    else p.nio.toAbsolutePath.normalize.toString

  /** `p` relative to `base` (both under the same root). Compared through
    * [[qualified]] spellings: `base` arrives in the caller's spelling
    * (`file:///x`) while walked paths are Hadoop-qualified (`file:/x`) —
    * the raw prefix test would reject every file under an
    * equivalent-but-different spelling. */
  def relativize(base: LPath, p: LPath): String =
    if (base.hadoop || p.hadoop) {
      val b = qualified(base).stripSuffix("/") + "/"
      val q = qualified(p)
      require(q.startsWith(b), s"relativize: ${p.raw} not under ${base.raw}")
      q.substring(b.length)
    } else base.nio.relativize(p.nio).toString

  /** Rename within the same directory. */
  def renameSibling(p: LPath, newName: String): Unit = {
    val dst = LPath(p.raw.substring(0, p.raw.lastIndexOf('/') + 1) + newName)
    if (p.hadoop) {
      if (!p.fs.rename(p.hpath, dst.hpath))
        throw new java.io.IOException(s"rename failed: ${p.raw} -> ${dst.raw}")
    } else { Files.move(p.nio, dst.nio); () }
  }

  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Commit-publish mutual exclusion (per-store semantics in the object
    * scaladoc). `logDir` must already exist. */
  def withCommitLock[T](logDir: LPath)(body: => T): T =
    if (logDir.hadoop) {
      // no lock primitive on object stores: JVM monitor + the atomicMove
      // conflict check are the serialization the backend can offer
      val monitor = jvmLocks.computeIfAbsent(logDir.raw, _ => new Object)
      monitor.synchronized(body)
    } else {
      import java.nio.file.StandardOpenOption.{CREATE, WRITE}
      // resolve symlinks/.. so aliased paths to the same table share one
      // monitor (two aliases would otherwise race to the OS lock and the
      // second would get OverlappingFileLockException instead of waiting)
      val lockPath = logDir.nio.toRealPath().resolve("commit.lock")
      val monitor = jvmLocks.computeIfAbsent(lockPath.toString, _ => new Object)
      monitor.synchronized {
        val ch = java.nio.channels.FileChannel.open(lockPath, CREATE, WRITE)
        try {
          val fl = ch.lock() // blocks until the OS grants exclusivity
          try body finally fl.release()
        } finally ch.close()
      }
    }
}
