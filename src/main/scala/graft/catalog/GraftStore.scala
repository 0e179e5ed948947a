package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.SparkSession

/** Durable control-plane store — the engine's analog of the reference's
  * KV store (`services/datastore`: users/roles in `services/users`,
  * sources as namespace `SourceConfig`, scripts in
  * `services/script/.../ScriptStore.java`, reflection goals in
  * `services/accelerator`, pipes in the ingestion service). Without it a
  * coordinator restart silently loses every GRANT, saved script, named
  * source, pipe definition and reflection — the one class of state the
  * engine itself (not Spark) owns.
  *
  * Shape: one small JSON file per registry section under
  * `spark.graft.store.dir` (default `<spark.sql.warehouse.dir>/
  * graft_store`), written whole on every mutation via the same atomic
  * tmp-write + FileContext overwrite-rename the REST promotion registry
  * proved (a crash mid-save can never leave a torn or missing file), and
  * reloaded by [[loadAll]] BEFORE any wire serves — `GraftSession.local`
  * and `GraftRestServer.start` both call it, so a restarted process
  * keeps enforcing pre-restart grants, running pre-restart scripts and
  * serving pre-restart sources/pipes/reflections. Control-plane mutation
  * rates are human-scale; rewriting a whole section per mutation is
  * microseconds of JSON against files that are KBs at the reference's
  * own caps (1000 scripts/user etc.). Registry `clear()` calls delete
  * their section — a deliberate reset resets durable state too.
  *
  * Saves are BEST-EFFORT per mutation (the mutation is live in memory
  * either way; a failed save warns so operators see the durability gap),
  * exactly the REST promotion registry's contract. Hadoop FS API
  * throughout, so the store can live beside the data on any scheme.
  */
object GraftStore {

  val DirConf = "spark.graft.store.dir"

  /** Optional LOCAL coordination directory for claim files
    * ([[PointerClaimArbiter]]): set it when the store dir lives on an
    * object store whose create-new is not atomic — arbitration then runs
    * on this POSIX/NFS dir (the lake `PointerCommitArbiter` pattern)
    * while the section payload stays wherever [[DirConf]] points. */
  val ClaimDirConf = "spark.graft.store.claimDir"

  private val mapper = new ObjectMapper()

  def newObject: ObjectNode = mapper.createObjectNode()
  def newArray: ArrayNode = mapper.createArrayNode()

  /** The session to persist through when a mutator has none in scope. */
  def sessionForPersist: Option[SparkSession] =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)

  /** First k of `it` under `ord` via a bounded max-heap: O(n log k) time,
    * O(k) memory — the LIMIT-pushable shape for registry listings (SHOW
    * SCRIPTS/SOURCES LIMIT n never materializes or sorts the full
    * registry on the driver). */
  def boundedTake[T](it: Iterator[T], k: Int)(implicit ord: Ordering[T]): Seq[T] = {
    require(k >= 0, "LIMIT must be non-negative")
    val heap = scala.collection.mutable.PriorityQueue.empty[T](ord)
    it.foreach { t =>
      if (heap.size < k) heap += t
      else if (k > 0 && ord.lt(t, heap.head)) { heap.dequeue(); heap += t }
    }
    heap.toSeq.sorted(ord)
  }

  def storeDir(spark: SparkSession): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.conf.getOption(DirConf).getOrElse(
        spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
          "/graft_store"))

  // ---------- generation-CAS section files ----------
  //
  // A section lives as `<section>.<gen>.json` (monotone gen, one live file;
  // the bare legacy `<section>.json` reads as generation 0). A save commits
  // via tmp-write + rename WITHOUT overwrite to the NEXT generation: on any
  // real filesystem that create-new rename is atomic, so two coordinators
  // racing the same store dir cannot silently last-writer-win — the loser's
  // rename fails and surfaces as ConcurrentModificationException (the
  // CommitArbiter contract from sources/LakeIO). A foreign bump observed
  // BEFORE writing (on-disk gen ahead of what this process loaded) refuses
  // the same way: the in-memory registry is stale and blind-writing it
  // would drop the other coordinator's mutations.

  /** Last generation this process loaded or wrote, per (store dir, section). */
  private val knownGen = scala.collection.concurrent.TrieMap.empty[String, Long]
  private val ioLock = new Object
  /** Owner-only section files: the store carries password hashes/salts
    * ('auth') and source connection props that commonly embed credentials
    * ('sources') — never group/world-readable. */
  private val OwnerOnly =
    org.apache.hadoop.fs.permission.FsPermission.createImmutable(0x180.toShort) // 0600

  private def genKey(spark: SparkSession, section: String): String =
    storeDir(spark).toString + "#" + section

  // ---------- claim arbitration seam ----------
  //
  // Winning a generation = atomically creating its claim. The default
  // claims next to the section files (FileSystem.createNewFile —
  // POSIX-atomic locally, namenode-atomic on HDFS). An object store
  // without atomic create-new configures ClaimDirConf instead: claims
  // then live in a shared LOCAL coordination dir with java.nio
  // create-new semantics, and the store dir carries only payload.

  private[catalog] trait ClaimArbiter {
    def tryClaim(section: String, gen: Long): Boolean
    /** Age of an existing claim in ms (0 when unknowable). */
    def ageMs(section: String, gen: Long): Long
    def release(section: String, gen: Long): Unit
    /** Retire claims of generations strictly below `gen`. */
    def releaseBelow(section: String, gen: Long): Unit
    def releaseAll(section: String): Unit
  }

  private final class FsClaimArbiter(fs: org.apache.hadoop.fs.FileSystem,
                                     dir: org.apache.hadoop.fs.Path)
      extends ClaimArbiter {
    private def claim(section: String, gen: Long) =
      new org.apache.hadoop.fs.Path(dir, s"$section.$gen.claim")
    override def tryClaim(section: String, gen: Long): Boolean =
      try {
        // atomic create-new (not create(overwrite=false), whose
        // exists-then-create races); owner-only like the section files —
        // post-hoc is fine, a claim carries no data
        val ok = fs.createNewFile(claim(section, gen))
        if (ok) { try fs.setPermission(claim(section, gen), OwnerOnly)
                  catch { case _: Exception => () } }
        ok
      }
      catch { case _: java.io.IOException => false }
    override def ageMs(section: String, gen: Long): Long =
      try System.currentTimeMillis() -
        fs.getFileStatus(claim(section, gen)).getModificationTime
      catch { case _: Exception => 0L }
    override def release(section: String, gen: Long): Unit =
      try { fs.delete(claim(section, gen), false); () }
      catch { case _: Exception => () }
    // store-dir claims are swept by the save/delete paths' OWN directory
    // listing (stale-claim cleanup there is unconditional, so it also
    // covers leftovers from a mode switch) — a second LIST per commit
    // would double the mutation cost on exactly the object stores this
    // seam targets
    override def releaseBelow(section: String, gen: Long): Unit = ()
    override def releaseAll(section: String): Unit = ()
  }

  /** Claims in a LOCAL coordination dir, namespaced by a hash of the
    * store dir so several stores can share one coordDir. */
  private final class PointerClaimArbiter(coordDir: String, storeUri: String)
      extends ClaimArbiter {
    private val root = java.nio.file.Paths.get(coordDir)
    private val ns = java.security.MessageDigest.getInstance("MD5")
      .digest(storeUri.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    private def claim(section: String, gen: Long) =
      root.resolve(s"$ns.$section.$gen.claim")
    override def tryClaim(section: String, gen: Long): Boolean =
      try {
        java.nio.file.Files.createDirectories(root)
        java.nio.file.Files.createFile(claim(section, gen)) // atomic create-new
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    override def ageMs(section: String, gen: Long): Long =
      try System.currentTimeMillis() - java.nio.file.Files
        .getLastModifiedTime(claim(section, gen)).toMillis
      catch { case _: Exception => 0L }
    override def release(section: String, gen: Long): Unit =
      try { java.nio.file.Files.deleteIfExists(claim(section, gen)); () }
      catch { case _: Exception => () }
    private def sweep(section: String)(keep: Long => Boolean): Unit =
      try {
        val pre = s"$ns.$section."
        val st = java.nio.file.Files.list(root)
        try st.iterator().forEachRemaining { p =>
          val n = p.getFileName.toString
          if (n.startsWith(pre) && n.endsWith(".claim"))
            n.stripPrefix(pre).stripSuffix(".claim").toLongOption
              .filterNot(keep)
              .foreach(_ => try java.nio.file.Files.deleteIfExists(p)
                            catch { case _: Exception => () })
        } finally st.close()
      } catch { case _: Exception => () }
    override def releaseBelow(section: String, gen: Long): Unit =
      sweep(section)(_ >= gen)
    override def releaseAll(section: String): Unit =
      sweep(section)(_ => false)
  }

  private def arbiterFor(spark: SparkSession,
                         fs: org.apache.hadoop.fs.FileSystem,
                         dir: org.apache.hadoop.fs.Path): ClaimArbiter =
    spark.conf.getOption(ClaimDirConf) match {
      case Some(coord) if coord.nonEmpty =>
        new PointerClaimArbiter(coord, dir.toString)
      case _ => new FsClaimArbiter(fs, dir)
    }

  private def legacyPath(spark: SparkSession, section: String) =
    new org.apache.hadoop.fs.Path(storeDir(spark), section + ".json")

  private def genOf(name: String, section: String): Option[Long] = {
    val pre = section + "."
    // the legacy bare `<section>.json` also starts with the prefix — its
    // "generation" substring would be negative-length, so length-guard
    if (name.startsWith(pre) && name.endsWith(".json") &&
        name.length - 5 > pre.length)
      name.substring(pre.length, name.length - 5).toLongOption
    else None
  }

  /** Highest on-disk generation for `section` (legacy bare file = 0). */
  private def latestOnDisk(fs: org.apache.hadoop.fs.FileSystem,
                           spark: SparkSession, section: String)
      : Option[(org.apache.hadoop.fs.Path, Long)] = {
    val dir = storeDir(spark)
    if (!fs.exists(dir)) return None
    val gens = fs.listStatus(dir).toSeq.filter(_.isFile)
      .flatMap(st => genOf(st.getPath.getName, section).map(st.getPath -> _))
    if (gens.nonEmpty) Some(gens.maxBy(_._2))
    else {
      val legacy = legacyPath(spark, section)
      if (fs.exists(legacy)) Some(legacy -> 0L) else None
    }
  }

  /** Atomic whole-section rewrite at the next generation. Best-effort for
    * plain IO trouble (WARN — the in-memory registry is the serving truth
    * and the next successful save rewrites all), but a CONCURRENT WRITER
    * is never swallowed: a generation conflict throws
    * ConcurrentModificationException so the losing coordinator knows its
    * registry is stale instead of silently dropping the winner's writes. */
  def save(spark: SparkSession, section: String, root: JsonNode): Unit =
    try saveOrThrow(spark, section, root)
    catch {
      case e: java.util.ConcurrentModificationException => throw e
      case e: Exception =>
        System.err.println(s"[graft-store] WARN: save of '$section' failed: $e")
    }

  /** How stale a committed-nothing claim must be before it is treated as
    * a crashed writer's orphan and released (see saveOrThrow). */
  private val OrphanClaimMs = 600000L

  /** [[save]] that also fails loudly on plain IO failure — for sections
    * where a silent durability gap is itself a defect (auth: a REVOKE
    * that does not persist resurrects the privilege at the next restart).
    *
    * Cross-process CAS: winning generation `n` = atomically CREATE-NEW
    * `<section>.<n>.claim` (`FileSystem.createNewFile` — POSIX-atomic on
    * local FS, namenode-atomic on HDFS; an object store without atomic
    * create needs a PointerCommitArbiter-style external coordinator, the
    * same caveat as the lake commit log). Only the claim winner writes
    * the section file, so the FileContext rename TOCTOU on local
    * filesystems can no longer let two coordinators silently
    * last-writer-win; losers get ConcurrentModificationException without
    * touching the store. A winner's claim persists until a LATER
    * generation retires it (deleting it early would let a laggard
    * re-claim and overwrite the committed gen); a claim whose section
    * file never appeared (writer crashed mid-commit) is released after
    * [[OrphanClaimMs]]. */
  def saveOrThrow(spark: SparkSession, section: String, root: JsonNode): Unit =
    ioLock.synchronized {
      val conf = org.apache.spark.sql.graft.Bridge.hadoopConf(spark)
      val dir = storeDir(spark)
      val fs = dir.getFileSystem(conf)
      if (!fs.exists(dir)) fs.mkdirs(dir)
      val key = genKey(spark, section)
      val onDisk = latestOnDisk(fs, spark, section)
      val base = onDisk.map(_._2).getOrElse(-1L)
      knownGen.get(key).foreach { known =>
        if (base > known)
          throw new java.util.ConcurrentModificationException(
            s"store section '$section' is at generation $base on disk but " +
              s"this process last saw $known — another coordinator is " +
              "writing the same store dir; reload before mutating")
      }
      val next = base + 1
      val target = new org.apache.hadoop.fs.Path(dir, s"$section.$next.json")
      val arbiter = arbiterFor(spark, fs, dir)
      if (!arbiter.tryClaim(section, next)) {
        // the generation is owned: either committed (reload) or a crashed
        // writer's orphan (release after the grace so the NEXT attempt
        // can take it — this save still fails, callers reload+retry)
        if (!fs.exists(target) && arbiter.ageMs(section, next) > OrphanClaimMs)
          arbiter.release(section, next)
        throw new java.util.ConcurrentModificationException(
          s"store section '$section' generation $next is claimed by " +
            "another coordinator; reload before mutating")
      }
      var committed = false
      try {
        val tmp = new org.apache.hadoop.fs.Path(dir,
          s".$section.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
        // owner-only from birth: the section carries password hashes and
        // source credentials, and a post-hoc chmod would leave a window
        // (and could silently fail)
        val os = fs.create(tmp, OwnerOnly, true, 4096,
          fs.getDefaultReplication(tmp), fs.getDefaultBlockSize(tmp), null)
        try os.write(mapper.writeValueAsBytes(root)) finally os.close()
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, conf)
        try fc.rename(tmp, target,
          org.apache.hadoop.fs.Options.Rename.OVERWRITE) // claim serializes writers
        catch { case e: Exception =>
          try fs.delete(tmp, false) catch { case _: Exception => () }
          throw e
        }
        committed = true
      } finally {
        // a failed commit must not brick this generation forever
        if (!committed) arbiter.release(section, next)
      }
      knownGen.put(key, next)
      // retire superseded generations, their claims, and the legacy bare
      // file — best-effort; stragglers lose every future max-gen read
      fs.listStatus(dir).toSeq.filter(_.isFile).foreach { st =>
        val n = st.getPath.getName
        // store-dir claims retire here regardless of arbiter mode, so
        // FS-mode leftovers can't block saves after a switch to
        // pointer-claim mode and back
        val oldClaim = n.startsWith(section + ".") && n.endsWith(".claim") &&
          n.stripPrefix(section + ".").stripSuffix(".claim").toLongOption.exists(_ < next)
        if (genOf(n, section).exists(_ < next) || oldClaim || n == s"$section.json")
          try fs.delete(st.getPath, false) catch { case _: Exception => () }
      }
      arbiter.releaseBelow(section, next) // pointer mode: coord-dir sweep
    }

  /** [[save]] with conflict RESYNC. Plain IO trouble follows the chosen
    * base contract — `strict = false` WARNs (the in-memory registry is
    * the serving truth), `strict = true` throws ([[saveOrThrow]]; auth) —
    * but a generation conflict always reloads the registry from the
    * store via `reload` (so this process stops serving a divergent
    * world) and fails the statement with retry guidance instead of
    * leaving every future save of the section doomed against the foreign
    * generation. A reload that itself fails must not mask the guidance:
    * it rides as a suppressed exception. */
  def saveResync(spark: SparkSession, section: String, root: JsonNode,
                 strict: Boolean = false)
                (reload: SparkSession => Unit): Unit =
    try { if (strict) saveOrThrow(spark, section, root)
          else save(spark, section, root) }
    catch {
      case cme: java.util.ConcurrentModificationException =>
        try reload(spark)
        catch { case re: Exception => cme.addSuppressed(re) }
        throw new IllegalStateException(
          s"'$section' registry was updated by another coordinator; this " +
            "process has reloaded the durable state — retry the statement",
          cme)
    }

  def load(spark: SparkSession, section: String): Option[JsonNode] =
    ioLock.synchronized {
      def attempt(): Option[JsonNode] = {
        val fs = storeDir(spark)
          .getFileSystem(org.apache.spark.sql.graft.Bridge.hadoopConf(spark))
        latestOnDisk(fs, spark, section).map { case (p, gen) =>
          val in = fs.open(p)
          val body = try in.readAllBytes() finally in.close()
          knownGen.put(genKey(spark, section), gen)
          mapper.readTree(body)
        }
      }
      try attempt()
      catch {
        case _: Exception =>
          // a concurrent writer's retire pass can delete the chosen
          // max-generation file between our list and open — but then its
          // NEWER generation exists by construction, so one re-list
          // finds it; only a second failure is real IO trouble
          try attempt()
          catch {
            case e: Exception =>
              System.err.println(
                s"[graft-store] WARN: load of '$section' failed: $e")
              None
          }
      }
    }

  /** Registry `clear()` semantics: a deliberate reset deletes the durable
    * section too (otherwise the next load would resurrect dropped state). */
  def delete(spark: SparkSession, section: String): Unit =
    try ioLock.synchronized {
      val dir = storeDir(spark)
      val fs = dir.getFileSystem(org.apache.spark.sql.graft.Bridge.hadoopConf(spark))
      if (fs.exists(dir)) fs.listStatus(dir).toSeq.filter(_.isFile).foreach { st =>
        val n = st.getPath.getName
        val isClaim = n.startsWith(section + ".") && n.endsWith(".claim")
        if (genOf(n, section).isDefined || isClaim || n == s"$section.json")
          fs.delete(st.getPath, false)
      }
      arbiterFor(spark, fs, dir).releaseAll(section)
      knownGen.remove(genKey(spark, section))
      ()
    } catch { case _: Exception => () }

  /** Reload every durable registry — called BEFORE any wire serves
    * (GraftSession.local, GraftRestServer.start). Order matters only in
    * that auth loads first: script/source visibility checks consult it.
    * Reflections whose defining SQL references session temp views that
    * do not exist yet are kept as PENDING and reattach on the next
    * [[loadAll]] (or next reflection mutation) after the views appear. */
  def loadAll(spark: SparkSession): Unit = {
    graft.auth.Privileges.loadFrom(spark)
    Sources.loadFrom(spark)
    Scripts.loadFrom(spark)
    graft.streaming.Pipes.loadFrom(spark)
    graft.accel.Reflections.loadFrom(spark)
  }
}
