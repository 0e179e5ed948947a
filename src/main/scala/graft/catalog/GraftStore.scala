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

  private def sectionPath(spark: SparkSession, section: String) =
    new org.apache.hadoop.fs.Path(storeDir(spark), section + ".json")

  /** Atomic whole-section rewrite (tmp + FileContext overwrite-rename —
    * the naive delete-then-rename has a crash window that loses the whole
    * section). Best-effort: failures WARN, the in-memory registry is the
    * serving truth either way and the next successful save rewrites all. */
  def save(spark: SparkSession, section: String, root: JsonNode): Unit =
    try {
      val p = sectionPath(spark, section)
      val conf = org.apache.spark.sql.graft.Bridge.hadoopConf(spark)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p.getParent)) fs.mkdirs(p.getParent)
      val tmp = new org.apache.hadoop.fs.Path(p.getParent,
        p.getName + "." + java.util.UUID.randomUUID().toString.take(8) + ".tmp")
      val os = fs.create(tmp, true)
      try os.write(mapper.writeValueAsBytes(root)) finally os.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      ()
    } catch {
      case e: Exception =>
        System.err.println(s"[graft-store] WARN: save of '$section' failed: $e")
    }

  def load(spark: SparkSession, section: String): Option[JsonNode] =
    try {
      val p = sectionPath(spark, section)
      val fs = p.getFileSystem(org.apache.spark.sql.graft.Bridge.hadoopConf(spark))
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val body = try in.readAllBytes() finally in.close()
        Some(mapper.readTree(body))
      }
    } catch {
      case e: Exception =>
        System.err.println(s"[graft-store] WARN: load of '$section' failed: $e")
        None
    }

  /** Registry `clear()` semantics: a deliberate reset deletes the durable
    * section too (otherwise the next load would resurrect dropped state). */
  def delete(spark: SparkSession, section: String): Unit =
    try {
      val p = sectionPath(spark, section)
      val fs = p.getFileSystem(org.apache.spark.sql.graft.Bridge.hadoopConf(spark))
      if (fs.exists(p)) fs.delete(p, false)
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
