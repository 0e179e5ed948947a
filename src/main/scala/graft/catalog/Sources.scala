package graft.catalog

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Named external-source registry with live connection state — the
  * reference's source catalog (`dac/backend/.../SourceResource.java`
  * creates/updates sources; `SourceState` carries good/bad/warn + a
  * message; `ALTER SOURCE <s> REFRESH STATUS` re-probes it through
  * `RefreshSourceStatusHandler.java:49` `sourceCatalog.refreshSourceStatus`).
  *
  * Spark-first shape: a source is a NAME bound to connection properties;
  * the engine consumes it wherever federation already reaches —
  * `external_query('<name>', '<sql>')` and the EXTERNAL QUERY statement
  * resolve the name through THIS registry (JVM-wide, like the reference's
  * namespace-stored SourceConfig), so a freshly created source is
  * immediately queryable from EVERY session, and DROP SOURCE from any
  * session unregisters it everywhere. Per-session
  * `spark.sql.catalog.<name>.url` runtime conf is deliberately NOT the
  * registration channel — newSession() clones don't inherit runtime
  * conf, so conf-published sources would be invisible cross-session
  * (external_query still honors such keys as a fallback for direct-conf
  * federation setups that never issue CREATE SOURCE). Probes are REAL connectivity checks, not
  * metadata flips: jdbc opens (and closes) a connection, files/lake stat
  * the filesystem through the Hadoop FS API (any scheme), hive lists the
  * metastore's databases. The registry is coordinator-side metadata
  * (JVM-wide, like [[graft.engine.Queues]]); nothing scales with data.
  *
  * The reference creates sources over REST, not SQL; our CREATE/DROP
  * SOURCE DDL is the engine's SQL-surface glue for the same lifecycle
  * (documented divergence — the semantics follow SourceResource).
  */
object Sources {

  /** Registered source: `status` ∈ good | bad | warn (SourceState's
    * enum); `message` carries the probe failure detail. */
  final case class Source(name: String, kind: String,
                          props: Map[String, String],
                          status: String, message: String,
                          lastProbeMs: Long)

  val Kinds: Set[String] = Set("jdbc", "files", "lake", "hive")

  private val reg = TrieMap.empty[String, Source]

  /** Structural validation shared by CREATE SOURCE and the REST PUT's
    * validate-then-swap (an update must refuse a bad body BEFORE touching
    * the existing registration). Throws IllegalArgumentException. */
  def validateConfig(kind: String, props: Map[String, String]): Unit = {
    val k = kind.toLowerCase
    require(Kinds(k), s"unknown source type '$kind' (one of: ${Kinds.mkString(", ")})")
    if (k == "jdbc")
      require(props.contains("url"), "a jdbc source needs 'url' = '<jdbc url>'")
    if (k == "files" || k == "lake")
      require(props.contains("path"), s"a $k source needs 'path' = '<dir>'")
  }

  /** CREATE SOURCE: validate, register (the registry IS the resolution
    * channel — see the class doc), run the first probe. Admin-gated by
    * the caller (source DDL is global infra). */
  def create(spark: SparkSession, name: String, kind: String,
             props: Map[String, String], ifNotExists: Boolean): Source = {
    val n = name.toLowerCase
    val k = kind.toLowerCase
    validateConfig(k, props)
    if (reg.contains(n)) {
      if (ifNotExists) return reg(n)
      throw new IllegalArgumentException(s"source '$name' already exists")
    }
    val probed = probe(spark, n, k, props)
    reg.put(n, probed)
    persist(spark)
    probed
  }

  def drop(spark: SparkSession, name: String): Unit = {
    val n = name.toLowerCase
    reg.remove(n).getOrElse(
      throw new IllegalArgumentException(s"unknown source: $name"))
    persist(spark)
  }

  def get(name: String): Source = reg.getOrElse(name.toLowerCase,
    throw new IllegalArgumentException(s"unknown source: $name"))

  def list: Seq[Source] = reg.values.toSeq.sortBy(_.name)

  /** First k sources by name via a bounded heap (SHOW SOURCES LIMIT n —
    * see [[GraftStore.boundedTake]]). */
  def list(limit: Option[Int]): Seq[Source] = limit match {
    case Some(k) =>
      GraftStore.boundedTake(reg.values.iterator, k)(Ordering.by(_.name))
    case None => list
  }

  /** ALTER SOURCE ... REFRESH STATUS: re-probe and store the new state
    * (RefreshSourceStatusHandler's contract — the statement returns the
    * refreshed state, good or bad, rather than failing on a bad probe). */
  def refreshStatus(spark: SparkSession, name: String): Source = {
    val s = get(name)
    val probed = probe(spark, s.name, s.kind, s.props)
    reg.put(s.name, probed)
    persist(spark)
    probed
  }

  /** One real connectivity check; never throws — failures become the
    * `bad` state with the exception message (SourceState.badState). */
  private def probe(spark: SparkSession, name: String, kind: String,
                    props: Map[String, String]): Source = {
    val (status, msg) =
      try kind match {
        case "jdbc" =>
          props.get("driver").foreach(Class.forName)
          val conn = java.sql.DriverManager.getConnection(props("url"))
          try { if (conn.isValid(5)) ("good", "") else ("bad", "connection not valid") }
          finally conn.close()
        case "files" | "lake" =>
          val p = new org.apache.hadoop.fs.Path(props("path"))
          val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
          if (!fs.exists(p)) ("bad", s"path does not exist: ${props("path")}")
          else if (kind == "lake" &&
              !fs.exists(new org.apache.hadoop.fs.Path(p, "_graft_log")))
            ("warn", "path exists but holds no lake commit log")
          else ("good", "")
        case "hive" =>
          val dbs = spark.sharedState.externalCatalog.listDatabases()
          if (dbs.nonEmpty) ("good", "") else ("warn", "metastore lists no databases")
      } catch {
        case e: Exception => ("bad", Option(e.getMessage).getOrElse(e.toString))
      }
    Source(name, kind, props, status, msg, System.currentTimeMillis())
  }

  /** Test/bootstrap reset — durable section included (a deliberate reset
    * must not resurrect on the next load). */
  def clear(spark: SparkSession): Unit = {
    reg.keys.toSeq.foreach(n => scala.util.Try(drop(spark, n)))
    reg.clear()
    GraftStore.delete(spark, "sources")
  }

  // ---- durability (GraftStore section "sources"; reference persists
  // SourceConfig in the namespace KV store) ----

  private def persist(spark: SparkSession): Unit = {
    val root = GraftStore.newObject
    val arr = root.putArray("sources")
    reg.values.toSeq.sortBy(_.name).foreach { s =>
      val o = arr.addObject()
      o.put("name", s.name); o.put("kind", s.kind)
      o.put("status", s.status); o.put("message", s.message)
      o.put("lastProbeMs", s.lastProbeMs)
      val ps = o.putObject("props")
      s.props.toSeq.sortBy(_._1).foreach { case (k, v) => ps.put(k, v) }
    }
    GraftStore.saveResync(spark, "sources", root)(loadFrom)
  }

  /** Reload from the durable store. The stored probe state is kept AS IS
    * — load never dials remote endpoints (a registry of 100 sources must
    * not serialize 100 connection attempts into startup); ALTER SOURCE
    * ... REFRESH STATUS re-probes on demand. */
  def loadFrom(spark: SparkSession): Unit =
    GraftStore.load(spark, "sources").foreach { root =>
      reg.clear()
      root.path("sources").forEach { o =>
        val props = scala.collection.mutable.Map.empty[String, String]
        o.path("props").fields().forEachRemaining(e =>
          props.put(e.getKey, e.getValue.asText()))
        val s = Source(o.path("name").asText(), o.path("kind").asText(),
          props.toMap, o.path("status").asText(), o.path("message").asText(),
          o.path("lastProbeMs").asLong(0L))
        reg.put(s.name, s)
      }
    }

  /** Restart simulation for specs: in-memory only, store survives. */
  private[graft] def resetMemoryForTest(): Unit = reg.clear()
}
