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
  * registering a `jdbc` source publishes `spark.sql.catalog.<name>.url`
  * (+driver), which is exactly what `external_query('<name>', '<sql>')`
  * and the EXTERNAL QUERY statement resolve, so a freshly created source
  * is immediately queryable. Probes are REAL connectivity checks, not
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

  /** CREATE SOURCE: validate, publish jdbc conf keys, run the first
    * probe. Admin-gated by the caller (source DDL is global infra). */
  def create(spark: SparkSession, name: String, kind: String,
             props: Map[String, String], ifNotExists: Boolean): Source = {
    val n = name.toLowerCase
    val k = kind.toLowerCase
    validateConfig(k, props)
    if (reg.contains(n)) {
      if (ifNotExists) return reg(n)
      throw new IllegalArgumentException(s"source '$name' already exists")
    }
    if (k == "jdbc") {
      spark.conf.set(s"spark.sql.catalog.$n.url", props("url"))
      props.get("driver").foreach(d => spark.conf.set(s"spark.sql.catalog.$n.driver", d))
    }
    val probed = probe(spark, n, k, props)
    reg.put(n, probed)
    probed
  }

  def drop(spark: SparkSession, name: String): Unit = {
    val n = name.toLowerCase
    val s = reg.remove(n).getOrElse(
      throw new IllegalArgumentException(s"unknown source: $name"))
    if (s.kind == "jdbc") {
      spark.conf.unset(s"spark.sql.catalog.$n.url")
      spark.conf.unset(s"spark.sql.catalog.$n.driver")
    }
  }

  def get(name: String): Source = reg.getOrElse(name.toLowerCase,
    throw new IllegalArgumentException(s"unknown source: $name"))

  def list: Seq[Source] = reg.values.toSeq.sortBy(_.name)

  /** ALTER SOURCE ... REFRESH STATUS: re-probe and store the new state
    * (RefreshSourceStatusHandler's contract — the statement returns the
    * refreshed state, good or bad, rather than failing on a bad probe). */
  def refreshStatus(spark: SparkSession, name: String): Source = {
    val s = get(name)
    val probed = probe(spark, s.name, s.kind, s.props)
    reg.put(s.name, probed)
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

  /** Test/bootstrap reset. */
  def clear(spark: SparkSession): Unit = {
    reg.keys.toSeq.foreach(n => scala.util.Try(drop(spark, n)))
    reg.clear()
  }
}
