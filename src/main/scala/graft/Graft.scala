package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{GraftSession, Tables}

/** User-facing facade — the switch-over surface for a reference user
  * (SURVEY §3 entry points): build a session, attach a data directory as a
  * catalog, run SQL (incl. graft's reflection/pipe DDL) or the DataFrame
  * modules directly.
  *
  * {{{
  * val spark = Graft.session()
  * Graft.attach(spark, "/data/warehouse")                  // tables as views
  * Graft.sql(spark, "SELECT ... FROM lineitem ...")        // ANSI SQL
  * Graft.sql(spark, "CREATE REFLECTION r USING PATH '/mv/r' AS SELECT ...")
  * graft.llm.Dedup.minhashLsh(spark.table("documents"))    // pipeline ops
  * }}}
  */
object Graft {

  /** A fully-configured local session (UTC, AQE, bloom joins, CBO, graft
    * parser + optimizer extensions, function registry). */
  def session(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    GraftSession.local(cores)

  /** Attach a directory of parquet tables as the session's namespace
    * (reference: source registration in the namespace catalog) and expose
    * the introspection views. */
  def attach(spark: SparkSession, dir: String): Tables = {
    val t = Tables.ensure(spark, dir)
    graft.catalog.InfoSchema.register(spark)
    t
  }

  /** SQL entry point (reference UserRPCServer → Foreman path ≈ spark.sql).
    *
    * When the session conf `spark.graft.queue` names a defined WLM queue,
    * every statement routes through its admission control automatically —
    * the reference passes ALL queries through the resource scheduler, not
    * only opt-in ones. DDL/DML commands execute (and release their slot)
    * inside admission; a lazy SELECT holds its slot until its first
    * completed action, so the expensive execution — not just planning — is
    * throttled (Queues.admitLazy). */
  def sql(spark: SparkSession, query: String): DataFrame =
    spark.conf.getOption(QueueConf).filter(_.nonEmpty) match {
      case Some(queue) => graft.engine.Queues.admitLazy(spark, queue)(spark.sql(query))
      case None => spark.sql(query)
    }

  /** Session conf: route every [[sql]] statement through this WLM queue. */
  val QueueConf = "spark.graft.queue"

  /** A graft-lake snapshot table (atomic commits, time travel, DML,
    * manifest-pruned scans — see sources.SnapshotTable). */
  def lake(spark: SparkSession, dir: String): graft.sources.SnapshotTable =
    graft.sources.SnapshotTable.forPath(spark, dir)

  /** The copy_errors history for a COPY INTO target. */
  def copyErrors(spark: SparkSession, targetDir: String): DataFrame =
    graft.sources.CopyInto.copyErrors(spark, targetDir)

  /** Run a query action under a WLM admission queue (define queues via
    * `CREATE QUEUE name SLOTS n` or engine.Queues.define). */
  def queued[T](spark: SparkSession, queue: String)(body: => T): T =
    graft.engine.Queues.run(spark, queue)(body)

  /** Serve `df` through the version-gated result cache (repeat queries
    * return the persisted result until a base lake table advances). */
  def cached(df: DataFrame): DataFrame = graft.accel.ResultCache.cached(df)
}
