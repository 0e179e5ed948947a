package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INFORMATION_SCHEMA + sys.* introspection tables (reference:
  * `exec/store/ischema/InfoSchemaGroupScan.java` and
  * `exec/store/sys/SystemGroupScan.java`).
  *
  * Built as plain DataFrames over the session catalog / status tracker and
  * registered as `information_schema_*` / `sys_*` temp views (Spark temp
  * views cannot carry a dotted schema prefix).
  */
object InfoSchema {

  def tables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect().toSeq
      .map(t => (Option(t.catalog).getOrElse(""), Option(t.namespace).map(_.mkString(".")).getOrElse(""),
        t.name, t.tableType, t.isTemporary))
      .toDF("table_catalog", "table_schema", "table_name", "table_type", "is_temporary")
  }

  def columns(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = spark.catalog.listTables().collect().toSeq.flatMap { t =>
      scala.util.Try(spark.catalog.listColumns(t.name).collect().toSeq).toOption
        .getOrElse(Nil)
        .zipWithIndex
        .map { case (c, i) =>
          (t.name, c.name, i + 1, c.dataType, c.nullable, c.isPartition)
        }
    }
    rows.toDF("table_name", "column_name", "ordinal_position", "data_type",
      "is_nullable", "is_partition")
  }

  def sysOptions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.conf.getAll.toSeq.sortBy(_._1).toDF("name", "value")
  }

  def sysNodes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    sc.statusTracker.getExecutorInfos.toSeq
      .map(e => (e.host(), e.port(), e.numRunningTasks()))
      .toDF("host", "port", "running_tasks")
  }

  /** sys.reflections (reference `sys.reflections` over ReflectionManager
    * state): the registered materializations and their fingerprints. */
  def sysReflections(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.accel.Reflections.list
      .map(r => (r.name, r.fingerprint, r.path))
      .toDF("name", "fingerprint", "path")
  }

  /** sys.pipes (reference `sys."pipes"` over the pipe registry). */
  def sysPipes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.streaming.Pipes.list
      .map(p => (p.name, p.sourceDir, p.format, p.targetDir, p.checkpointDir))
      .toDF("name", "source", "format", "target", "checkpoint")
  }

  /** sys.functions (reference FunctionImplementationRegistry surface):
    * every function callable in this session. */
  def sysFunctions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listFunctions().collect().toSeq
      .map(f => (f.name, Option(f.className).getOrElse(""), f.isTemporary))
      .toDF("name", "class_name", "is_temporary")
  }

  /** sys.queries (reference jobs service / query profiles —
    * `services/jobs`): the session's completed query actions with duration
    * and execution metrics, most recent first. */
  def sysQueries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    QueryHistory.records
      .map(r => (r.id, r.action, r.status, r.durationMs, r.outputRows,
        r.shuffleBytes, r.error, r.plan, r.tsMs))
      .toDF("id", "action", "status", "duration_ms", "output_rows",
        "shuffle_bytes", "error", "plan_root", "timestamp_ms")
  }

  /** Register all introspection views (and start recording query history
    * for this session, if not already). */
  def register(spark: SparkSession): Unit = {
    QueryHistory.install(spark)
    tables(spark).createOrReplaceTempView("information_schema_tables")
    columns(spark).createOrReplaceTempView("information_schema_columns")
    sysOptions(spark).createOrReplaceTempView("sys_options")
    sysNodes(spark).createOrReplaceTempView("sys_nodes")
    sysReflections(spark).createOrReplaceTempView("sys_reflections")
    sysPipes(spark).createOrReplaceTempView("sys_pipes")
    sysFunctions(spark).createOrReplaceTempView("sys_functions")
    sysQueries(spark).createOrReplaceTempView("sys_queries")
  }
}
