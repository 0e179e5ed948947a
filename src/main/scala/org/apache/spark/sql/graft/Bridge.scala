package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge. Spark 4 made these converters
  * `private[sql]`; extension libraries conventionally expose them from a
  * package-nested object (no Spark internals are modified).
  */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** A fresh spill file under Spark's configured local directories
    * (`spark.local.dir` via the executor's DiskBlockManager) rather than
    * `java.io.tmpdir`: on clusters tmpdir is often a small root volume, and
    * DiskBlockManager files are reaped with the executor's work directory
    * even when the JVM is killed (deleteOnExit never fires then). Falls
    * back to a plain temp file when no SparkEnv exists (driver-less unit
    * code paths). */
  def createLocalSpillFile(): java.io.File = {
    val env = org.apache.spark.SparkEnv.get
    if (env != null && env.blockManager != null)
      env.blockManager.diskBlockManager.createTempLocalBlock()._2
    else java.io.File.createTempFile("graft_spill", ".run")
  }
}
