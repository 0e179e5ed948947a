package graft.tools

import graft.engine.{GraftSession, Tables}

/** Dev utility: print fixture schemas as Spark sees them, or explain a
  * registered query (`runMain graft.tools.Probe explain <name> [sfDir]`).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    args.headOption match {
      case Some("explain") =>
        val df = graft.SparkEntry.queries(args(1))(spark, dir)
        df.explain("formatted")
        df.show(5, truncate = false)
      case _ =>
        val t = Tables.ensure(spark, dir)
        Tables.names.foreach { n => println(s"== $n"); t.table(n).printSchema() }
    }
    spark.stop()
  }
}
