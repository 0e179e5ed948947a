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
      case Some("time") =>
        // warm once (codegen+footers), then time N runs through the noop
        // sink — the same measurement Bench takes, minus cross-query JIT
        // and GC interference.
        val fn = graft.SparkEntry.queries(args(1))
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] ${args(1)} runs: ${times.map(t => f"$t%.3f").mkString(", ")} s")
      case _ =>
        val t = Tables.ensure(spark, dir)
        Tables.names.foreach { n => println(s"== $n"); t.table(n).printSchema() }
    }
    spark.stop()
  }
}
