package graft.tools

import java.nio.file.{Files, Paths}

/** Dev utility for the optimization rounds: dump `explain("formatted")` of
  * registered queries to files (one JVM for the whole list, instead of a
  * Probe launch per query).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <name>[,<name>...]
  *
  * Note: a registered query FN may run side-effecting build steps (index
  * builds, lake fixture writes) when invoked; the dumped plan is the final
  * returned DataFrame's — the serve/read plan — which is what the plan
  * claims in OPTIMIZATION_r*.md reference.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, namesCsv) = args.take(4)
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = graft.engine.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      println(s"[plandump] wrote $n ($suffix)")
    }
    spark.stop()
  }
}
