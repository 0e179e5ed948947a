package graft.tools

/** Dev utility: run a registered query once warm, then once counting janino
  * compilations (CodegenMetrics) — distinguishes "driver gap = fresh codegen
  * per round" from "driver gap = analysis/planning".
  * Usage: runMain graft.tools.ProbeCodegen <query> [sfDir]
  */
object ProbeCodegen {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val fn = graft.SparkEntry.queries(args(0))
    fn(spark, dir).write.mode("overwrite").format("noop").save()
    val m = org.apache.spark.metrics.source.CodegenMetrics
    val c0 = m.METRIC_COMPILATION_TIME.getCount
    val t0ms = m.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
    val t0 = System.nanoTime()
    fn(spark, dir).write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    val c1 = m.METRIC_COMPILATION_TIME.getCount
    println(f"[probecg] ${args(0)} wall=$wall%.3fs compilations(warm run)=${c1 - c0} totalCompilationsEver=$c1")
    spark.stop()
  }
}
