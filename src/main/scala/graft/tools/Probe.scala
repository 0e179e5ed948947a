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
      case Some("profile") =>
        // warm once, then one instrumented run: per-JOB wall clock from a
        // listener, so "many tiny sequential jobs" (driver/commit overhead)
        // separates from "one heavy stage" (executor compute). Gaps between
        // jobs are driver-side work (planning, collects, FS commits).
        val fn = graft.SparkEntry.queries(args(1))
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.put(js.jobId, (js.time, 0L, js.stageInfos.map(_.numTasks).sum))
          override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val prev = jobs.get(je.jobId)
            if (prev != null) jobs.put(je.jobId, (prev._1, je.time, prev._3))
          }
        }
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.removeSparkListener(listener)
        import scala.jdk.CollectionConverters._
        val rows = jobs.asScala.toSeq.sortBy(_._1)
        var prevEnd = 0L
        var jobSum = 0.0
        rows.foreach { case (id, (s, e, nt)) =>
          val gap = if (prevEnd == 0L) 0.0 else (s - prevEnd) / 1e3
          val durS = (e - s) / 1e3
          jobSum += durS
          println(f"[probe] job $id%4d dur=$durS%7.3fs tasks=$nt%4d gapBefore=$gap%7.3fs")
          prevEnd = e
        }
        println(f"[probe] ${args(1)} wall=$wall%.3fs jobs=${rows.size} jobTime=$jobSum%.3fs driverGap=${wall - jobSum}%.3fs")
      case _ =>
        val t = Tables.ensure(spark, dir)
        Tables.names.foreach { n => println(s"== $n"); t.table(n).printSchema() }
    }
    spark.stop()
  }
}
