package graft.tools

/** Dev utility (throwaway): time a query at several spread fan-out caps in
  * one JVM. Usage: runMain graft.tools.ProbeSpreadCap <query> [sfDir] [cores]
  */
object ProbeSpreadCap {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cores = if (args.length > 2) args(2).toInt else 32
    val spark = graft.engine.GraftSession.local(cores)
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(q)
    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(); // warm
    val caps = Seq("off", "4", "8", "16", "32")
    val results = collection.mutable.Map.empty[String, collection.mutable.ArrayBuffer[Double]]
    (1 to 4).foreach { _ =>
      caps.foreach { c =>
        if (c == "off") spark.conf.set("spark.graft.spreadSmallScans", "false")
        else {
          spark.conf.set("spark.graft.spreadSmallScans", "true")
          spark.conf.set("spark.graft.spreadCap", c)
        }
        results.getOrElseUpdate(c, collection.mutable.ArrayBuffer.empty) += run()
      }
    }
    caps.foreach { c =>
      val s = results(c).sorted
      println(f"[cap] $q cap=$c%-4s min=${s.head}%.3f med=${s(s.length / 2)}%.3f")
    }
    spark.stop()
  }
}
