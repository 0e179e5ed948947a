package graft.tools

/** Dev utility: same-JVM alternating A/B of a boolean session conf over a
  * registered query — the load-robust way to judge a marginal optimization
  * (both arms interleave inside the same ambient-load window; min and
  * median per arm reported).
  *
  * Usage: runMain graft.tools.ProbeAb <query> <confKey> [sfDir] [reps=5] [cores=8]
  */
object ProbeAb {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val key = args(1)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val reps = if (args.length > 3) args(3).toInt else 5
    val cores = if (args.length > 4) args(4).toInt else 8
    val spark = graft.engine.GraftSession.local(cores)
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(q)
    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both arms once (codegen + footers)
    spark.conf.set(key, "true"); run()
    spark.conf.set(key, "false"); run()
    val on = collection.mutable.ArrayBuffer.empty[Double]
    val off = collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ =>
      spark.conf.set(key, "true"); on += run()
      spark.conf.set(key, "false"); off += run()
    }
    def stats(xs: Seq[Double]): String = {
      val s = xs.sorted
      f"min=${s.head}%.3f med=${s(s.length / 2)}%.3f all=[${s.map(v => f"$v%.2f").mkString(",")}]"
    }
    println(s"[ab] $q $key=true  ${stats(on.toSeq)}")
    println(s"[ab] $q $key=false ${stats(off.toSeq)}")
    spark.stop()
  }
}
