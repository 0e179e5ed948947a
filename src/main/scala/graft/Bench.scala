package graft
import org.apache.spark.sql.SparkSession
/** Per-round benchmark: times every registered query at the driver-chosen
  * scale factor and emits one JSON line (driver contract). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.engine.GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Functions.registerAll(spark)
    // Warm the JVM/codegen paths once so per-query numbers measure the
    // query, not first-touch class loading — through the SAME noop sink the
    // timed loop uses, so sink/datasource init isn't billed to the
    // alphabetically-first query.
    SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    // Warm the bench dataset too: file listing + parquet footer reads for
    // the timed SF would otherwise be billed to the first timed query.
    graft.engine.Tables.ensure(spark, sfDir).lineitem.count()
    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      val t0 = System.nanoTime()
      // noop sink: materializes every output column (count() would let
      // Catalyst prune the query down to row counting)
      val err =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); None }
        catch { case e: Throwable => Some(e.toString.replaceAll("[\"\\\\\n\r\t]", " ").take(200)) }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (t, err) = timeOne(fn)
      // Single-shot numbers are load-noise-dominated (round-over-round
      // comparisons chased ±40% machine-load drift, and r6's 1.0 s cutoff
      // let a load-inflated normally-0.5 s query skip its re-run and land
      // a phantom 2.5 s in the ledger — VERDICT r6): re-run twice and
      // report the median of 3 alongside the first-run number, which stays
      // in `queries` for driver parity. No time cutoff: a query whose cold
      // run pays one-time training/codegen cost (ann_ivf_pq: ~7 s cold,
      // ~2 s warm) would otherwise be the ONLY one exempt from medians —
      // exactly the row where a steady-state number matters most, and the
      // warm reruns cost far less than the cold run did. Stateful queries
      // (SparkEntry.statefulBench) are excluded: a rerun would repeat
      // their side effects and time warm-cache state, so their `medians`
      // entry is just the first run.
      val median = if (err.isEmpty && !SparkEntry.statefulBench(name)) {
        val ts = (t +: Seq.fill(2)(timeOne(fn)._1)).sorted
        ts(1)
      } else t
      (name, t, median, err)
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val meds = results.map { case (k, _, m, _) => "\"" + k + "\":" + m }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"medians":$meds,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
