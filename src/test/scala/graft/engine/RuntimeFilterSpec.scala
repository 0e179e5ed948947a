package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Runtime join filters (reference: build-side bloom/value-list filters
  * pushed to probe-side scans — dremio-oss
  * `sabot/op/join/vhash/PartitionColFilters.java:78`,
  * `exec/util/RuntimeFilterManager.java`). Spark equivalents: injected
  * bloom filters and dynamic partition pruning. Size thresholds are tuned
  * for 100 TB inputs, so the specs lower them to observe the mechanism on
  * fixture-sized data.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom filter from the selective build side reaches the probe scan") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val t = Tables(spark, TestSpark.sf)
      val q = t.lineitem
        .join(t.orders.filter(col("o_totalprice") > 400000.0),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter injected:\n$plan")
      assert(q.collect().nonEmpty)
    }
  }

  test("dynamic partition pruning on a partitioned fact table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val t = Tables(spark, TestSpark.sf)
    t.orders.withColumn("status", col("o_orderstatus"))
      .write.partitionBy("status").mode("overwrite").parquet(s"$dir/fact")
    import spark.implicits._
    // dim must be file-backed: a LocalRelation's filter constant-folds away
    // and DPP's selective-predicate check never fires
    Seq(("F", "finished"), ("O", "open"), ("P", "pending")).toDF("status", "label")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "100.0") {
      val q = spark.read.parquet(s"$dir/fact")
        .join(dim.filter(col("label") === "finished"), Seq("status"))
        .agg(count(lit(1)))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning") ||
        plan.contains("SubqueryBroadcast"),
        s"no DPP in plan:\n$plan")
    }
  }
}
