package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Scale-mechanics specs: the behaviors that keep plans efficient at 100 TB
  * — salted joins for hot keys, bucketed (co-located) joins that eliminate
  * the shuffle, and partitioned writes that prune.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits a planted skewed join partition at runtime (skew=true)") {
    import spark.implicits._
    // one key carries ~90% of the left side; with broadcast disabled the
    // join must shuffle, and AQE's OptimizeSkewedJoin should split the hot
    // partition at runtime — the mechanism that absorbs power-law keys at
    // 100 TB without manual salting
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "16384")
      spark.conf.set(keys(1), "2")
      spark.conf.set(keys(2), "8192")
      spark.conf.set(keys(3), "-1")
      spark.conf.set(keys(4), "-1")
      // md5 payload: incompressible, so shuffle-size stats see the skew
      val left = spark.range(0, 200000)
        .select(when(col("id") % 10 === 0, col("id") % 1000).otherwise(0L).as("k"),
          md5(col("id").cast("string")).as("payload"))
      val right = spark.range(0, 1000).select(col("id").as("k"),
        concat(lit("r"), col("id")).as("rv"))
      val joined = left.join(right, "k")
      // run the join's OWN QueryExecution (count() would plan a separate
      // aggregate query and leave this one un-executed / un-adapted)
      val n = joined.collect().length
      assert(n == 200000, s"join row count $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n${plan.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join returns identical results to the plain join") {
    val t = Tables(spark, TestSpark.sf)
    val plain = t.lineitem.join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("n"))
    val salted = Skew.saltedJoin(
        t.lineitem, t.supplier.withColumnRenamed("s_suppkey", "l_suppkey"),
        "l_suppkey", salts = 8)
      .groupBy(col("s_name")).agg(count(lit(1)).as("n"))
    assert(plain.orderBy("s_name").collect().sameElements(salted.orderBy("s_name").collect()))
  }

  test("salt spreads a hot key over multiple partitions") {
    val t = Tables(spark, TestSpark.sf)
    val salted = t.lineitem.withColumn("_salt",
      pmod(hash(struct(t.lineitem.columns.map(col): _*)), lit(8)))
    val n = salted.filter(col("l_suppkey") === 1).select("_salt").distinct().count()
    assert(n > 1, "hot key stayed on a single salt")
  }

  test("keyHistogram surfaces the heaviest keys first") {
    val t = Tables(spark, TestSpark.sf)
    val h = Skew.keyHistogram(t.lineitem, "l_returnflag", 3).collect()
    assert(h.length == 3)
    assert(h.head.getLong(1) >= h.last.getLong(1))
  }

  test("bucketed tables join without a shuffle exchange") {
    val db = spark
    db.sql("DROP TABLE IF EXISTS li_bkt")
    db.sql("DROP TABLE IF EXISTS ord_bkt")
    val t = Tables(spark, TestSpark.sf)
    t.lineitem.select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bkt")
    t.orders.select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bkt")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt")
        .join(spark.table("ord_bkt"), col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      db.sql("DROP TABLE IF EXISTS li_bkt")
      db.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }

  test("partitioned write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val t = Tables(spark, TestSpark.sf)
    t.orders.withColumn("status", col("o_orderstatus"))
      .write.partitionBy("status").mode("overwrite").parquet(s"$dir/t")
    val q = spark.read.parquet(s"$dir/t").filter(col("status") === "F")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(status"), s"no pruning:\n$plan")
  }
}
