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
