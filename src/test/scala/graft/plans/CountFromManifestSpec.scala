package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.SnapshotTable

class CountFromManifestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshLake() = {
    val dir = Files.createTempDirectory("graft_count_meta").toString
    val df = (1L to 100L).map(i => (i, s"r$i", i % 7)).toDF("id", "name", "grp")
    (dir, SnapshotTable.create(spark, dir, df))
  }

  test("bare count(*) folds to a LocalTableScan with the exact manifest sum") {
    val (dir, lake) = freshLake()
    lake.append((101L to 150L).map(i => (i, s"r$i", i % 7)).toDF("id", "name", "grp"))
    val cnt = lake.read().agg(count(lit(1)).as("n"))
    assert(cnt.as[Long].head() == 150L)
    val plan = cnt.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"expected metadata count, got:\n$plan")
    assert(!plan.contains("Scan parquet"), s"expected no file scan, got:\n$plan")
  }

  test("copy-on-write DML keeps manifest counts exact (carried + rewritten files)") {
    val (_, lake) = freshLake()
    lake.deleteWhere($"grp" === 3)
    val cnt = lake.read().agg(count(lit(1)).as("n"))
    assert(cnt.as[Long].head() == (1L to 100L).count(_ % 7 != 3))
    assert(cnt.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("a filter blocks the rewrite and the scanned count agrees") {
    val (_, lake) = freshLake()
    val cnt = lake.read().filter($"grp" === 0).agg(count(lit(1)).as("n"))
    assert(!cnt.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(cnt.as[Long].head() == (1L to 100L).count(_ % 7 == 0))
  }

  test("count(col) and grouped counts are not folded") {
    val (_, lake) = freshLake()
    val byCol = lake.read().agg(count($"name").as("n"))
    assert(!byCol.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(byCol.as[Long].head() == 100L)
    val grouped = lake.read().groupBy($"grp").agg(count(lit(1)).as("n"))
    assert(!grouped.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(grouped.count() == 7L)
  }

  test("SQL COUNT(*) through a lake view folds too") {
    val (dir, _) = freshLake()
    spark.sql(s"CREATE LAKE VIEW count_meta_sql_v FROM '$dir'")
    val cnt = spark.sql("SELECT COUNT(*) AS n FROM count_meta_sql_v")
    assert(cnt.as[Long].head() == 100L)
    assert(cnt.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }
}
