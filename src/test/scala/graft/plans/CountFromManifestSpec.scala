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

  test("min/max over stats columns fold to a LocalTableScan with exact values") {
    val dir = Files.createTempDirectory("graft_minmax_meta").toString
    spark.sql(s"CREATE LAKE '$dir' STATS (id, grp) AS " +
      "SELECT id, CAST(id % 7 AS INT) AS grp, concat('r', id) AS name FROM range(1, 101)")
    spark.sql(s"INSERT INTO LAKE '$dir' " +
      "SELECT id, CAST(id % 7 AS INT) AS grp, concat('r', id) AS name FROM range(101, 151)")
    val t = SnapshotTable.forPath(spark, dir)
    val q = t.read().agg(min($"id").as("mn"), max($"id").as("mx"),
      max($"grp").as("mg"), count(lit(1)).as("n"))
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)) == ((1L, 150L, 6, 150L)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("Scan parquet"),
      s"expected metadata min/max, got:\n$plan")
    // copy-on-write DML re-records stats (sticky layout): still exact,
    // still metadata-only
    spark.sql(s"DELETE FROM LAKE '$dir' WHERE id >= 140")
    val q2 = t.read().agg(min($"id").as("mn"), max($"id").as("mx"))
    assert(q2.collect().head.getLong(1) == 139L)
    assert(q2.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "post-DML min/max should still fold")
    // a column WITHOUT manifest stats blocks the rewrite, values agree
    val q3 = t.read().agg(max($"name").as("m"))
    assert(!q3.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(q3.collect().head.getString(0) == "r99") // lexicographic max
    // a non-foldable aggregate alongside keeps the whole scan
    val q4 = t.read().agg(min($"id"), avg($"grp"))
    assert(!q4.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    // a filter blocks the rewrite
    val q5 = t.read().filter($"grp" === 3).agg(min($"id"))
    assert(!q5.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("all-null stats files contribute nothing to min/max (SQL semantics)") {
    val dir = Files.createTempDirectory("graft_minmax_null").toString
    spark.sql(s"CREATE LAKE '$dir' STATS (v) AS " +
      "SELECT id, CAST(NULL AS BIGINT) AS v FROM range(0, 5)")
    spark.sql(s"INSERT INTO LAKE '$dir' SELECT id, id * 10 AS v FROM range(5, 8)")
    val t = SnapshotTable.forPath(spark, dir)
    val q = t.read().agg(min($"v").as("mn"), max($"v").as("mx"))
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1)) == ((50L, 70L)), s"got $r")
    assert(q.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    // entirely-null column → NULL, still metadata-only
    val dir2 = Files.createTempDirectory("graft_minmax_null2").toString
    spark.sql(s"CREATE LAKE '$dir2' STATS (v) AS " +
      "SELECT id, CAST(NULL AS BIGINT) AS v FROM range(0, 5)")
    val q2 = SnapshotTable.forPath(spark, dir2).read().agg(min($"v").as("mn"))
    val r2 = q2.collect().head
    assert(r2.isNullAt(0))
    assert(q2.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("SQL COUNT(*) through a lake view folds too") {
    val (dir, _) = freshLake()
    spark.sql(s"CREATE LAKE VIEW count_meta_sql_v FROM '$dir'")
    val cnt = spark.sql("SELECT COUNT(*) AS n FROM count_meta_sql_v")
    assert(cnt.as[Long].head() == 100L)
    assert(cnt.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }
}
