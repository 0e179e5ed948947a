package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.engine.Tables

/** Per-operator query profiles (the reference profile viewer's operator
  * table — `UserBitShared.OperatorProfile`): every completed action
  * captures its executed plan's nodes with metric values, bounded, and
  * `query_profile([id])` surfaces them in SQL. */
class QueryProfileSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def eventually[T](what: String)(f: => Option[T]): T = {
    val deadline = System.nanoTime() + 15e9.toLong
    var r: Option[T] = None
    while (r.isEmpty && System.nanoTime() < deadline) {
      r = f; if (r.isEmpty) Thread.sleep(50)
    }
    r.getOrElse(fail(s"timed out waiting for $what"))
  }

  test("a completed aggregate action captures per-operator metrics") {
    QueryHistory.install(spark)
    val t = Tables.ensure(spark, TestSpark.sf)
    import org.apache.spark.sql.functions._
    val before = QueryHistory.records.map(_.id).maxOption.getOrElse(0L)
    val expect = t.lineitem.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n")).collect().length

    val ops = eventually("a profiled aggregate query") {
      QueryHistory.records
        .filter(r => r.id > before && r.status == "SUCCESS" && r.action == "collect")
        .map(r => QueryHistory.profileOf(r.id))
        .find(p => p.exists(o => o.operator.contains("HashAggregate") &&
          o.detail.contains("l_returnflag")))
    }
    // preorder ids, root at depth 0
    ops.map(_.opId) shouldBe ops.indices
    ops.head.depth shouldBe 0
    ops.map(_.depth).max should be >= 1
    // the final aggregate's numOutputRows equals the collected row count
    val finalAgg = ops.filter(_.operator.contains("HashAggregate")).minBy(_.opId)
    finalAgg.metrics.get("numOutputRows") shouldBe Some(expect.toLong)
    // a scan node reports its metrics too
    ops.exists(o => o.operator.toLowerCase.contains("scan") &&
      o.metrics.get("numOutputRows").exists(_ > 0)) shouldBe true
  }

  test("query_profile([id]) is a SQL surface over the profile ring") {
    QueryHistory.install(spark)
    val t = Tables.ensure(spark, TestSpark.sf)
    val before = QueryHistory.records.map(_.id).maxOption.getOrElse(0L)
    t.nation.select("n_name").where("n_nationkey >= 0").collect()
    val id = eventually("the filter query's profile") {
      QueryHistory.records
        .filter(r => r.id > before && r.status == "SUCCESS" && r.action == "collect")
        .map(_.id)
        .find(i => QueryHistory.profileOf(i).exists(_.detail.contains("n_nationkey")))
    }

    val rows = spark.sql(
      s"SELECT op_id, operator, metrics['numOutputRows'] AS rows " +
        s"FROM query_profile($id) ORDER BY op_id").collect()
    rows should not be empty
    rows.map(_.getString(1)).exists(_.toLowerCase.contains("scan")) shouldBe true

    // no-arg form serves the latest profiled query
    spark.sql("SELECT count(*) FROM query_profile()").collect()(0).getLong(0) should be >= 1L
  }
}
