package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QueryHistorySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The listener bus delivers events asynchronously — poll briefly. */
  private def eventually[T](what: String)(f: => Option[T]): T = {
    val deadline = System.currentTimeMillis() + 10000
    var r: Option[T] = None
    while (r.isEmpty && System.currentTimeMillis() < deadline) {
      r = f
      if (r.isEmpty) Thread.sleep(50)
    }
    r.getOrElse(fail(s"timed out waiting for $what"))
  }

  test("sys_queries records successful actions with duration and metrics") {
    QueryHistory.install(spark)
    QueryHistory.clear()
    val n = Seq(1, 2, 3).toDF("v").groupBy().sum("v").collect()
    assert(n.head.getLong(0) == 6)
    val rec = eventually("a SUCCESS record") {
      QueryHistory.records.find(r => r.status == "SUCCESS")
    }
    assert(rec.durationMs >= 0)
    assert(rec.action.nonEmpty)
    // the sys_queries view serves the same ring
    InfoSchema.register(spark)
    val viaSql = spark.sql(
      "SELECT status, duration_ms FROM sys_queries WHERE status = 'SUCCESS'")
    assert(viaSql.collect().nonEmpty)
  }

  test("sys_queries records failures with the error message") {
    QueryHistory.install(spark)
    QueryHistory.clear()
    intercept[Exception] {
      Seq(1).toDF("v")
        .select(org.apache.spark.sql.functions.expr("raise_error('graft boom')"))
        .collect()
    }
    val rec = eventually("a FAILURE record") {
      QueryHistory.records.find(_.status == "FAILURE")
    }
    assert(rec.error.contains("graft boom"))
  }

  test("the history ring is bounded") {
    assert(QueryHistory.MaxEntries == 1000)
    // push synthetic volume through the public path would need 1000 jobs;
    // bound is enforced in push() — sanity-check the records call is cheap
    assert(QueryHistory.records.size <= QueryHistory.MaxEntries)
  }
}
