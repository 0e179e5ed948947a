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
    // register FIRST — the production order (Graft.attach registers the
    // views before any user query runs); the view must still see queries
    // run afterwards because it re-reads the ring on every scan
    InfoSchema.register(spark)
    QueryHistory.clear()
    val n = Seq(1, 2, 3).toDF("v").groupBy().sum("v").collect()
    assert(n.head.getLong(0) == 6)
    val rec = eventually("a SUCCESS record") {
      QueryHistory.records.find(r => r.status == "SUCCESS")
    }
    assert(rec.durationMs >= 0)
    assert(rec.action.nonEmpty)
    // the already-registered view serves the ring live — no re-register
    val viaSql = eventually("a SUCCESS row via the live sys_queries view") {
      Some(spark.sql(
        "SELECT status, duration_ms FROM sys_queries WHERE status = 'SUCCESS'")
        .collect()).filter(_.nonEmpty)
    }
    assert(viaSql.nonEmpty)
  }

  test("finalPlans visits each executed node exactly once under AQE") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = spark.range(0, 1000).toDF("id")
      .groupBy((org.apache.spark.sql.functions.col("id") % 7).as("k"))
      .count()
    df.collect() // materialize so AQE finalizes its stages
    val root = df.queryExecution.executedPlan
    assert(root.isInstanceOf[AdaptiveSparkPlanExec], "expected an AQE root")
    val plans = QueryHistory.finalPlans(root)
    // every node exactly once (identity, not structural equality — two
    // structurally-equal nodes at different positions must both count)
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    plans.foreach(p => assert(seen.add(p), s"duplicate node in finalPlans: ${p.nodeName}"))
    // and no wrapper survives the descent
    assert(!plans.exists(_.isInstanceOf[AdaptiveSparkPlanExec]))
    assert(!plans.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.adaptive.QueryStageExec]))
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
