package graft.engine

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Jobs-service semantics (reference `LocalJobsService.java:3060` cancel
  * path): in-flight statements are visible and cancellable by id; eager
  * commands and completed actions retire from the ledger. */
class RunningQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private implicit val ec: ExecutionContext = ExecutionContext.global

  test("a lazy statement is RUNNING until its first action completes; commands retire at once") {
    val before = RunningQueries.list.map(_.id).toSet
    val df = graft.Graft.sql(spark, "SELECT count(*) AS n FROM range(1000)")
    val mine = RunningQueries.list.filterNot(r => before(r.id))
    assert(mine.size == 1, s"expected exactly one new running entry, got $mine")
    assert(mine.head.statement.contains("FROM range(1000)"))
    assert(df.head().getLong(0) == 1000L)
    // retirement rides the async listener bus
    val deadline = System.nanoTime() + 30e9.toLong
    while (RunningQueries.list.exists(_.id == mine.head.id)
        && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!RunningQueries.list.exists(_.id == mine.head.id),
      "completed statement still listed as running")

    // an eager command never lingers
    graft.Graft.sql(spark, "SHOW QUEUES")
    assert(!RunningQueries.list.exists(_.statement.contains("SHOW QUEUES")))
  }

  test("CANCEL QUERY kills a running statement's jobs; other work is untouched") {
    graft.catalog.InfoSchema.register(spark)
    val before = RunningQueries.list.map(_.id).toSet
    val victim = Future {
      // big enough that the range scan runs for many seconds on 4 cores;
      // range's codegen polls the task-kill flag, so cancellation lands
      graft.Graft.sql(spark,
        "SELECT sum(id * id) AS s FROM range(60000000000)").collect()
    }
    // wait until the statement is ledgered
    val deadline = System.nanoTime() + 30e9.toLong
    def newEntries = RunningQueries.list.filterNot(r => before(r.id))
    while (newEntries.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
    val id = newEntries.head.id
    // visible through the sys view, with its job group
    val viewRow = spark.sql(
      s"SELECT statement, job_group FROM sys_running_queries WHERE id = $id").head()
    assert(viewRow.getString(0).contains("60000000000"))
    assert(viewRow.getString(1) == RunningQueries.group(id))
    // ONE cancel through the SQL surface must suffice, whichever side of
    // the submit/cancel race it lands on: a pre-submission cancel marks
    // the id so the job is killed at start by the job-start listener, and
    // a post-submission cancel kills the recorded job ids directly.
    val cancelled = spark.sql(s"CANCEL QUERY $id").head().getString(0)
    assert(cancelled == "true", "CANCEL QUERY did not find the statement")
    val outcome = Await.ready(victim, 60.seconds).value.get
    assert(outcome.isFailure, "cancelled query returned a result")
    val msg = String.valueOf(outcome.failed.get.getMessage).toLowerCase
    assert(msg.contains("cancel"), s"unexpected failure: $msg")
    // the ledger entry is gone and a second cancel reports not-found
    assert(spark.sql(s"CANCEL QUERY $id").head().getString(0) == "false")
    // the session still runs other statements fine
    assert(graft.Graft.sql(spark, "SELECT 7 AS x").head().getInt(0) == 7)
  }

  test("an abandoned never-executed frame is reaped from the ledger after GC") {
    val before = RunningQueries.list.map(_.id).toSet
    var df = graft.Graft.sql(spark, "SELECT id FROM range(123456)")
    val mine = RunningQueries.list.filterNot(r => before(r.id))
    assert(mine.size == 1)
    df = null // only strong reference dropped; never executed
    var attempts = 0
    while (RunningQueries.list.exists(_.id == mine.head.id) && attempts < 40) {
      attempts += 1
      System.gc()
      Thread.sleep(50)
      graft.Graft.sql(spark, "SELECT 1").collect() // tracked() reaps on entry
    }
    assert(!RunningQueries.list.exists(_.id == mine.head.id),
      "abandoned statement never reaped")
  }
}
