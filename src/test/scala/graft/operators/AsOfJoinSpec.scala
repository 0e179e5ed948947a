package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:00")),
    (2L, "A", ts("2024-01-01 10:05:00")),
    (3L, "A", ts("2024-01-01 09:00:00")), // before any quote
    (4L, "B", ts("2024-01-01 10:00:00"))
  ).toDF("trade_id", "sym", "t")
  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 09:30:00"), 10L, 1.0),
    ("A", ts("2024-01-01 10:00:00"), 11L, 2.0), // tie with trade 1: inclusive
    ("A", ts("2024-01-01 10:04:00"), 12L, 3.0),
    ("B", ts("2024-01-01 09:59:00"), 20L, 9.0)
  ).toDF("sym", "qt", "quote_id", "px")

  test("backward as-of picks the latest right row at or before each left row") {
    val got = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "qt")
      .select($"trade_id", $"quote_id", $"px")
      .as[(Long, Option[Long], Option[Double])].collect().map {
        case (k, q, p) => k -> ((q, p))
      }.toMap
    assert(got(1L) == ((Some(11L), Some(2.0)))) // equal ts is a match
    assert(got(2L) == ((Some(12L), Some(3.0))))
    assert(got(3L) == ((None, None)))          // nothing at or before
    assert(got(4L) == ((Some(20L), Some(9.0))))
  }

  test("ties at the same right ts resolve to the greatest payload deterministically") {
    val dupQuotes = quotes.unionByName(
      Seq(("A", ts("2024-01-01 10:00:00"), 99L, 5.0))
        .toDF("sym", "qt", "quote_id", "px"))
    val got = AsOfJoin.backward(trades, dupQuotes, Seq("sym"), "t", "qt")
      .filter($"trade_id" === 1L).select($"quote_id").as[Long].head()
    assert(got == 99L) // (ts, 99, …) sorts after (ts, 11, …)
  }

  test("tolerance nulls out matches older than the max age") {
    val got = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "qt",
      tolerance = Some(expr("INTERVAL 30 SECONDS")))
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(11L)) // age 0
    assert(got(2L).isEmpty)       // latest quote is 60s old > 30s
    assert(got(4L).isEmpty)       // 60s old
  }

  test("plan contains a window and no join node (single-shuffle shape)") {
    val plan = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "qt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("join"))
  }

  test("matches the naive theta-join argmax on fixture events") {
    val ev = graft.engine.Tables.ensure(spark, TestSpark.sf).events
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val fast = AsOfJoin.backward(p, c, Seq("user_id"), "ts", "ts")
      .select($"event_id", $"click_id")
    val naive = p.as("p").join(c.as("c"),
        $"p.user_id" === $"c.user_id" && $"c.ts" <= $"p.ts", "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"p.event_id")
          .orderBy($"c.ts".desc_nulls_last, $"click_id".desc_nulls_last)))
      .filter($"rk" === 1)
      .select($"p.event_id", $"click_id")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }
}
